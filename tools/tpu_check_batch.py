"""Hardware check: batch kernels with per-candidate [N, 1, X] vector args.

Runs the three kernels whose per-candidate blocks regressed after the
category fold (Mosaic rejects (1, K) blocks over [N, K] arrays on real
hardware) and cross-checks each against interpret mode.
"""
import numpy as np
import jax
import jax.numpy as jnp

from examl_tpu.kernels.pallas_newview import (
    evaluate_batch_gamma, evaluate_batch_psr, newview_level_pallas_psr,
    fold_lam, fold_rw)

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
rows, C_, S, W = 12, 4, 4, 256
K = C_ * S
N = 6

clv = jnp.asarray(rng.uniform(0.1, 1.0, (rows, K, W)), jnp.float32)
scaler = jnp.zeros((rows, 1, W), jnp.int32).reshape(rows, 1, W)
scaler = jnp.zeros((rows, 1, W), jnp.int32)
wgt = jnp.asarray(rng.integers(1, 4, (W,)), jnp.float32)
p_rows = jnp.asarray(rng.integers(1, rows, (N,)), jnp.int32)
q_rows = jnp.asarray(rng.integers(1, rows, (N,)), jnp.int32)
lzs = jnp.asarray(rng.uniform(-1.0, -0.01, (N,)), jnp.float32)
eign = jnp.asarray(np.sort(rng.uniform(-3.0, 0.0, (S,))), jnp.float32)
gamma = jnp.asarray([0.2, 0.6, 1.2, 2.0], jnp.float32)
rw = jnp.full((C_,), 0.25, jnp.float32)
lam = fold_lam(jnp.tile(eign[None], (C_, 1)), gamma)
rwf = fold_rw(rw, S)

def run(interpret):
    return np.asarray(evaluate_batch_gamma(
        clv, scaler, p_rows, q_rows, lzs, lam, rwf, wgt,
        interpret=interpret))

hw = run(False)
it = run(True)
print("evaluate_batch_gamma hw:", hw)
assert np.allclose(hw, it, rtol=1e-5), (hw, it)

# PSR: CLVs [rows, S, W]
clv_p = jnp.asarray(rng.uniform(0.1, 1.0, (rows, S, W)), jnp.float32)
rates = jnp.asarray(rng.uniform(0.2, 3.0, (W,)), jnp.float32)

def run_psr(interpret):
    return np.asarray(evaluate_batch_psr(
        clv_p, scaler, p_rows, q_rows, lzs, eign, wgt, rates,
        interpret=interpret))

hw = run_psr(False)
it = run_psr(True)
print("evaluate_batch_psr hw:", hw)
assert np.allclose(hw, it, rtol=1e-5), (hw, it)

# PSR newview level with N > 1
ei = jnp.asarray(rng.uniform(-1.0, 1.0, (S, S)), jnp.float32)
ev = jnp.asarray(rng.uniform(-1.0, 1.0, (S, S)), jnp.float32)
p_idx = jnp.asarray([8, 9, 10], jnp.int32)
q_idx = jnp.asarray([1, 2, 3], jnp.int32)
r_idx = jnp.asarray([4, 5, 6], jnp.int32)
tip_tip = jnp.asarray([1, 0, 0], jnp.int32)
lamq = eign[None, :] * jnp.asarray([[-0.3], [-0.5], [-0.1]], jnp.float32)
lamr = eign[None, :] * jnp.asarray([[-0.2], [-0.4], [-0.6]], jnp.float32)

def run_nv(interpret):
    c, s = newview_level_pallas_psr(
        clv_p, scaler, p_idx, q_idx, r_idx, tip_tip, lamq, lamr, ei, ev,
        rates, interpret=interpret)
    return np.asarray(c), np.asarray(s)

chw, shw = run_nv(False)
cit, sit = run_nv(True)
assert np.allclose(chw, cit, rtol=1e-5, atol=1e-7)
assert np.array_equal(shw, sit)
print("newview_level_pallas_psr OK")
print("ALL HARDWARE CHECKS PASSED")
