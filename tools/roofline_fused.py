"""Reconcile the fused-wave throughput vs the HBM roofline (VERDICT r4
weak #3): fit wave cost = a*ops + b*ops*W by varying W at fixed ops and
ops at fixed W on the real kernel. If the width-proportional term b
matches ~224 B/site / 819 GB/s while the fixed per-op term a dominates
at bench shapes, both published claims (753M/s end-to-end, 'marginal
cost ~ roofline') describe the same machine."""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from __graft_entry__ import _synthetic
from examl_tpu.kernels import pallas_newview as PK


def build(n_taxa, sites):
    args, consts, _ = _synthetic(n_taxa=n_taxa, sites=sites,
                                 dtype=jnp.float32)
    a = args
    rows, C_, S_, W_ = a['clv'].shape
    a['clv'] = a['clv'].reshape(rows, C_ * S_, W_)
    a['scaler'] = a['scaler'][:, :1, :]
    jp = a['p_idx'].astype(jnp.int32)
    jq = a['q_idx'].astype(jnp.int32)
    jr = a['r_idx'].astype(jnp.int32)
    jt = a['tip_tip'].astype(jnp.int32)
    lzq = jnp.log(jnp.maximum(a['qz'], 1e-15)).astype(jnp.float32)
    lzr = jnp.log(jnp.maximum(a['rz'], 1e-15)).astype(jnp.float32)
    lam = PK.fold_lam(a['eign'], a['gamma']).astype(jnp.float32)[None, :]
    ei = PK.blockdiag(a['ei']).astype(jnp.float32)
    ev = PK.blockdiag(a['ev']).astype(jnp.float32)
    n_real = int(np.sum(np.asarray(a['p_idx']) != rows - 1))
    fn = jax.jit(PK.traversal_fused_pallas,
                 static_argnames=('n_exec', 'n_rows', 'block_w', 'group',
                                  'min_scale', 'inv_min_scale',
                                  'interpret'),
                 donate_argnums=(0, 1))
    return (a, consts, fn, jp, jq, jr, jt, lzq, lzr, lam, ei, ev, rows,
            n_real)


def measure(n_taxa, sites, n_exec=None, iters=40, reps=5, block_w=512):
    (a, consts, fn, jp, jq, jr, jt, lzq, lzr, lam, ei, ev, rows,
     n_real) = build(n_taxa, sites)
    nx = n_real if n_exec is None else n_exec
    state = [a['clv'], a['scaler']]

    def step():
        state[0], state[1] = fn(
            state[0], state[1], jp, jq, jr, jt, lzq, lzr, lam, ei, ev,
            n_exec=nx, n_rows=rows, block_w=block_w,
            min_scale=consts['min_scale'],
            inv_min_scale=consts['inv_min_scale'], interpret=False)

    step()
    float(jnp.sum(state[0][2, 0, :8]))
    best = None
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            step()
        float(jnp.sum(state[0][2, 0, :8]))
        dt = (time.time() - t0) / iters
        best = dt if best is None else min(best, dt)
    rate = sites * nx / best
    print(f'taxa={n_taxa} W={sites} ops={nx} bw={block_w}: '
          f'{best * 1e3:.3f} ms/wave = {rate / 1e6:.0f}M site-updates/s',
          flush=True)
    return best


if __name__ == '__main__':
    # vary width at fixed ops (62): the slope is the per-site HBM term
    t_w = {}
    for w in (16384, 32768, 65536, 131072):
        t_w[w] = measure(64, w)
    # vary executed ops at fixed width: the slope is the per-op term
    t_n = {}
    for nx in (16, 31, 62):
        t_n[nx] = measure(64, 65536, n_exec=nx)
    ws = sorted(t_w)
    b = (t_w[ws[-1]] - t_w[ws[0]]) / (ws[-1] - ws[0]) / 62
    ns = sorted(t_n)
    a_term = (t_n[ns[-1]] - t_n[ns[0]]) / (ns[-1] - ns[0])
    print(f'per-site-per-op cost b = {b * 1e12:.2f} ps '
          f'(roofline 224B/819GB/s = {224 / 819e9 * 1e12:.2f} ps... '
          f'per WAVE of 62 ops: {b * 62 * 1e12:.1f} ps/site)')
    print(f'per-op fixed cost a = {a_term * 1e6:.1f} us '
          f'(62 ops -> {a_term * 62 * 1e3:.2f} ms/wave fixed part)')
