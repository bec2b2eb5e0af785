"""Partition-stacked kernels (docs/STACKING.md) must be bit-identical to
running the per-partition kernels once per p-slice: the stacked variants
add a leading grid axis and per-p BlockSpec selection but execute the
same matmul sequence per slice (interpret mode on CPU; the Mosaic
alignment rules are re-validated on hardware)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from examl_tpu.kernels.pallas_newview import (
    blockdiag, evaluate_batch_gamma, evaluate_batch_gamma_stacked,
    evaluate_pallas, evaluate_stacked, fold_lam, fold_rw, fold_tipvec,
    make_p_batch, newview_level_pallas, newview_level_stacked,
    nr_derivatives_batch_pallas, nr_derivatives_batch_stacked,
    nr_derivatives_pallas, nr_derivatives_stacked, tip_rows_pallas,
    tip_rows_stacked, traversal_fused_pallas, traversal_fused_stacked)

P, ROWS, C, S, W = 3, 16, 4, 4, 256
K = C * S


@pytest.fixture(scope='module')
def data():
    rng = np.random.default_rng(7)
    clv = jnp.asarray(rng.uniform(0.1, 1.0, (P, ROWS, K, W)), jnp.float32)
    scaler = jnp.asarray(rng.integers(0, 3, (P, ROWS, 1, W)), jnp.int32)
    eign = np.sort(np.abs(rng.normal(1, 1, (P, C, S))))
    eign[:, :, 0] = 0.0
    eign = jnp.asarray(eign, jnp.float32)
    ei = jnp.asarray(rng.normal(0, 1, (P, C, S, S)), jnp.float32)
    ei = ei.at[:, :, :, 0].set(1.0)
    ev = jnp.asarray(rng.normal(0, 1, (P, C, S, S)), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.2, 2.2, (P, C)), jnp.float32)
    rw = jnp.full((P, C), 0.25, jnp.float32)
    # per-partition weights with distinct wgt=0 tails (emulating members
    # shorter than the group width)
    wgt = np.zeros((P, W), np.float32)
    for p in range(P):
        wgt[p, :W - 32 * p] = rng.integers(1, 4, W - 32 * p)
    wgt = jnp.asarray(wgt)
    return dict(clv=clv, scaler=scaler, eign=eign, ei=ei, ev=ev,
                gamma=gamma, rw=rw, wgt=wgt, rng=rng)


def test_traversal_fused_stacked(data):
    rng = np.random.default_rng(1)
    L = 6
    p_idx = jnp.asarray([8, 9, 10, 11, 12, 13], jnp.int32)
    q_idx = jnp.asarray([1, 2, 5, 8, 9, 3], jnp.int32)
    r_idx = jnp.asarray([3, 4, 6, 7, 10, 11], jnp.int32)
    tt = jnp.asarray([1, 0, 0, 0, 0, 0], jnp.int32)
    lzq = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (L, P))), jnp.float32)
    lzr = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (L, P))), jnp.float32)
    lams = jnp.stack([fold_lam(data['eign'][p], data['gamma'][p])
                      for p in range(P)])
    eis = jnp.stack([blockdiag(data['ei'][p]) for p in range(P)])
    evs = jnp.stack([blockdiag(data['ev'][p]) for p in range(P)])
    n_exec = 5                              # slot L-1 is descriptor padding
    ex = jnp.asarray([1, 0, 1], jnp.int32)  # partition 1 masked

    c_st, s_st = traversal_fused_stacked(
        data['clv'], data['scaler'], p_idx, q_idx, r_idx, tt, lzq, lzr,
        lams, eis, evs, ex, n_exec=n_exec, n_rows=ROWS, block_w=128,
        interpret=True)

    for p in range(P):
        cp, sp = (data['clv'][p], data['scaler'][p])
        if ex[p]:
            cp, sp = traversal_fused_pallas(
                cp, sp, p_idx, q_idx, r_idx, tt, lzq[:, p], lzr[:, p],
                lams[p][None], eis[p], evs[p], n_exec=n_exec,
                n_rows=ROWS, block_w=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(c_st[p]), np.asarray(cp))
        np.testing.assert_array_equal(np.asarray(s_st[p]), np.asarray(sp))


def test_newview_level_stacked(data):
    rng = np.random.default_rng(2)
    N = 3
    p_idx = jnp.asarray([8, 9, 10], jnp.int32)
    q_idx = jnp.asarray([1, 2, 5], jnp.int32)
    r_idx = jnp.asarray([3, 4, 6], jnp.int32)
    tt = jnp.asarray([1, 0, 0], jnp.int32)
    qz = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
    rz = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
    pls, prs, evs = [], [], []
    for p in range(P):
        pl_p, pr_p = make_p_batch(qz, rz, data['gamma'][p],
                                  data['eign'][p], data['ei'][p])
        pls.append(pl_p)
        prs.append(pr_p)
        evs.append(blockdiag(data['ev'][p]))
    pls, prs, evs = jnp.stack(pls), jnp.stack(prs), jnp.stack(evs)

    c_st, s_st = newview_level_stacked(
        data['clv'], data['scaler'], p_idx, q_idx, r_idx, tt,
        pls.astype(jnp.float32), prs.astype(jnp.float32), evs,
        block_w=128, interpret=True)

    for p in range(P):
        cp, sp = newview_level_pallas(
            data['clv'][p], data['scaler'][p], p_idx, q_idx,
            r_idx, tt, pls[p].astype(jnp.float32),
            prs[p].astype(jnp.float32), evs[p], block_w=128,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(c_st[p]), np.asarray(cp))
        np.testing.assert_array_equal(np.asarray(s_st[p]), np.asarray(sp))


def test_evaluate_stacked(data):
    jp = jnp.asarray([8], jnp.int32)
    jq = jnp.asarray([3], jnp.int32)
    lz = np.log(np.asarray([0.7, 0.8, 0.9]))
    dws = jnp.stack([
        (fold_rw(data['rw'][p], S)
         * jnp.exp(fold_lam(data['eign'][p], data['gamma'][p]) * lz[p]))
        for p in range(P)]).astype(jnp.float32)
    out = evaluate_stacked(data['clv'], data['scaler'], jp, jq,
                           dws[:, None, :], data['wgt'], block_w=128,
                           interpret=True)
    for p in range(P):
        one = evaluate_pallas(data['clv'][p], data['scaler'][p],
                              jp, jq, dws[p][None], data['wgt'][p],
                              block_w=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(out[p]), np.asarray(one))


def test_evaluate_batch_stacked(data):
    rng = np.random.default_rng(3)
    N = 4
    jp = jnp.asarray([8, 9, 10, 11], jnp.int32)
    jq = jnp.asarray([3, 1, 2, 5], jnp.int32)
    lzs = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (P, N))), jnp.float32)
    lams = jnp.stack([fold_lam(data['eign'][p], data['gamma'][p])
                      for p in range(P)]).astype(jnp.float32)
    rws = jnp.stack([fold_rw(data['rw'][p], S)
                     for p in range(P)]).astype(jnp.float32)
    out = evaluate_batch_gamma_stacked(
        data['clv'], data['scaler'], jp, jq, lzs, lams, rws, data['wgt'],
        block_w=128, interpret=True)
    for p in range(P):
        one = evaluate_batch_gamma(
            data['clv'][p], data['scaler'][p], jp, jq, lzs[p],
            lams[p], rws[p], data['wgt'][p], block_w=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(out[p]), np.asarray(one))


def test_nr_derivatives_stacked(data):
    jp = jnp.asarray([8], jnp.int32)
    jq = jnp.asarray([3], jnp.int32)
    lz = np.log(np.asarray([0.7, 0.8, 0.9]))
    lams = jnp.stack([fold_lam(data['eign'][p], data['gamma'][p])
                      for p in range(P)]).astype(jnp.float32)
    ds = jnp.stack([
        (fold_rw(data['rw'][p], S) * jnp.exp(lams[p] * lz[p]))
        for p in range(P)]).astype(jnp.float32)
    d1, d2 = nr_derivatives_stacked(
        data['clv'], data['scaler'], jp, jq, lams[:, None, :],
        ds[:, None, :], data['wgt'], block_w=128, interpret=True)
    for p in range(P):
        o1, o2 = nr_derivatives_pallas(
            data['clv'][p], data['scaler'][p], jp, jq,
            lams[p][None], ds[p][None], data['wgt'][p], block_w=128,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(d1[p]), np.asarray(o1))
        np.testing.assert_array_equal(np.asarray(d2[p]), np.asarray(o2))


def test_nr_batch_stacked(data):
    rng = np.random.default_rng(4)
    N = 4
    jp = jnp.asarray([8, 9, 10, 11], jnp.int32)
    jq = jnp.asarray([3, 1, 2, 5], jnp.int32)
    lzs = jnp.asarray(np.log(rng.uniform(0.2, 0.95, N)), jnp.float32)
    lams = jnp.stack([fold_lam(data['eign'][p], data['gamma'][p])
                      for p in range(P)]).astype(jnp.float32)
    rws = jnp.stack([fold_rw(data['rw'][p], S)
                     for p in range(P)]).astype(jnp.float32)
    d1, d2 = nr_derivatives_batch_stacked(
        data['clv'], data['scaler'], jp, jq, lams[:, None, :],
        rws[:, None, :], data['wgt'], jnp.tile(lzs[None, :], (P, 1)),
        block_w=128, interpret=True)
    for p in range(P):
        o1, o2 = nr_derivatives_batch_pallas(
            data['clv'][p], data['scaler'][p], jp, jq,
            lams[p][None], rws[p][None], data['wgt'][p], lzs,
            block_w=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(d1[p]), np.asarray(o1))
        np.testing.assert_array_equal(np.asarray(d2[p]), np.asarray(o2))

    # -M case: each partition carries its own branch-length column.
    lzs_m = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (P, N))), jnp.float32)
    d1m, d2m = nr_derivatives_batch_stacked(
        data['clv'], data['scaler'], jp, jq, lams[:, None, :],
        rws[:, None, :], data['wgt'], lzs_m, block_w=128, interpret=True)
    for p in range(P):
        o1, o2 = nr_derivatives_batch_pallas(
            data['clv'][p], data['scaler'][p], jp, jq,
            lams[p][None], rws[p][None], data['wgt'][p], lzs_m[p],
            block_w=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(d1m[p]), np.asarray(o1))
        np.testing.assert_array_equal(np.asarray(d2m[p]), np.asarray(o2))


def test_tip_rows_stacked(data):
    rng = np.random.default_rng(5)
    n_tips = 7
    n_codes = 16
    T1p = 16
    codes = jnp.asarray(rng.integers(1, n_codes, (P, T1p, W)), jnp.int32)
    tipvec = jnp.asarray(rng.uniform(0.1, 1.0, (P, C, n_codes, S)),
                         jnp.float32)
    folded = jnp.stack([fold_tipvec(tipvec[p]) for p in range(P)])
    out = tip_rows_stacked(data['clv'], codes, folded, n_tips,
                           block_w=128, interpret=True)
    for p in range(P):
        one = tip_rows_pallas(data['clv'][p], codes[p], folded[p],
                              n_tips, block_w=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(out[p]), np.asarray(one))
