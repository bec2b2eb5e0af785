"""The fused Pallas kernels must reproduce the jnp reference kernels in
f32 (interpret mode on CPU).

The Pallas GAMMA path uses the folded [rows, K=C*S, W] CLV layout with ONE
per-site scale counter shared by all categories (the reference's own
scheme, newviewGenericSpecial.c:1140-1168), while the jnp f64 parity path
keeps per-(category, site) counters. CLV values are therefore compared
with scaling disabled (min_scale=0), and the scaling machinery is checked
separately through its defining invariant: the evaluated log likelihood
is unchanged by rescaling, while the counters do fire."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from examl_tpu.kernels import reference_jnp as K
from examl_tpu.kernels.pallas_newview import (blockdiag, evaluate_pallas,
                                              fold_lam, fold_rw,
                                              make_p_batch,
                                              newview_level_pallas,
                                              newview_level_pallas_psr,
                                              per_site_lnl_pallas,
                                              traversal_fused_pallas)


def _fold(clv):
    rows, C, S, W = clv.shape
    return jnp.asarray(clv).reshape(rows, C * S, W)


@pytest.mark.parametrize('n_states', [4, 20])
def test_pallas_matches_reference(n_states):
    rng = np.random.default_rng(0)
    rows, C, S, W = 12, 4, n_states, 256
    clv = jnp.asarray(rng.uniform(0.1, 1.0, (rows, C, S, W)), jnp.float32)
    scaler = jnp.zeros((rows, C, W), jnp.int32)
    p_idx = jnp.asarray([8, 9, 10], jnp.int32)
    q_idx = jnp.asarray([1, 2, 5], jnp.int32)
    r_idx = jnp.asarray([3, 4, 6], jnp.int32)
    tip_tip = jnp.asarray([1, 0, 0], jnp.int32)
    qz = jnp.asarray(rng.uniform(0.2, 0.95, 3), jnp.float32)
    rz = jnp.asarray(rng.uniform(0.2, 0.95, 3), jnp.float32)
    eign = jnp.asarray(np.sort(np.abs(rng.normal(1, 1, (C, S)))), jnp.float32)
    eign = eign.at[:, 0].set(0.0)
    ei = jnp.asarray(rng.normal(0, 1, (C, S, S)), jnp.float32)
    ei = ei.at[:, :, 0].set(1.0)
    ev = jnp.asarray(rng.normal(0, 1, (C, S, S)), jnp.float32)
    gamma = jnp.asarray([0.2, 0.6, 1.1, 2.1], jnp.float32)

    pls, prs = make_p_batch(qz, rz, gamma, eign, ei)
    # per-category P blocks for the jnp reference walk
    pls_c = np.stack([np.asarray(pls)[:, c * S:(c + 1) * S,
                                      c * S:(c + 1) * S]
                      for c in range(C)], axis=1)
    prs_c = np.stack([np.asarray(prs)[:, c * S:(c + 1) * S,
                                      c * S:(c + 1) * S]
                      for c in range(C)], axis=1)

    clv_ref = np.asarray(clv).copy()
    sc_ref = np.asarray(scaler).copy()
    for i in range(3):
        x3, s3 = K.newview_kernel(
            jnp.asarray(clv_ref[int(q_idx[i])]),
            jnp.asarray(clv_ref[int(r_idx[i])]),
            jnp.asarray(sc_ref[int(q_idx[i])]),
            jnp.asarray(sc_ref[int(r_idx[i])]),
            jnp.asarray(pls_c[i]), jnp.asarray(prs_c[i]), ev,
            bool(int(tip_tip[i])), 0.0, 1.0)
        clv_ref[int(p_idx[i])] = np.asarray(x3)
        sc_ref[int(p_idx[i])] = np.asarray(s3)

    clv2, sc2 = newview_level_pallas(
        _fold(clv), jnp.zeros((rows, 1, W), jnp.int32), p_idx, q_idx, r_idx,
        tip_tip, pls, prs, blockdiag(ev),
        block_w=128, min_scale=0.0, inv_min_scale=1.0, interpret=True)
    np.testing.assert_allclose(
        np.asarray(clv2).reshape(rows, C, S, W), clv_ref, rtol=1e-5,
        atol=1e-7)
    assert np.array_equal(np.asarray(sc2), np.zeros((rows, 1, W)))


def test_joint_scaling_invariance():
    """The folded kernel's per-site joint scaling: counters fire on small
    columns, and the evaluated lnL is identical with scaling on or off."""
    rng = np.random.default_rng(7)
    rows, C, S, W = 8, 4, 4, 256
    # tiny CLV magnitudes force the scale trigger
    clv = jnp.asarray(rng.uniform(1e-12, 1e-10, (rows, C, S, W)),
                      jnp.float32)
    p_idx = jnp.asarray([6, 7], jnp.int32)
    q_idx = jnp.asarray([1, 6], jnp.int32)
    r_idx = jnp.asarray([2, 3], jnp.int32)
    tip_tip = jnp.zeros(2, jnp.int32)
    qz = jnp.asarray(rng.uniform(0.2, 0.95, 2), jnp.float32)
    rz = jnp.asarray(rng.uniform(0.2, 0.95, 2), jnp.float32)
    from examl_tpu.datatypes import DataType, info_for
    from examl_tpu.models.eigen import make_eigen
    es = make_eigen(rng.uniform(0.2, 2.0, 6), rng.dirichlet(np.full(4, 10.0)),
                    info_for(DataType.DNA).bit_vectors)
    eign = jnp.asarray(np.tile(es.EIGN, (C, 1)), jnp.float32)
    ei = jnp.asarray(np.tile(es.EI, (C, 1, 1)), jnp.float32)
    ev = jnp.asarray(np.tile(es.EV, (C, 1, 1)), jnp.float32)
    gamma = jnp.asarray([0.2, 0.6, 1.1, 2.1], jnp.float32)
    ms, ims = 2.0 ** -30, 2.0 ** 30
    lms = float(np.log(ms))
    pls, prs = make_p_batch(qz, rz, gamma, eign, ei)

    outs = {}
    for tag, mn, inv in (('scaled', ms, ims), ('raw', 0.0, 1.0)):
        c2, s2 = newview_level_pallas(
            _fold(clv), jnp.zeros((rows, 1, W), jnp.int32), p_idx, q_idx,
            r_idx, tip_tip, pls, prs, blockdiag(ev),
            block_w=128, min_scale=mn, inv_min_scale=inv, interpret=True)
        lz = float(np.log(0.7))
        dw = fold_rw(jnp.full((C,), 0.25, jnp.float32), S) * jnp.exp(
            fold_lam(eign, gamma) * lz)
        lnl = evaluate_pallas(
            c2, s2, jnp.asarray([7], jnp.int32), jnp.asarray([4], jnp.int32),
            dw[None, :], jnp.ones(W, jnp.float32),
            block_w=128, log_min_scale=lms, interpret=True)
        outs[tag] = (float(lnl), int(np.asarray(s2).sum()))

    assert outs['scaled'][1] > 0           # counters fired
    assert outs['raw'][1] == 0
    # identical lnL: the counter exactly accounts for the rescaling
    np.testing.assert_allclose(outs['scaled'][0], outs['raw'][0],
                               rtol=1e-6)


@pytest.mark.parametrize('n_states', [4, 20])
def test_traversal_fused_matches_reference(n_states):
    """The whole-traversal fused kernel (one pallas_call, VMEM-resident
    CLV block, on-the-fly P matrices) must reproduce the jnp reference
    walk over a DEPENDENT op chain — including that rows beyond n_rows
    (the scratch tail) are left untouched."""
    rng = np.random.default_rng(2)
    rows, C, S, W = 16, 4, n_states, 256
    n_rows = 12
    clv = jnp.asarray(rng.uniform(0.1, 1.0, (rows, C, S, W)), jnp.float32)
    # dependent chain: op2 consumes op0/op1 results
    p_idx = jnp.asarray([8, 9, 10], jnp.int32)
    q_idx = jnp.asarray([1, 2, 8], jnp.int32)
    r_idx = jnp.asarray([3, 4, 9], jnp.int32)
    tip_tip = jnp.asarray([1, 0, 0], jnp.int32)
    qz = rng.uniform(0.2, 0.95, 3)
    rz = rng.uniform(0.2, 0.95, 3)
    # real (well-conditioned) eigensystem, like production models
    from examl_tpu.datatypes import DataType, info_for
    from examl_tpu.models.eigen import make_eigen
    inf = info_for(DataType.DNA if S == 4 else DataType.AA)
    nr = S * (S - 1) // 2
    freqs = rng.dirichlet(np.full(S, 10.0))
    es = make_eigen(rng.uniform(0.2, 2.0, nr), freqs, inf.bit_vectors)
    eign = jnp.asarray(np.tile(es.EIGN, (C, 1)), jnp.float32)
    ei = jnp.asarray(np.tile(es.EI, (C, 1, 1)), jnp.float32)
    ev = jnp.asarray(np.tile(es.EV, (C, 1, 1)), jnp.float32)
    gamma = jnp.asarray([0.2, 0.6, 1.1, 2.1], jnp.float32)

    pls, prs = make_p_batch(jnp.asarray(qz, jnp.float32),
                            jnp.asarray(rz, jnp.float32), gamma, eign, ei)
    pls_c = np.stack([np.asarray(pls)[:, c * S:(c + 1) * S,
                                      c * S:(c + 1) * S]
                      for c in range(C)], axis=1)
    prs_c = np.stack([np.asarray(prs)[:, c * S:(c + 1) * S,
                                      c * S:(c + 1) * S]
                      for c in range(C)], axis=1)
    clv_ref = np.asarray(clv).copy()
    sc_ref = np.zeros((rows, C, W), np.int32)
    for i in range(3):
        x3, s3 = K.newview_kernel(
            jnp.asarray(clv_ref[int(q_idx[i])]),
            jnp.asarray(clv_ref[int(r_idx[i])]),
            jnp.asarray(sc_ref[int(q_idx[i])]),
            jnp.asarray(sc_ref[int(r_idx[i])]),
            jnp.asarray(pls_c[i]), jnp.asarray(prs_c[i]), ev,
            bool(int(tip_tip[i])), 0.0, 1.0)
        clv_ref[int(p_idx[i])] = np.asarray(x3)
        sc_ref[int(p_idx[i])] = np.asarray(s3)

    lam = fold_lam(eign, gamma)
    lzq = jnp.asarray(np.log(np.maximum(qz, 1e-15)), jnp.float32)
    lzr = jnp.asarray(np.log(np.maximum(rz, 1e-15)), jnp.float32)
    clv2, sc2 = traversal_fused_pallas(
        _fold(clv), jnp.zeros((rows, 1, W), jnp.int32), p_idx, q_idx, r_idx,
        tip_tip, lzq, lzr, lam[None, :], blockdiag(ei), blockdiag(ev),
        n_rows=n_rows, block_w=128, min_scale=0.0, inv_min_scale=1.0,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(clv2).reshape(rows, C, S, W), clv_ref,
        rtol=5e-5, atol=1e-6)
    assert np.array_equal(np.asarray(sc2), np.zeros((rows, 1, W)))
    # the tail rows (>= n_rows) kept their original contents
    np.testing.assert_array_equal(
        np.asarray(clv2).reshape(rows, C, S, W)[n_rows:],
        np.asarray(clv)[n_rows:])


@pytest.mark.parametrize('n_states', [4, 20])
def test_pallas_psr_matches_reference(n_states):
    """PSR per-site-rate path: the fused Pallas newview/per-site-lnl kernels
    must agree with the jnp reference kernels (newview_kernel_persite /
    per_site_lnl_kernel); the Pallas side runs the folded [rows, S, W]
    layout (C=1 folds trivially).

    This is the cross-check the round-1 layout bug (jnp kernels written for
    [1, W, S]) would have caught."""
    rng = np.random.default_rng(1)
    rows, S, W = 12, n_states, 256
    clv = jnp.asarray(rng.uniform(0.1, 1.0, (rows, 1, S, W)), jnp.float32)
    scaler = jnp.asarray(rng.integers(0, 3, (rows, 1, W)), jnp.int32)
    p_idx = jnp.asarray([8, 9, 10], jnp.int32)
    q_idx = jnp.asarray([1, 2, 5], jnp.int32)
    r_idx = jnp.asarray([3, 4, 6], jnp.int32)
    tip_tip = jnp.asarray([1, 0, 0], jnp.int32)
    qz = rng.uniform(0.2, 0.95, 3)
    rz = rng.uniform(0.2, 0.95, 3)
    eign = np.sort(np.abs(rng.normal(1, 1, S)))
    eign[0] = 0.0
    eign = jnp.asarray(eign, jnp.float32)
    ei = jnp.asarray(rng.normal(0, 1, (S, S)), jnp.float32)
    ei = ei.at[:, 0].set(1.0)
    ev = jnp.asarray(rng.normal(0, 1, (S, S)), jnp.float32)
    site_rates = jnp.asarray(rng.uniform(0.1, 3.0, W), jnp.float32)
    ms, ims = 2.0 ** -30, 2.0 ** 30
    lms = float(np.log(ms))

    # jnp reference walk
    clv_ref = np.asarray(clv).copy()
    sc_ref = np.asarray(scaler).copy()
    for i in range(3):
        lzq = jnp.asarray(np.log(max(qz[i], 1e-15)), jnp.float32)
        lzr = jnp.asarray(np.log(max(rz[i], 1e-15)), jnp.float32)
        x3, s3 = K.newview_kernel_persite(
            jnp.asarray(clv_ref[int(q_idx[i])]),
            jnp.asarray(clv_ref[int(r_idx[i])]),
            jnp.asarray(sc_ref[int(q_idx[i])]),
            jnp.asarray(sc_ref[int(r_idx[i])]),
            site_rates, lzq, lzr, eign, ei, ev,
            bool(int(tip_tip[i])), ms, ims)
        clv_ref[int(p_idx[i])] = np.asarray(x3)
        sc_ref[int(p_idx[i])] = np.asarray(s3)
    root_lz = jnp.asarray(np.log(0.7), jnp.float32)
    lnl_ref = K.per_site_lnl_kernel(
        jnp.asarray(clv_ref[8]), jnp.asarray(clv_ref[9]),
        jnp.asarray(sc_ref[8]), jnp.asarray(sc_ref[9]),
        site_rates, eign, root_lz, lms)

    # Pallas walk (interpret mode) on the folded [rows, S, W] layout
    lzq_all = jnp.asarray(np.log(np.maximum(qz, 1e-15)), jnp.float32)
    lzr_all = jnp.asarray(np.log(np.maximum(rz, 1e-15)), jnp.float32)
    lamq = eign[None, :] * lzq_all[:, None]
    lamr = eign[None, :] * lzr_all[:, None]
    clv2, sc2 = newview_level_pallas_psr(
        jnp.asarray(clv)[:, 0], scaler, p_idx, q_idx,
        r_idx, tip_tip, lamq, lamr, ei, ev,
        site_rates, block_w=128, min_scale=ms, inv_min_scale=ims,
        interpret=True)
    # f32 dot-vs-einsum accumulation order differs; bound the drift tightly
    np.testing.assert_allclose(np.asarray(clv2), clv_ref[:, 0],
                               rtol=5e-5, atol=1e-5)
    assert np.array_equal(np.asarray(sc2), sc_ref)

    lnl2 = per_site_lnl_pallas(
        clv2, sc2, jnp.asarray([8], jnp.int32), jnp.asarray([9], jnp.int32),
        eign[None, :], site_rates, jnp.asarray([root_lz]),
        block_w=128, log_min_scale=lms, interpret=True)
    np.testing.assert_allclose(np.asarray(lnl2), np.asarray(lnl_ref),
                               rtol=1e-5)


def test_traversal_grouped_matches_ungrouped():
    """The grouped fused kernel (G independent ops per block-diagonal MXU
    matmul, pack_grouped descriptor layout) must be numerically identical
    to the per-op fused kernel on a real whole-tree traversal, including
    the scaling counters."""
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import _synthetic
    from examl_tpu.kernels.pallas_newview import (blockdiag_tile, fold_lam,
                                                  traversal_fused_pallas)
    from examl_tpu.traversal import pack_grouped, full_traversal
    from examl_tpu.tree import Tree

    args, consts, _ = _synthetic(n_taxa=24, sites=256, dtype=jnp.float32)
    a = args
    rows, C, S, W = a['clv'].shape
    clv0 = a['clv'].reshape(rows, C * S, W)
    sc0 = a['scaler'][:, :1, :]
    # aggressive min_scale so the scaling path fires
    ms, ims = 2.0 ** -6, 2.0 ** 6

    jp = a['p_idx'].astype(jnp.int32)
    jq = a['q_idx'].astype(jnp.int32)
    jr = a['r_idx'].astype(jnp.int32)
    jt = a['tip_tip'].astype(jnp.int32)
    lzq = jnp.log(jnp.maximum(a['qz'], 1e-15)).astype(jnp.float32)
    lzr = jnp.log(jnp.maximum(a['rz'], 1e-15)).astype(jnp.float32)
    lam = fold_lam(a['eign'], a['gamma']).astype(jnp.float32)[None, :]
    ei_bd = blockdiag(a['ei']).astype(jnp.float32)
    ev_bd = blockdiag(a['ev']).astype(jnp.float32)

    # re-pack the packed flat descriptor into aligned independent groups:
    # easiest via the tree itself
    from examl_tpu.traversal import TraversalEntry
    ents = []
    n_real = len(np.asarray(jp))
    for i in range(n_real):
        p, q, r = int(jp[i]), int(jq[i]), int(jr[i])
        if p == rows - 1:                       # padding entry
            continue
        ents.append(TraversalEntry(
            0 if int(jt[i]) else 2, p, q, r,
            [float(np.exp(lzq[i]))], [float(np.exp(lzr[i]))]))

    class _T:                                   # minimal tree facade
        mxtips = rows // 2
        num_branches = 1
    g8 = pack_grouped(_T(), ents, 8)
    gjp = jnp.asarray(g8.p_idx)
    gjq = jnp.asarray(g8.q_idx)
    gjr = jnp.asarray(g8.r_idx)
    gjt = jnp.asarray(g8.tip_tip.astype(np.int32))
    glzq = jnp.asarray(np.log(np.maximum(g8.qz[:, 0], 1e-15)),
                       jnp.float32)
    glzr = jnp.asarray(np.log(np.maximum(g8.rz[:, 0], 1e-15)),
                       jnp.float32)

    outs = {}
    for g in (1, 2, 4, 8):
        c, s = traversal_fused_pallas(
            clv0, sc0, gjp, gjq, gjr, gjt, glzq, glzr, lam,
            blockdiag_tile(ei_bd, g), blockdiag_tile(ev_bd, g),
            n_rows=rows, block_w=128, group=g,
            min_scale=ms, inv_min_scale=ims, interpret=True)
        outs[g] = (np.asarray(c), np.asarray(s))

    assert outs[1][1].sum() > 0                  # scaling fired
    for g in (2, 4, 8):
        # few-ULP drift: the [G*K, G*K] dot reassociates the K-term sums
        np.testing.assert_allclose(outs[g][0], outs[1][0],
                                   rtol=1e-5, atol=5e-6)
        np.testing.assert_array_equal(outs[g][1], outs[1][1])
