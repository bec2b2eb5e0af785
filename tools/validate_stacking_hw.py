"""Hardware validation for partition stacking (docs/STACKING.md).

Run on a real TPU chip (NOT under JAX_PLATFORMS=cpu). Three phases:

1. kernel: every stacked Mosaic kernel on small aligned shapes, compared
   bit-for-bit against per-p-slice runs of the per-partition kernels
   (the Mosaic alignment rules interpret mode under-enforces are the
   whole point of this run);
2. engine: testData/49 f32, stack=True vs stack=False — evaluate,
   treeEvaluate, one batched SPR wave;
3. timing: per-op device time of the stacked vs per-partition evaluate
   (the ~(P-1) x 0.3 ms launch-overhead claim).

Writes one JSON line to stdout; exit 0 = stacking safe to default on.

Usage: python tools/validate_stacking_hw.py [--json OUT]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    out = {'backend': jax.default_backend(),
           'kernel': None, 'engine': None, 'timing': None, 'ok': False}
    if jax.default_backend() == 'cpu':
        out['error'] = 'running on CPU; this validates nothing'
        print(json.dumps(out))
        return 1

    from examl_tpu.kernels.pallas_newview import (
        blockdiag, evaluate_batch_gamma, evaluate_batch_gamma_stacked,
        evaluate_pallas, evaluate_stacked, fold_lam, fold_rw,
        make_p_batch, newview_level_pallas, newview_level_stacked,
        nr_derivatives_batch_pallas, nr_derivatives_batch_stacked,
        nr_derivatives_pallas, nr_derivatives_stacked,
        traversal_fused_pallas, traversal_fused_stacked)

    # ---------------- phase 1: kernels ----------------
    rng = np.random.default_rng(7)
    P, ROWS, C, S, W = 3, 16, 4, 4, 256
    K = C * S
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
    wgt = jnp.asarray(rng.integers(1, 4, (P, W)), jnp.float32)
    lams = jnp.stack([fold_lam(eign[p], gamma[p]) for p in range(P)])
    eis = jnp.stack([blockdiag(ei[p]) for p in range(P)])
    evs = jnp.stack([blockdiag(ev[p]) for p in range(P)])
    rws = jnp.stack([fold_rw(rw[p], S) for p in range(P)])

    kr = {}

    def check(name, got, want):
        eq = all(np.array_equal(np.asarray(a), np.asarray(b))
                 for a, b in zip(got, want))
        kr[name] = bool(eq)
        return eq

    # traversal
    L = 6
    p_idx = jnp.asarray([8, 9, 10, 11, 12, 13], jnp.int32)
    q_idx = jnp.asarray([1, 2, 5, 8, 9, 3], jnp.int32)
    r_idx = jnp.asarray([3, 4, 6, 7, 10, 11], jnp.int32)
    tt = jnp.asarray([1, 0, 0, 0, 0, 0], jnp.int32)
    lzq = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (L, P))), jnp.float32)
    lzr = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (L, P))), jnp.float32)
    ex = jnp.ones(P, jnp.int32)
    c_st, s_st = traversal_fused_stacked(
        clv, scaler, p_idx, q_idx, r_idx, tt, lzq, lzr, lams, eis, evs,
        ex, n_exec=5, n_rows=ROWS, block_w=128)
    refs = [traversal_fused_pallas(
        clv[p], scaler[p], p_idx, q_idx, r_idx, tt, lzq[:, p], lzr[:, p],
        lams[p][None], eis[p], evs[p], n_exec=5, n_rows=ROWS, block_w=128)
        for p in range(P)]
    check('traversal', [c_st[p] for p in range(P)], [r[0] for r in refs])
    check('traversal_scaler', [s_st[p] for p in range(P)],
          [r[1] for r in refs])

    # junction/level
    N = 3
    jpx = jnp.asarray([8, 9, 10], jnp.int32)
    jqx = jnp.asarray([1, 2, 5], jnp.int32)
    jrx = jnp.asarray([3, 4, 6], jnp.int32)
    jtt = jnp.asarray([1, 0, 0], jnp.int32)
    qz = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
    rz = jnp.asarray(rng.uniform(0.2, 0.95, N), jnp.float32)
    pls, prs = [], []
    for p in range(P):
        a, b = make_p_batch(qz, rz, gamma[p], eign[p], ei[p])
        pls.append(a.astype(jnp.float32))
        prs.append(b.astype(jnp.float32))
    c_st, s_st = newview_level_stacked(
        clv, scaler, jpx, jqx, jrx, jtt, jnp.stack(pls), jnp.stack(prs),
        evs, block_w=128)
    refs = [newview_level_pallas(
        clv[p], scaler[p], jpx, jqx, jrx, jtt, pls[p], prs[p], evs[p],
        block_w=128) for p in range(P)]
    check('level', [c_st[p] for p in range(P)], [r[0] for r in refs])

    # evaluate / batch / NR
    jp1 = jnp.asarray([8], jnp.int32)
    jq1 = jnp.asarray([3], jnp.int32)
    lz = np.log(np.asarray([0.7, 0.8, 0.9]))
    dws = jnp.stack([(rws[p] * jnp.exp(lams[p] * lz[p]))[None, :]
                     for p in range(P)]).astype(jnp.float32)
    got = evaluate_stacked(clv, scaler, jp1, jq1, dws, wgt, block_w=128)
    want = [evaluate_pallas(clv[p], scaler[p], jp1, jq1, dws[p],
                            wgt[p], block_w=128) for p in range(P)]
    check('evaluate', [got[p] for p in range(P)], want)

    jpN = jnp.asarray([8, 9, 10, 11], jnp.int32)
    jqN = jnp.asarray([3, 1, 2, 5], jnp.int32)
    lzs = jnp.asarray(np.log(rng.uniform(0.2, 0.95, (P, 4))), jnp.float32)
    got = evaluate_batch_gamma_stacked(clv, scaler, jpN, jqN, lzs,
                                       lams.astype(jnp.float32),
                                       rws.astype(jnp.float32), wgt,
                                       block_w=128)
    want = [evaluate_batch_gamma(clv[p], scaler[p], jpN, jqN, lzs[p],
                                 lams[p], rws[p], wgt[p], block_w=128)
            for p in range(P)]
    check('evaluate_batch', [got[p] for p in range(P)], want)

    ds = jnp.stack([(rws[p] * jnp.exp(lams[p] * lz[p]))[None, :]
                    for p in range(P)]).astype(jnp.float32)
    lam3 = jnp.stack([lams[p][None, :] for p in range(P)]).astype(
        jnp.float32)
    d1, d2 = nr_derivatives_stacked(clv, scaler, jp1, jq1, lam3, ds, wgt,
                                    block_w=128)
    want = [nr_derivatives_pallas(clv[p], scaler[p], jp1, jq1,
                                  lam3[p], ds[p], wgt[p], block_w=128)
            for p in range(P)]
    check('nr', [d1[p] for p in range(P)], [w[0] for w in want])

    lzsN = jnp.asarray(np.log(rng.uniform(0.2, 0.95, 4)), jnp.float32)
    rw3 = jnp.stack([rws[p][None, :] for p in range(P)]).astype(
        jnp.float32)
    d1, d2 = nr_derivatives_batch_stacked(clv, scaler, jpN, jqN, lam3,
                                          rw3, wgt, lzsN, block_w=128)
    want = [nr_derivatives_batch_pallas(clv[p], scaler[p], jpN, jqN,
                                        lam3[p], rw3[p], wgt[p], lzsN,
                                        block_w=128) for p in range(P)]
    check('nr_batch', [d1[p] for p in range(P)], [w[0] for w in want])

    out['kernel'] = kr
    kernels_ok = all(kr.values())

    # ---------------- phase 2: engine ----------------
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.io.bytefile import read_bytefile
    from examl_tpu.io.newick import parse_newick
    from examl_tpu.search.spr import SprSearch
    from examl_tpu.tree import Tree

    here = pathlib.Path(__file__).resolve().parent.parent
    aln = read_bytefile(str(here / 'tests' / 'data' / '49.binary'))
    er = {}
    engines = []
    for stack in (False, True):
        tree = Tree(aln.taxon_names)
        parse_newick(
            pathlib.Path('/root/reference/testData/49.tree').read_text(),
            tree)
        eng = LikelihoodEngine(aln, tree, dtype=jnp.float32,
                               use_pallas=True, stack=stack)
        engines.append((eng, tree))
    (e0, t0), (e1, t1) = engines
    l0 = e0.evaluate(t0.start, full_traversal_=True)
    l1 = e1.evaluate(t1.start, full_traversal_=True)
    er['evaluate'] = [l0, l1, abs(l0 - l1)]
    s0 = e0.tree_evaluate(1.0)
    s1 = e1.tree_evaluate(1.0)
    er['tree_evaluate'] = [s0, s1, abs(s0 - s1)]
    waves = []
    for eng, tr in engines:
        search = SprSearch(eng)
        search.start_lh = search.end_lh = eng.likelihood
        search.best_of_node = -1e30
        search.rearrange_big(tr.nodep[tr.mxtips + 5], 1, 5)
        waves.append(search.best_of_node)
    er['spr_wave'] = waves + [abs(waves[0] - waves[1])]
    out['engine'] = er
    engine_ok = (er['evaluate'][2] < 5e-3 and er['tree_evaluate'][2] < 5e-2
                 and er['spr_wave'][2] < 5e-2)

    # ---------------- phase 3: timing ----------------
    def time_op(eng, tr, iters=60):
        eng.evaluate(tr.start, full_traversal_=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            eng.evaluate(tr.start)
        # evaluate() fetches each call, so the loop is sync-bound too;
        # report per-op wall including the fetch
        return (time.perf_counter() - t0) / iters
    out['timing'] = {'unstacked_s': time_op(e0, t0),
                     'stacked_s': time_op(e1, t1)}

    out['ok'] = bool(kernels_ok and engine_ok)
    print(json.dumps(out))
    return 0 if out['ok'] else 1


if __name__ == '__main__':
    sys.exit(main())
