import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import pathlib

import numpy as np
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path('tests/data')

aln = read_bytefile(str(DATA / '49.binary'))
tree = Tree(aln.taxon_names)
parse_newick((REF / '49.tree').read_text(), tree)
eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32, use_pallas=True,
                       pad=128)
eng.evaluate(tree.start, full_traversal_=True)
eng.tree_evaluate(1.0)
s = SprSearch(eng)
s.thorough = True
bt = BestList(20)

orig = SprSearch.test_insert_restore_big
count = [0]


def compare_apply(self, p, q):
    count[0] += 1
    eng = self.eng
    # fused version first (on copies of the engine CLV state)
    import copy
    import jax.numpy as jnp
    clv0 = [np.array(c) for c in eng.clv]
    sc0 = [np.array(c) for c in eng.scaler]
    xf = {id(rec): rec.x for i in range(1, 2 * tree.mxtips - 1)
          for rec in ([tree.nodep[i]] if tree.is_tip(tree.nodep[i].number)
                      else [tree.nodep[i], tree.nodep[i].next,
                            tree.nodep[i].next.next])}
    import math
    from examl_tpu import constants as C
    r_ = q.back
    s_ = p.back
    zqr = eng.makenewz(q, r_, list(q.z), C.ITERATIONS)
    zqs = eng.makenewz(q, s_, [C.DEFAULTZ], C.ITERATIONS)
    zrs = eng.makenewz(r_, s_, [C.DEFAULTZ], C.ITERATIONS)
    print('host NR zqr/zqs/zrs', zqr, zqs, zrs)
    from examl_tpu.kernels.pallas_newview import (
        nr_derivatives_batch_pallas, nr_derivatives_pallas, fold_lam,
        fold_rw)
    lz = float(np.log(q.z[0]))
    for m in range(eng.n_models):
        lam = fold_lam(eng.d_EIGN[m], eng.d_gamma[m]).astype(jnp.float32)
        rw = fold_rw(eng.d_rate_weights[m],
                     eng.d_EIGN[m].shape[1]).astype(jnp.float32)
        dd = (rw * jnp.exp(lam * lz)).astype(jnp.float32)
        bwm = min(8192, eng.widths[m])
        d1a, d2a = nr_derivatives_pallas(
            eng.clv[m], eng.scaler[m], jnp.asarray([q.number]),
            jnp.asarray([r_.number]), lam[None, :], dd[None, :],
            eng.wgts[m].astype(jnp.float32), block_w=bwm,
            log_min_scale=eng.log_min_scale, interpret=True)
        d1b, d2b = nr_derivatives_batch_pallas(
            eng.clv[m], eng.scaler[m], jnp.asarray([q.number]),
            jnp.asarray([r_.number]), lam[None, :], rw[None, :],
            eng.wgts[m].astype(jnp.float32),
            jnp.asarray([lz], jnp.float32), block_w=bwm, interpret=True)
        print('m', m, float(d1a), float(d1b[0]), float(d2a),
              float(d2b[0]))
    # replicate thoroughprog's batch_nr for (q, r) host-side
    def batch_nr_host(pn, qn, z0):
        z = np.float32(z0); zprev = z; zstep = np.float32(0.0)
        maxi = C.ITERATIONS; outer = False; curvat = True
        while not outer:
            if not outer and curvat:
                zprev = z
                zstep = np.float32((1.0 - C.ZMAX) * z + C.ZMIN)
                curvat = False
                continue
            active = not outer and not curvat
            z = np.float32(np.clip(z, C.ZMIN, C.ZMAX))
            lz = np.float32(np.log(z))
            d1t = d2t = 0.0
            for m in range(eng.n_models):
                lam = fold_lam(eng.d_EIGN[m],
                               eng.d_gamma[m]).astype(jnp.float32)
                rw = fold_rw(eng.d_rate_weights[m],
                             eng.d_EIGN[m].shape[1]).astype(jnp.float32)
                d1, d2 = nr_derivatives_batch_pallas(
                    eng.clv[m], eng.scaler[m], jnp.asarray([pn]),
                    jnp.asarray([qn]), lam[None, :], rw[None, :],
                    eng.wgts[m].astype(jnp.float32),
                    jnp.asarray([lz], jnp.float32),
                    block_w=min(8192, eng.widths[m]), interpret=True)
                d1t += float(d1[0]); d2t += float(d2[0])
            if d2t >= 0.0 and z < C.ZMAX:
                z = zprev = np.float32(0.37 * z + 0.63)
                curvat = True
                continue
            curvat = True   # mirrors curvat|(active&~shorten)? (prog sets)
            tantmp = -d1t / d2t
            if d2t < 0.0 and tantmp < 100.0:
                znr = max(z * np.exp(np.float32(tantmp)), C.ZMIN)
                znr = min(znr, 0.25 * zprev + 0.75)
            elif d2t < 0.0:
                znr = 0.25 * zprev + 0.75
            else:
                znr = z
            z = np.float32(min(znr, C.ZMAX))
            maxi -= 1
            moved = abs(z - zprev) > zstep
            if moved and maxi < -20:
                z = np.float32(z0); outer = True
            elif not moved:
                outer = True
            curvat = False
            zprev = z  # ... approximate; enough to see convergence region
        return z
    print('replicated batch_nr (q,r):',
          batch_nr_host(q.number, r_.number, q.z[0]))
    import os
    os.environ['EXAML_DEBUG_THOROUGH'] = '1'
    spare = eng.scratch_base
    out = eng.thorough_score_wave_lazy(
        s_.number, [q.number], [r_.number], [spare], [q.z[0]])
    vals = [np.asarray(h, np.float64) for h in out]
    print('prog lhs', vals[0][:, 0], 'e', vals[1][0], vals[2][0],
          vals[3][0], 'zqr/zqs/zrs', vals[4][0], vals[5][0], vals[6][0])
    del os.environ['EXAML_DEBUG_THOROUGH']
    raise SystemExit(0)
    per, e1, e2, e3 = eng.apply_thorough(p, q)
    print('fused  per', per, 'e', e1, e2, e3, 'sum', per.sum())
    # restore state
    eng.clv = [jnp.asarray(c) for c in clv0]
    eng.scaler = [jnp.asarray(c) for c in sc0]
    for i in range(1, 2 * tree.mxtips - 1):
        base = tree.nodep[i]
        recs = ([base] if tree.is_tip(base.number)
                else [base, base.next, base.next.next])
        for rec in recs:
            rec.x = xf[id(rec)]
    # sequential
    keep = self.batch_thorough
    self.batch_thorough = False
    try:
        orig(self, p, q)
    finally:
        self.batch_thorough = keep
    print('seq    per', eng.per_partition_lh, 'lz',
          self.lzq[0], self.lzr[0], self.lzs[0],
          'sum', eng.per_partition_lh.sum())
    raise SystemExit(0)


import types
s.test_insert_restore_big = types.MethodType(compare_apply, s)
s.tree_optimize_rapid(1, 5, bt)
