"""Compare the batched wave's per-candidate scores against a TRUE
sequential walk of the same side (same pruned state), at the first side
whose wave produces an impossible score."""
import pathlib
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np                                        # noqa: E402
from examl_tpu import constants as C                      # noqa: E402
from examl_tpu.io.bytefile import read_bytefile           # noqa: E402
from examl_tpu.run import run_search                      # noqa: E402
import examl_tpu.search.spr as spr_mod                    # noqa: E402

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'

orig_side = spr_mod.SprSearch._batched_rearrange_side


def patched_side(self, p, p1, p2, mintrav, maxtrav):
    import jax.numpy as jnp
    zdev = (jnp.asarray(self.zqr, jnp.float32)
            if self.sub_capable else None)
    side = self._dispatch_side(p, p1, p2, mintrav, maxtrav, zqr_dev=zdev)
    if side in (None, 'overflow'):
        if side == 'overflow':
            for a in (p1, p2):
                if self.tr.is_tip(a.number):
                    continue
                self.add_traverse_big(p, a.next.back, mintrav, maxtrav)
                self.add_traverse_big(p, a.next.next.back, mintrav,
                                      maxtrav)
        return
    self._fetch_sides([side])
    scores = side['segs'][0]['scores']
    n = side['segs'][0]['n']
    if np.max(scores[:n]) > self.end_lh + 500:
        print(f'BOGUS SIDE: prune={p.number} p1={p1.number} '
              f'p2={p2.number} mintrav={mintrav} maxtrav={maxtrav}')
        # run the TRUE sequential walk on the same pruned state, with
        # cuts DISABLED so every candidate is scored
        seq_scores = []
        orig_test = spr_mod.SprSearch.test_insert_big

        def rec_test(s2, pp, qq):
            r = qq.back
            qz = list(qq.z)
            pz = list(pp.z)
            s2.insert_big(pp, qq)
            lh = s2.eng.evaluate(pp.next.next)
            seq_scores.append((qq.number, lh))
            s2.tr.hookup(qq, r, qz)
            pp.next.back = pp.next.next.back = None
            if s2.thorough:
                s2.tr.hookup(pp, s2.tr.nodep[pp.number].back, pz)
            return True

        spr_mod.SprSearch.test_insert_big = rec_test
        try:
            for a in (p1, p2):
                if self.tr.is_tip(a.number):
                    continue
                self.add_traverse_big(p, a.next.back, mintrav, maxtrav)
                self.add_traverse_big(p, a.next.next.back, mintrav,
                                      maxtrav)
        finally:
            spr_mod.SprSearch.test_insert_big = orig_test
        print(' cand |  u  |   wave score    |   seq score     | diff')
        for i, c in enumerate(side['cands']):
            w = float(scores[i])
            sq = seq_scores[i][1] if i < len(seq_scores) else float('nan')
            un = seq_scores[i][0] if i < len(seq_scores) else -1
            mark = ' <<<' if abs(w - sq) > 0.01 else ''
            print(f'  {i:3d} | {c["u"].number:3d}/{un:3d} | {w:15.4f} | '
                  f'{sq:15.4f} | {w - sq:10.4f}{mark}')
        sys.stdout.flush()
        raise SystemExit(3)
    self._replay_side(side)
    self._commit_side(side)


spr_mod.SprSearch._batched_rearrange_side = patched_side

orig_init = spr_mod.SprSearch.__init__


def patched_init(self, engine, **kw):
    kw['batch_lazy'] = True
    orig_init(self, engine, **kw)
    self.speculate = False


spr_mod.SprSearch.__init__ = patched_init

aln = read_bytefile(str(DATA / '49.binary'))
res = run_search(aln, (REF / '49.tree').read_text(), verbose=False)
print('finished without bogus side', res.likelihood)
