"""Thorough SPR candidate waves on the previously host-only modes: -M
(per-partition branch lengths, the reference's numBranches > 1 NR lanes,
makenewzGenericSpecial.c topLevelMakenewz) and PSR (per-site rates,
evaluateGTRCAT / coreGTRCAT). The batched thorough program carries
[N, B] branch-class state and PSR derivative/junction kernels; a full
thorough cycle must land where the sequential testInsertBIG walk lands
(searchAlgo.c:484-566 + localSmooth :270)."""
import pathlib

import numpy as np
import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def _engine(**kw):
    import jax
    aln = read_bytefile(str(DATA / '49.binary'))
    nb = kw.get('num_branches', 1)
    tree = Tree(aln.taxon_names, num_branches=nb)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                           use_pallas=True, pad=128, **kw)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    return eng, tree


def _thorough_cycle(batched, **kw):
    eng, tree = _engine(**kw)
    s = SprSearch(eng)
    if batched:
        assert s.batch_thorough, 'thorough waves must plan in this mode'
    s.batch_thorough = batched
    s.thorough = True
    bt = BestList(20)
    lh = s.tree_optimize_rapid(1, 5, bt)
    zs = sorted(round(float(z), 6) for b in tree.branches() for z in b.z)
    return lh, zs, [e.likelihood for e in bt.entries]


@pytest.mark.slow
def test_thorough_wave_per_partition_branches():
    """-M: the [N, B] wave NR + per-class junction P matrices against the
    sequential walk (reference: perGeneBranchLengths,
    optimizeModel.c/makenewzGenericSpecial.c numBranches lanes)."""
    nb = len(read_bytefile(str(DATA / '49.binary')).partitions)
    kw = dict(num_branches=nb)
    lh_a, za, bt_a = _thorough_cycle(True, **kw)
    lh_b, zb, bt_b = _thorough_cycle(False, **kw)
    assert lh_a == pytest.approx(lh_b, abs=0.02)
    assert np.allclose(za, zb, atol=1e-3)
    np.testing.assert_allclose(bt_a, bt_b, atol=0.02)


@pytest.mark.slow
def test_thorough_wave_psr():
    """PSR: the per-site-rate batched NR derivative and junction kernels
    against the sequential walk (reference CAT mode, coreGTRCAT)."""
    kw = dict(rate_het='PSR')
    lh_a, za, bt_a = _thorough_cycle(True, **kw)
    lh_b, zb, bt_b = _thorough_cycle(False, **kw)
    assert lh_a == pytest.approx(lh_b, abs=0.02)
    assert np.allclose(za, zb, atol=1e-3)
    np.testing.assert_allclose(bt_a, bt_b, atol=0.02)


@pytest.mark.slow
def test_thorough_cycle_shrunk_pool_exact():
    """The production slow-phase overflow regime: a THOROUGH cycle whose
    candidate recordings fill the scratch pool (BASELINE.md round-4 sync
    measurement: every slow-phase side at radius→21 overflows), forcing
    segmented (truncated) rounds. A truncated round legitimately
    allocates the pool's LAST row as a real lane's junction — the exact
    collision with the thorough wave's pad-lane spare row that round 4
    shipped (fixed: pad lanes sink to pad_sink_base, outside the pool).
    The segmented thorough cycle must land exactly on the sequential
    walk."""
    eng, tree = _engine()
    eng.n_scratch = 24
    s = SprSearch(eng)
    s.batch_thorough = True
    s.thorough = True
    truncs = {'n': 0}
    orig = SprSearch._dispatch_side

    def counting(self, p, p1, p2, mintrav, maxtrav, **kw):
        side = orig(self, p, p1, p2, mintrav, maxtrav, **kw)
        if isinstance(side, dict) and side.get('truncated'):
            truncs['n'] += 1
        return side

    s._dispatch_side = counting.__get__(s)
    bt = BestList(20)
    lh_a = s.tree_optimize_rapid(1, 5, bt)
    za = sorted(round(float(z), 6) for b in tree.branches() for z in b.z)
    bt_a = [e.likelihood for e in bt.entries]
    assert truncs['n'] > 0, 'the shrunk pool never forced segmentation'
    lh_b, zb, bt_b = _thorough_cycle(False)
    assert lh_a == pytest.approx(lh_b, abs=0.02)
    assert np.allclose(za, zb, atol=1e-3)
    np.testing.assert_allclose(bt_a, bt_b, atol=0.02)


def test_thorough_wave_scores_psr_smoke():
    """One thorough wave on the PSR engine scores finite lnLs and fitted
    branch lengths in-range (fast tier smoke for the PSR wave kernels)."""
    eng, tree = _engine(rate_het='PSR')
    s = SprSearch(eng)
    assert s.batch_thorough
    s.thorough = True
    p = next(n for n in (tree.nodep[i] for i in
                         range(tree.mxtips + 1, 2 * tree.mxtips - 1))
             if not tree.is_tip(n.number)
             and not tree.is_tip(n.next.back.number))
    from examl_tpu import constants as C
    s.start_lh = s.end_lh = eng.likelihood
    s.lh_cutoff = float('inf')
    s.best_of_node = float('-inf')
    n = s.rearrange_big(p, 1, 3)
    assert n == 1
    assert np.isfinite(s.best_of_node)
    assert s.best_of_node <= 0.0
    e1, e2, e3 = s.current_lzq, s.current_lzr, s.current_lzs
    for vec in (e1, e2, e3):
        assert len(vec) == eng.num_branches
        for z in vec:
            assert C.ZMIN <= z <= C.ZMAX
