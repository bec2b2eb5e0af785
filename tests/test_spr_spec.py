"""The speculative SPR driver (lazy dispatch of several prune nodes' device
programs, ONE fetch per batch, discard-and-redispatch on applied
improvements) against the synchronous batched walk.

Without applies the two drivers are exactly equivalent: the junction NR
result flows through the identical device substitution in both, and the
replay sees the same values in the same order. With applies, a discarded
speculation leaves benignly-stale CLV refreshes — the same staleness class
the reference's lazy SPR embraces (it trusts x-flags across
restoreTreeFast, searchAlgo.c:1090) — so full cycles are compared to
tolerance."""
import pathlib

import numpy as np
import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick, write_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def _engine():
    import jax
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    # pad=128 aligns the site widths so the fused whole-traversal program
    # (which hosts the device branch substitution) plans on CPU too
    eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                           use_pallas=True, pad=128)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    return eng, tree


def _score_pass(speculate, thorough=False):
    """Pure scoring sweep (no applies): per-node best_of_node/end_lh must
    be BIT-IDENTICAL between the drivers."""
    eng, tree = _engine()
    s = SprSearch(eng)
    assert s.speculate              # fused program available
    s.speculate = speculate
    s.spec_depth = 4
    s.thorough = thorough
    s.start_lh = s.end_lh = eng.likelihood
    # the first-cycle cutoff treeOptimizeRapid would install
    # (searchAlgo.c:932-952); a raw 0.0 cutoff would cut every
    # score decrease, which no real cycle does
    s.lh_cutoff = eng.likelihood / -1000.0
    out = []

    def on_node(node):
        out.append((node.number, s.best_of_node, s.end_lh))
        return False

    s._spr_pass([tree.nodep[i] for i in range(1, 2 * tree.mxtips - 1)],
                1, 4, on_node)
    return out, eng.op_stats.get('spec_fetch', 0)


@pytest.mark.slow
def test_speculative_scoring_exact():
    a, fa = _score_pass(True)
    b, fb = _score_pass(False)
    assert a == b
    # Exactness bounds the win in cut-heavy passes: a speculated node is
    # replayed only after fingerprint revalidation against the committed
    # truth, and early-cycle cutoffs invalidate downstream waves often
    # (~1 fetch/node here vs 2/node sync). Cycles whose previous pass had
    # no decreases run with cutoff=inf and speculate at full depth.
    assert fa < fb


@pytest.mark.slow
def test_speculative_scoring_exact_thorough():
    a, fa = _score_pass(True, thorough=True)
    b, fb = _score_pass(False, thorough=True)
    assert a == b
    assert fa < fb


@pytest.mark.slow
def test_speculative_cycle_quality():
    """A full FAST cycle with applies: since the stale-exact walk lands
    every tested candidate's mutations identically under both drivers and
    speculated results are fingerprint-revalidated, the trajectories must
    coincide EXACTLY — same cycle lnL bit-for-bit — while the speculative
    driver still syncs less (applies and early-cycle cutoffs bound the
    win; no-decrease cycles speculate at full depth)."""

    def cycle(speculate):
        eng, tree = _engine()
        s = SprSearch(eng)
        s.speculate = speculate
        bt = BestList(20)
        lh = s.tree_optimize_rapid(1, 5, bt)
        return lh, eng.op_stats.get('spec_fetch', 0)

    lh_a, fa = cycle(True)
    lh_b, fb = cycle(False)
    assert lh_a == lh_b
    assert lh_a > -17990            # improved over the smoothed start tree
    assert fa < fb


@pytest.mark.slow
def test_fused_thorough_apply_matches_sequential():
    """The one-dispatch thorough apply (engine.apply_thorough: insertBIG's
    three NR fits + localSmooth + evaluate fused) against the sequential
    host apply over a THOROUGH cycle with real applies."""
    import types
    from examl_tpu.search.spr import SprSearch as S

    def run(fused):
        eng, tree = _engine()
        s = SprSearch(eng)
        s.thorough = True
        if not fused:
            orig = S.test_insert_restore_big

            def seq_apply(self, p, q):
                keep = self.batch_thorough
                self.batch_thorough = False
                try:
                    return orig(self, p, q)
                finally:
                    self.batch_thorough = keep

            s.test_insert_restore_big = types.MethodType(seq_apply, s)
        bt = BestList(20)
        lh = s.tree_optimize_rapid(1, 5, bt)
        zs = sorted(round(float(b.z[0]), 6) for b in tree.branches())
        return lh, zs, eng.op_stats

    lh_a, za, st_a = run(True)
    lh_b, zb, st_b = run(False)
    assert st_a.get('apply_thorough', 0) >= 1
    assert lh_a == pytest.approx(lh_b, abs=0.02)
    assert np.allclose(za, zb, atol=1e-4)
    # the fused apply eliminates the 3 NR syncs + 1 evaluate per apply
    assert (st_a.get('makenewz_device', 0)
            < st_b.get('makenewz_device', 1))


@pytest.mark.slow
def test_batched_bestlist_scan_matches_sequential():
    """The one-fetch BestList re-evaluation scan (recall + fused
    smooth+evaluate per candidate, all fetched together) against the
    sequential scan: same improvement decisions, same lnls, same saved
    trees."""

    def run(speculate):
        eng, tree = _engine()
        s = SprSearch(eng)
        s.speculate = speculate
        bt = BestList(20)
        s.tree_optimize_rapid(1, 5, bt)       # populate candidates
        assert bt.nvalid >= 5
        best_t = BestList(5)
        prev = eng.likelihood
        impr, lh = s._scan_best_list(bt, prev, prev, best_t, 0.01)
        return (impr, round(lh, 6),
                [round(e.likelihood, 6) for e in best_t.entries],
                round(eng.likelihood, 6))

    a = run(True)
    b = run(False)
    assert a == b


@pytest.mark.slow
def test_speculative_cycle_per_partition_branches():
    """-M (per-partition branch lengths): the speculative driver must
    match the synchronous one on the multi-branch-class engine (the
    waves and junction-NR substitution carry [B] branch vectors)."""
    def cycle(spec):
        import jax
        aln = read_bytefile(str(DATA / '49.binary'))
        tree = Tree(aln.taxon_names, num_branches=len(aln.partitions))
        parse_newick((REF / '49.tree').read_text(), tree)
        eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                               use_pallas=True, pad=128,
                               num_branches=len(aln.partitions))
        eng.evaluate(tree.start, full_traversal_=True)
        eng.tree_evaluate(1.0)
        s = SprSearch(eng)
        assert s.batch_thorough      # -M thorough waves plan too now
        s.speculate = spec
        bt = BestList(20)
        return s.tree_optimize_rapid(1, 5, bt)

    assert cycle(True) == cycle(False)
