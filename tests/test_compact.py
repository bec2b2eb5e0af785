"""Induced-subtree CLV compaction (-S successor, docs/SEV.md,
examl_tpu/compact.py): a partition's likelihood equals the likelihood of
the tree induced on its present taxa, so block-missing partitions store
~2*present(p) CLV rows instead of 2*mxtips (reference -S scope:
examl/axml.c:874-876 70 GB -> 19 GB, newviewGenericSpecial.c:135-160).
The compacted full evaluate must agree with the dense engine and the
CLV bytes must shrink by the present-fraction ratio."""
import numpy as np
import pytest

import jax.numpy as jnp

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

from test_sev_scale import _gappy_alignment


def _caterpillar(names):
    return ('(' + ',('.join(names[:-2]) + ',(' + names[-2] + ',' +
            names[-1] + ')' + ')' * (len(names) - 3) + ');')


def _pair(**kw):
    aln = _gappy_alignment(**kw)
    names = aln.taxon_names
    nwk = _caterpillar(names)
    tree_d = Tree(names)
    parse_newick(nwk, tree_d)
    dense = LikelihoodEngine(aln, tree_d, dtype=jnp.float32,
                             use_pallas=True, pad=128)
    tree_c = Tree(names)
    parse_newick(nwk, tree_c)
    comp = LikelihoodEngine(aln, tree_c, dtype=jnp.float32,
                            use_pallas=True, pad=128, compact=True)
    return aln, dense, tree_d, comp, tree_c


def test_compact_evaluate_matches_dense():
    aln, dense, tree_d, comp, tree_c = _pair()
    lnl_d = dense.evaluate(tree_d.start, full_traversal_=True)
    lnl_c = comp.evaluate(tree_c.start, full_traversal_=True)
    assert np.isfinite(lnl_c) and lnl_c < 0.0
    # mathematically identical (an absent tip marginalizes out; chains
    # contract via P(z1)P(z2) = P(z1*z2)); f32 path differences only
    assert lnl_c == pytest.approx(lnl_d, abs=0.05)
    np.testing.assert_allclose(comp.per_partition_lh,
                               dense.per_partition_lh, atol=0.02)

    # memory: 25%-present partitions must store far fewer CLV bytes
    d_bytes = sum(c.nbytes for c in dense.clv)
    c_bytes = sum(c.nbytes for c in comp.clv)
    assert c_bytes * 2.5 < d_bytes
    est = comp.memory_estimate()
    assert est['clv'] == c_bytes


def test_compact_evaluate_after_model_change():
    """Model-parameter updates rebuild eigensystems + tip rows; the
    compacted evaluate must track them (the -f e model-opt loop's
    evaluateChange pattern)."""
    aln, dense, tree_d, comp, tree_c = _pair()
    for eng in (dense, comp):
        for m in range(eng.n_models):
            eng.partitions[m].alpha = 0.7
            eng.partitions[m].gamma_rates = None
        from examl_tpu.models.gamma import make_gamma_cats
        for m in range(eng.n_models):
            eng.partitions[m].gamma_rates = make_gamma_cats(0.7, 4)
        eng.update_eigen(range(eng.n_models))
    lnl_d = dense.evaluate(tree_d.start, full_traversal_=True)
    lnl_c = comp.evaluate(tree_c.start, full_traversal_=True)
    assert lnl_c == pytest.approx(lnl_d, abs=0.05)


def test_compact_branch_change_tracks():
    """The induced traversal re-derives contracted branch lengths from
    the live tree: changing a global branch length must move the
    compacted lnL exactly like the dense one."""
    aln, dense, tree_d, comp, tree_c = _pair(n_taxa=32, part_width=1024,
                                             n_parts=2, seed=3)
    lnl_d0 = dense.evaluate(tree_d.start, full_traversal_=True)
    lnl_c0 = comp.evaluate(tree_c.start, full_traversal_=True)
    for tree in (tree_d, tree_c):
        b = tree.nodep[3]
        tree.hookup(b, b.back, [0.5] * tree.num_branches)
    lnl_d1 = dense.evaluate(tree_d.start, full_traversal_=True)
    lnl_c1 = comp.evaluate(tree_c.start, full_traversal_=True)
    assert abs(lnl_d1 - lnl_d0) > 0.1          # the change is visible
    assert lnl_c1 == pytest.approx(lnl_d1, abs=0.05)
    assert (lnl_c1 - lnl_c0) == pytest.approx(lnl_d1 - lnl_d0, abs=0.05)


def test_compact_guards():
    aln, dense, tree_d, comp, tree_c = _pair(n_taxa=32, part_width=1024,
                                             n_parts=2, seed=3)
    with pytest.raises(RuntimeError, match='compaction'):
        comp.tree_evaluate(1.0)
    with pytest.raises(RuntimeError, match='compaction'):
        comp.evaluate(tree_c.start)        # partial traversal
    with pytest.raises(ValueError, match='compaction'):
        LikelihoodEngine(aln, tree_c, use_pallas=False, compact=True)


def test_compact_tree_evaluation_mode():
    """-f e with -S: model optimization at fixed branch lengths through
    the full run_tree_evaluation driver (the CLI surface of the
    compaction mode). Must improve on the initial likelihood and stay
    finite; branch smoothing is skipped by design."""
    from examl_tpu.run import run_tree_evaluation
    aln = _gappy_alignment(n_taxa=32, part_width=1024, n_parts=2, seed=3)
    nwk = _caterpillar(aln.taxon_names)
    # initial lnL at alpha=1.0 fixed branch lengths
    tree0 = Tree(aln.taxon_names)
    parse_newick(nwk, tree0)
    eng0 = LikelihoodEngine(aln, tree0, dtype=jnp.float32,
                            use_pallas=True, pad=128, compact=True)
    lnl0 = eng0.evaluate(tree0.start, full_traversal_=True)
    res = run_tree_evaluation(aln, nwk, dtype=jnp.float32,
                              use_pallas=True, pad=128, compact=True)
    assert np.isfinite(res.likelihood)
    assert res.likelihood >= lnl0 - 1e-6


def test_compact_row_accounting():
    from examl_tpu.compact import CompactPlan
    aln = _gappy_alignment(n_taxa=64, part_width=1024, n_parts=4)
    plan = CompactPlan(aln)
    for m in range(4):
        n = len(plan.tips[m])
        assert 2 <= n <= 64
        assert plan.n_rows[m] <= 2 * n + 9
    assert plan.saving(64) > 2.5
