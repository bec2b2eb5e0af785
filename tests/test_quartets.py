"""Quartet mode parity: the first 4-taxon sets' three topologies must match
the reference ExaML_quartets output (computed with default model params on
the starting tree's model state)."""
import itertools
import pathlib

import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.quartets import quartet_likelihood
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'

GOLDEN = [
    (1, 2, 3, 4, -2990.736965),
    (1, 3, 2, 4, -2991.248807),
    (1, 4, 2, 3, -2985.780743),
    (1, 2, 3, 5, -3146.250890),
    (1, 3, 2, 5, -3146.407667),
    (1, 5, 2, 3, -3140.368932),
]


@pytest.mark.slow
def test_quartet_likelihoods():
    from examl_tpu.optimize.model_opt import ModelOptimizer
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    # quartet mode optimizes the model on the comprehensive starting tree
    # first (quartets.c computeQuartets :407-415)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    ModelOptimizer(eng).mod_opt(0.1)
    n = tree.mxtips
    q1 = tree.nodep[n + 1]
    q2 = tree.nodep[n + 2]
    for a, b, c, d, golden in GOLDEN:
        lnl = quartet_likelihood(eng, tree.nodep[a], tree.nodep[b],
                                 tree.nodep[c], tree.nodep[d], q1, q2)
        assert lnl == pytest.approx(golden, abs=2e-4), (a, b, c, d)


@pytest.mark.slow
def test_quartet_wave_matches_sequential():
    """The batched device quartet program (engine.quartet_wave: the whole
    nniSmooth + evaluate per topology as wave lanes, one dispatch) against
    the sequential host walk on the same Pallas engine."""
    import jax
    import numpy as np
    from examl_tpu.search.quartets import compute_quartets

    def run(use_wave):
        aln = read_bytefile(str(DATA / '49.binary'))
        tree = Tree(aln.taxon_names)
        parse_newick((REF / '49.tree').read_text(), tree)
        eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                               use_pallas=True, pad=128)
        eng.evaluate(tree.start, full_traversal_=True)
        eng.tree_evaluate(1.0)
        res = compute_quartets(eng, n_random=8, seed=42,
                               use_wave=use_wave)
        return res, eng.op_stats.get('quartet_wave', 0)

    a, wa = run(True)
    b, wb = run(False)
    assert wa >= 1 and wb == 0
    assert [r[:4] for r in a] == [r[:4] for r in b]
    la = np.array([r[4] for r in a])
    lb = np.array([r[4] for r in b])
    # identical kernels, freshly recomputed views vs x-cached views:
    # equal to f32 rounding
    np.testing.assert_allclose(la, lb, atol=0.02)
