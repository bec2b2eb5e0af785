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
