"""Parity gate 3: full model-parameter optimization (-f e mode) on
testData/49 vs the reference binary: lnL and fitted parameters."""
import pathlib

import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.optimize.model_opt import ModelOptimizer
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
BYTEFILE = pathlib.Path(__file__).resolve().parent / 'data' / '49.binary'

GOLDEN_EVAL_LNL = -16205.671990      # ExaML_modelFile.eval49 / info file
GOLDEN_ALPHAS = [0.290232, 0.278424, 0.356406, 0.625613]
GOLDEN_RATES_GENE1 = [1.390112, 7.448504, 1.320053, 0.103497, 14.499727, 1.0]


@pytest.mark.slow
def test_mod_opt_tree_evaluation_mode():
    aln = read_bytefile(str(BYTEFILE))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    ModelOptimizer(eng).mod_opt(0.1)
    assert eng.likelihood == pytest.approx(GOLDEN_EVAL_LNL, abs=2e-3)
    for pm, alpha in zip(eng.partitions, GOLDEN_ALPHAS):
        assert pm.alpha == pytest.approx(alpha, abs=1e-4)
    for r, g in zip(eng.partitions[0].subst_rates, GOLDEN_RATES_GENE1):
        assert r == pytest.approx(g, rel=1e-3)
