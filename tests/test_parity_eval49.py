"""Parity gate 1: initial log likelihood on testData/49 vs. the reference
binary (GTR+GAMMA DNA, 4 partitions, starting tree with default branch
lengths z=0.9, default model parameters).

Golden values were produced by the instrumented reference build in
.refbuild (single rank, SSE3): see BASELINE.md.
"""
import pathlib

import numpy as np
import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
BYTEFILE = pathlib.Path(__file__).resolve().parent / 'data' / '49.binary'

GOLDEN_INITIAL_LNL = -19685.568213964532
GOLDEN_AFTER_TREE_EVAL1 = -17992.172371005483


@pytest.fixture(scope='module')
def engine():
    aln = read_bytefile(str(BYTEFILE))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    return LikelihoodEngine(aln, tree)


def test_initial_likelihood(engine):
    lnl = engine.evaluate(engine.tree.start, full_traversal_=True)
    assert lnl == pytest.approx(GOLDEN_INITIAL_LNL, abs=1e-5)


def test_tree_evaluate_branch_opt(engine):
    engine.evaluate(engine.tree.start, full_traversal_=True)
    lnl = engine.tree_evaluate(1.0)
    assert lnl == pytest.approx(GOLDEN_AFTER_TREE_EVAL1, abs=2e-4)
