"""Parity gate 4: full SPR ML search (-f d) on testData/49.

The reference binary finds lnL -16194.095475; our search must find a tree
at least as good, and RF-identical to the reference's result topology
(tests/data/49_ref_result.tree = the instrumented reference binary's
ExaML_result output on this dataset)."""
import pathlib

import pytest

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.run import run_search
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'

GOLDEN_SEARCH_LNL = -16194.095475


@pytest.mark.slow
def test_full_search_49():
    from examl_tpu.native import rf_distance
    aln = read_bytefile(str(DATA / '49.binary'))
    res = run_search(aln, (REF / '49.tree').read_text())
    assert res.likelihood >= GOLDEN_SEARCH_LNL - 0.01

    ref_tree = Tree(aln.taxon_names)
    parse_newick((DATA / '49_ref_result.tree').read_text(), ref_tree)
    rf = rf_distance(res.engine.tree, ref_tree)
    assert rf is not None, 'native treekernel failed to build'
    assert rf == 0
