"""Parity gate 4: full SPR ML search (-f d) on testData/49.

The reference binary finds lnL -16194.095475; our search must find a tree
at least as good. (Verified separately: the found topology is RF-identical
to the reference result tree.)"""
import pathlib

import pytest

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.run import run_search

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'

GOLDEN_SEARCH_LNL = -16194.095475


@pytest.mark.slow
def test_full_search_49():
    aln = read_bytefile(str(DATA / '49.binary'))
    res = run_search(aln, (REF / '49.tree').read_text())
    assert res.likelihood >= GOLDEN_SEARCH_LNL - 0.01
