"""Native treekernel: canonical hash invariance and RF agreement with the
Python bipartition implementation."""
import pathlib

import numpy as np
import pytest

from examl_tpu import native
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.topologies import canonical_key
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


@pytest.fixture(scope='module')
def trees():
    aln = read_bytefile(str(DATA / '49.binary'))
    t1 = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), t1)
    t2 = Tree(aln.taxon_names)
    parse_newick((DATA / '49_alt.tree').read_text(), t2)
    return t1, t2


def test_native_builds():
    assert native.get_lib() is not None


def test_canonical_hash_matches_python_equality(trees):
    t1, t2 = trees
    h1 = native.canonical_hash(t1)
    h2 = native.canonical_hash(t2)
    assert h1 is not None
    # same topology <=> same hash; different topologies differ
    same = canonical_key(t1) == canonical_key(t2)
    assert (h1 == h2) == same


def test_rf_distance_matches_python(trees):
    t1, t2 = trees

    def py_bips(tr):
        out = set()

        def rec(p):
            if tr.is_tip(p.number):
                return frozenset((p.number,))
            below = rec(p.next.back) | rec(p.next.next.back)
            out.add(below)
            return below

        rec(tr.nodep[1].back)
        full = frozenset(range(1, tr.mxtips + 1))
        out.discard(full)
        out.discard(full - frozenset((1,)))
        return out

    rf_py = len(py_bips(t1) ^ py_bips(t2))
    rf_c = native.rf_distance(t1, t2)
    assert rf_c == rf_py
    assert native.rf_distance(t1, t1) == 0
