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


def _random_tree(n, seed):
    rng = np.random.default_rng(seed)
    tr = Tree([f't{i}' for i in range(n)])
    inner = tr.nodep[n + 1]
    tr.hookup_default(inner, tr.nodep[1])
    tr.hookup_default(inner.next, tr.nodep[2])
    tr.hookup_default(inner.next.next, tr.nodep[3])
    edges = [inner, inner.next, inner.next.next]
    for t in range(4, n + 1):
        target = edges[rng.integers(len(edges))]
        ring = tr.nodep[n + t - 2]
        back = target.back
        z = list(target.z)
        tr.hookup(ring.next, target, z)
        tr.hookup(ring.next.next, back, z)
        tr.hookup_default(ring, tr.nodep[t])
        edges += [ring, ring.next, ring.next.next]
    tr.start = tr.nodep[1]
    tr.ntips = n
    return tr


def test_product_path_uses_native_large_tree():
    """The BestList canonical key and the RF sets go through the native
    kernel (when built) and agree with the pure-Python fallback on a
    500-taxon random tree (the 10^4-taxon scaling story's correctness
    gate)."""
    import examl_tpu.native as N
    from examl_tpu.engine import LikelihoodEngine   # noqa: F401
    from examl_tpu.search.spr import SprSearch

    assert N.get_lib() is not None
    a = _random_tree(500, 0)
    b = _random_tree(500, 1)
    a2 = _random_tree(500, 0)       # same construction = same topology

    # canonical keys: native path active and consistent
    ka, kb, ka2 = canonical_key(a), canonical_key(b), canonical_key(a2)
    assert isinstance(ka, tuple) and len(ka) == 2   # 128-bit native hash
    assert ka == ka2
    assert ka != kb

    # RF sets: native vs forced-Python fallback give the same RF distance
    class _S:                      # minimal shim exposing _bipartitions
        def __init__(self, tr):
            self.tr = tr
    bip = SprSearch._bipartitions

    na, nb = bip(_S(a)), bip(_S(b))
    lib = N._LIB
    try:
        N._LIB = None
        N._LIB_TRIED = True
        pa, pb = bip(_S(a)), bip(_S(b))
    finally:
        N._LIB = lib
        N._LIB_TRIED = True
    assert len(na) == len(pa) == 497               # n - 3 non-trivial bips
    assert (len(na.symmetric_difference(nb))
            == len(pa.symmetric_difference(pb)))


def test_native_sort_columns_matches_lexsort():
    """The parser's native memcmp column sort must reproduce numpy's
    stable lexsort of the same keys exactly (incl. duplicate columns,
    whose stable order feeds sitecombcrunch weight counting)."""
    import numpy as np
    from examl_tpu import native
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 5, (4000, 51)).astype(np.uint8)
    keys[::7] = keys[3]                 # many duplicates
    order = native.sort_columns(keys)
    if order is None:
        import pytest
        pytest.skip('native library unavailable')
    ref = np.lexsort(tuple(keys[:, c]
                           for c in range(keys.shape[1] - 1, -1, -1)))
    np.testing.assert_array_equal(order, ref)
