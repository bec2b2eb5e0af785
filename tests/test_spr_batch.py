"""Batched lazy-SPR candidate scoring must reproduce the sequential
testInsertBIG walk exactly: same best insertions, same cutoff statistics,
same surviving topologies (reference semantics: searchAlgo.c:682-798; the
batched path scores whole candidate waves per dispatch and replays the
bookkeeping in traversal order)."""
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


def _one_cycle(batch_lazy):
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    search = SprSearch(eng, batch_lazy=batch_lazy)
    bt = BestList(20)
    lh = search.tree_optimize_rapid(1, 5, bt)
    return dict(
        lh=lh,
        end_lh=search.end_lh,
        lh_avg=search.lh_avg,
        lh_dec=search.lh_dec,
        ilist=sorted(search.ilist.likelihoods),
        bt=[e.likelihood for e in bt.entries],
        tree=write_newick(tree),
    )


@pytest.mark.slow
def test_batched_cycle_matches_sequential():
    a = _one_cycle(True)
    b = _one_cycle(False)
    assert a['lh_dec'] == b['lh_dec']
    assert a['lh'] == pytest.approx(b['lh'], abs=1e-8)
    assert a['end_lh'] == pytest.approx(b['end_lh'], abs=1e-8)
    assert a['lh_avg'] == pytest.approx(b['lh_avg'], abs=1e-6)
    np.testing.assert_allclose(a['ilist'], b['ilist'], atol=1e-7)
    np.testing.assert_allclose(a['bt'], b['bt'], atol=1e-7)
    assert a['tree'] == b['tree']
