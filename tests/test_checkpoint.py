"""Checkpoint round-trip: write after branch-length optimization, reload
into a fresh engine, verify identical likelihood and parameters."""
import pathlib

import numpy as np
import pytest

from examl_tpu.checkpoint import Checkpointer, SearchState
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def test_checkpoint_roundtrip(tmp_path):
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    eng.partitions[0].alpha = 0.31
    eng.update_gamma([0])
    lnl = eng.evaluate(tree.start, full_traversal_=True)

    ck = Checkpointer('t', workdir=str(tmp_path))
    state = SearchState(likelihood=lnl, fast_iterations=3)
    path = ck.write(eng, state)

    aln2 = read_bytefile(str(DATA / '49.binary'))
    tree2 = Tree(aln2.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree2)
    eng2 = LikelihoodEngine(aln2, tree2)
    state2, _extras = Checkpointer.read(path, eng2)

    assert state2.fast_iterations == 3
    assert eng2.partitions[0].alpha == pytest.approx(0.31)
    lnl2 = eng2.evaluate(tree2.start, full_traversal_=True)
    assert lnl2 == pytest.approx(lnl, abs=1e-9)
    assert Checkpointer.latest('t', str(tmp_path)) == path


@pytest.mark.slow
def test_search_resume(tmp_path):
    """Interrupt a search mid-way and resume from the latest checkpoint;
    the resumed search must reach the golden likelihood."""
    from examl_tpu.run import run_search

    aln = read_bytefile(str(DATA / '49.binary'))
    nwk = (REF / '49.tree').read_text()

    class Stop(Exception):
        pass

    calls = {'n': 0}
    orig = None

    # run with checkpointing, aborting after a few checkpoints
    import examl_tpu.search.spr as spr_mod
    orig_write = spr_mod.SprSearch._write_checkpoint

    def limited(self, phase, **vars_):
        orig_write(self, phase, **vars_)
        calls['n'] += 1
        if calls['n'] >= 2:
            raise Stop

    spr_mod.SprSearch._write_checkpoint = limited
    try:
        with pytest.raises(Stop):
            run_search(aln, nwk, checkpoint_run_id='resume49',
                       checkpoint_workdir=str(tmp_path))
    finally:
        spr_mod.SprSearch._write_checkpoint = orig_write

    res = run_search(aln, nwk, checkpoint_run_id='resume49',
                     checkpoint_workdir=str(tmp_path),
                     resume_from_checkpoint=True)
    assert res.likelihood >= -16194.105


@pytest.mark.slow
def test_constraint_search_respects_groups():
    """-g: the search must keep every constraint group monophyletic."""
    from examl_tpu.run import run_search

    aln = read_bytefile(str(DATA / 'bin12.binary'))
    res = run_search(
        aln, (DATA / 'bin12.tree').read_text(),
        constraint_newick='((b0,b1,b2,b3),(b4,b5,b6,b7),(b8,b9,b10,b11));',
        random_seed=7)

    tr = Tree(aln.taxon_names)
    parse_newick(res.tree_newick, tr, read_branches=True)
    bips = set()

    def rec(p):
        if tr.is_tip(p.number):
            return frozenset((p.number,))
        b = rec(p.next.back) | rec(p.next.next.back)
        bips.add(b)
        return b

    rec(tr.nodep[1].back)
    full = frozenset(range(1, 13))
    for g in (frozenset(range(1, 5)), frozenset(range(5, 9)),
              frozenset(range(9, 13))):
        assert g in bips or (full - g) in bips
