"""Parity gates for the remaining model families vs the reference binary:
PSR rate heterogeneity, LG4M/LG4X, per-partition branch lengths (-M)."""
import pathlib

import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.optimize.model_opt import ModelOptimizer
from examl_tpu.run import run_tree_evaluation
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def _engine(bytefile, treefile, **kw):
    aln = read_bytefile(str(bytefile))
    nb = kw.get('num_branches', 1)
    tree = Tree(aln.taxon_names, num_branches=nb)
    parse_newick(pathlib.Path(treefile).read_text(), tree)
    return LikelihoodEngine(aln, tree, **kw)


def test_psr_initial_lnl():
    eng = _engine(DATA / '49.binary', REF / '49.tree', rate_het='PSR')
    lnl = eng.evaluate(eng.tree.start, full_traversal_=True)
    assert lnl == pytest.approx(-23829.960665840299, abs=1e-6)


@pytest.mark.slow
def test_psr_mod_opt():
    eng = _engine(DATA / '49.binary', REF / '49.tree', rate_het='PSR')
    eng.evaluate(eng.tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    ModelOptimizer(eng).mod_opt(0.1)
    assert eng.likelihood == pytest.approx(-14702.970620, abs=2e-3)


def test_lg4x_initial_lnl():
    eng = _engine(DATA / 'aa20x.binary', DATA / 'aa20.tree')
    lnl = eng.evaluate(eng.tree.start, full_traversal_=True)
    assert lnl == pytest.approx(-5704.322211650853, abs=1e-5)


def test_lg4m_initial_lnl():
    eng = _engine(DATA / 'aa20m.binary', DATA / 'aa20.tree')
    lnl = eng.evaluate(eng.tree.start, full_traversal_=True)
    assert lnl == pytest.approx(-5696.727866106593, abs=1e-5)


@pytest.mark.slow
def test_lg4x_mod_opt():
    aln = read_bytefile(str(DATA / 'aa20x.binary'))
    res = run_tree_evaluation(aln, (DATA / 'aa20.tree').read_text())
    assert res.likelihood == pytest.approx(-5029.756635, abs=2e-3)


@pytest.mark.slow
def test_lg4m_mod_opt():
    aln = read_bytefile(str(DATA / 'aa20m.binary'))
    res = run_tree_evaluation(aln, (DATA / 'aa20.tree').read_text())
    assert res.likelihood == pytest.approx(-5063.295855, abs=2e-3)


@pytest.mark.slow
def test_per_partition_branch_lengths():
    aln = read_bytefile(str(DATA / '49.binary'))
    res = run_tree_evaluation(aln, (REF / '49.tree').read_text(),
                              num_branches=len(aln.partitions))
    assert res.likelihood == pytest.approx(-16035.202133, abs=5e-3)


def test_binary_data_initial_lnl():
    eng = _engine(DATA / 'bin12.binary', DATA / 'bin12.tree')
    lnl = eng.evaluate(eng.tree.start, full_traversal_=True)
    assert lnl == pytest.approx(-1048.751089406380, abs=1e-6)


@pytest.mark.slow
def test_binary_data_mod_opt():
    aln = read_bytefile(str(DATA / 'bin12.binary'))
    res = run_tree_evaluation(aln, (DATA / 'bin12.tree').read_text())
    assert res.likelihood == pytest.approx(-890.753413, abs=2e-3)


def test_multistate_generic32():
    """GENERIC_32 (MULTI) runs end to end (the reference parser accepts
    MULTI but its engine asserts on 32-state evaluation, so there is no
    reference golden; we check internal consistency instead)."""
    from examl_tpu.io.phylip import parse_phylip
    aln = parse_phylip(str(DATA / 'multi8.phy'), str(DATA / 'multi8.model'))
    assert aln.partitions[0].states == 32
    tree = Tree(aln.taxon_names)
    parse_newick((DATA / 'multi8.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    lnl0 = eng.evaluate(eng.tree.start, full_traversal_=True)
    assert lnl0 < 0 and lnl0 > -1e8
    lnl1 = eng.tree_evaluate(1.0)
    assert lnl1 > lnl0


@pytest.mark.veryslow
def test_aa140_auto_protein_full():
    """Full -f e on testData/140 (WAG + 2x AUTO): ~1.5 h on CPU.
    Reference: lnL -121288.814123, AUTO selects LG/empirical for p1 and
    LG/fixed for p2, alphas 0.887369/0.845018/0.690469."""
    aln = read_bytefile(str(DATA / '140.binary'))
    res = run_tree_evaluation(
        aln, pathlib.Path('/root/reference/testData/140.tree').read_text())
    assert res.likelihood == pytest.approx(-121288.814123, abs=5e-3)
    pms = res.engine.partitions
    assert pms[1].auto_prot_model.name == 'LG' and not pms[1].prot_freqs
    assert pms[2].auto_prot_model.name == 'LG' and pms[2].prot_freqs
