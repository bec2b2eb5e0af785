"""Multi-device site sharding: the engine over an 8-device CPU mesh must
reproduce the single-device likelihood (psum over the mesh replaces the
reference's MPI_Allreduce)."""
import pathlib

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def test_sharded_engine_matches_single_device():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(np.array(devices[:8]), ('sites',))

    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree, sharding=mesh)
    lnl = eng.evaluate(tree.start, full_traversal_=True)
    assert lnl == pytest.approx(-19685.568213964532, abs=1e-5)

    lnl2 = eng.tree_evaluate(1.0)
    assert lnl2 == pytest.approx(-17992.172371005483, abs=2e-4)


def test_graft_dryrun():
    import __graft_entry__ as g
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    g.dryrun_multichip(8)
