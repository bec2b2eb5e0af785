"""Member-axis sharding of stacked groups (the Kassian whole-partition
assignment, reference partitionAssignment.c:156-390 / axml.h:906-927):
on a mesh, a group of many partitions narrower than the per-device lane
unit stores whole partitions per device instead of padding every gene to
n_dev lane units. Results must be identical to the single-device engine."""
import pathlib

import numpy as np
import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.newick import parse_newick
from examl_tpu.io.phylip import parse_phylip
from examl_tpu.tree import Tree

DATA = pathlib.Path(__file__).resolve().parent / 'data'


@pytest.fixture(scope='module')
def narrow_genes(tmp_path_factory):
    """12 narrow DNA genes (~40 sites each), 8 taxa — the many-small-
    partitions shape that uniform site sharding handles badly."""
    rng = np.random.default_rng(5)
    tmp = tmp_path_factory.mktemp('narrow')
    n_taxa, n_genes, gene_w = 8, 12, 40
    n_sites = n_genes * gene_w
    bases = np.array(list('ACGT'))
    with open(tmp / 'a.phy', 'w') as f:
        f.write(f' {n_taxa} {n_sites}\n')
        for t in range(n_taxa):
            f.write(f'T{t} ' + ''.join(
                bases[rng.integers(0, 4, n_sites)]) + '\n')
    with open(tmp / 'a.model', 'w') as f:
        for i in range(n_genes):
            f.write(f'DNA, g{i} = {i * gene_w + 1}-{(i + 1) * gene_w}\n')
    aln = parse_phylip(str(tmp / 'a.phy'), str(tmp / 'a.model'), 'DNA')
    nwk = '(T0,(T1,(T2,(T3,(T4,(T5,(T6,T7)))))));'
    return aln, nwk


def _engine(aln, nwk, mesh=None):
    import jax
    tree = Tree(aln.taxon_names)
    parse_newick(nwk, tree)
    return LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                            use_pallas=True, pad=128, stack=True,
                            sharding=mesh)


def test_member_sharding_chosen_and_matches(narrow_genes):
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices')
    aln, nwk = narrow_genes
    mesh = Mesh(np.array(devices[:8]), ('sites',))

    eng1 = _engine(aln, nwk)
    lnl1 = eng1.evaluate(eng1.tree.start, full_traversal_=True)
    assert not any(eng1.g_member_sharded)        # no mesh: site layout

    eng8 = _engine(aln, nwk, mesh=mesh)
    assert any(eng8.g_member_sharded), 'Kassian layout not chosen'
    g = eng8.g_member_sharded.index(True)
    ms = eng8.groups[g]
    # membership padded to a device multiple with duplicate slots
    assert len(ms) % 8 == 0 and len(ms) >= eng8.g_n_real[g]
    # per-member width stays one lane unit, not unit * n_dev
    assert eng8.g_width[g] == 128
    assert eng1.g_width[0] == 128            # single-device baseline
    lnl8 = eng8.evaluate(eng8.tree.start, full_traversal_=True)
    assert lnl8 == pytest.approx(lnl1, abs=1e-3)
    np.testing.assert_allclose(eng8.per_partition_lh, eng1.per_partition_lh,
                               atol=1e-3)

    # memory: member sharding must beat uniform site sharding's padding
    est8 = eng8.memory_estimate()
    # a site-sharded engine pads every gene to 128 * 8 = 1024 lanes
    import examl_tpu.engine as engine_mod
    plan = eng8._plan_groups()
    assert est8['clv'] < 0.3 * (12 * eng8.rows * 16 * 1024
                                * eng8.clv_dtype.itemsize)


def test_member_sharding_smooth_and_nr(narrow_genes):
    """tree_evaluate (device smoothing + NR) and a batched evaluate run
    the member-sharded kernels end to end with single-device parity."""
    import jax
    from jax.sharding import Mesh
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices')
    aln, nwk = narrow_genes
    mesh = Mesh(np.array(devices[:8]), ('sites',))

    eng1 = _engine(aln, nwk)
    eng1.evaluate(eng1.tree.start, full_traversal_=True)
    lnl1 = eng1.tree_evaluate(1.0)

    eng8 = _engine(aln, nwk, mesh=mesh)
    eng8.evaluate(eng8.tree.start, full_traversal_=True)
    lnl8 = eng8.tree_evaluate(1.0)
    assert lnl8 == pytest.approx(lnl1, abs=5e-3)
