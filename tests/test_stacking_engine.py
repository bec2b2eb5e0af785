"""Engine-level partition-stacking gate (docs/STACKING.md): the stacked
engine (one kernel launch per geometry group) must reproduce the
unstacked engine (one launch per partition) exactly — group padding
columns carry wgt = 0 and contribute exact zeros to every reduction, and
the per-slice kernel math is bit-identical (tests/test_stacked_kernels)."""
import pathlib

import numpy as np
import pytest

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def _engine(stack, pad=512, **kw):
    # pad=512 equalizes the four partitions' padded widths: with no
    # group-width padding the stacked engine is BIT-exact vs the
    # unstacked one. At the default pad the group pads short members
    # with wgt=0 columns, which changes f32 reduction associativity by
    # ULPs (see test_stacked_default_pad_tolerance).
    import jax
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names, num_branches=kw.get('num_branches', 1))
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                           use_pallas=True, stack=stack, pad=pad, **kw)
    return eng, tree


@pytest.mark.slow
def test_stacked_default_pad_tolerance():
    """At the default padding, group-width wgt=0 columns may shift f32
    reductions by ULPs; results stay within f32 noise."""
    eng0, tr0 = _engine(False, pad=8)
    eng1, tr1 = _engine(True, pad=8)
    assert eng0.widths != [eng1.g_width[0]] * 4      # widths DO differ
    assert eng0.evaluate(tr0.start, full_traversal_=True) == \
        eng1.evaluate(tr1.start, full_traversal_=True)
    s0 = eng0.tree_evaluate(1.0)
    s1 = eng1.tree_evaluate(1.0)
    assert s1 == pytest.approx(s0, abs=5e-3)


@pytest.mark.slow
def test_stacked_engine_matches_unstacked():
    eng0, tr0 = _engine(False)
    eng1, tr1 = _engine(True)
    assert eng0.n_groups == eng0.n_models
    assert eng1.n_groups == 1 and len(eng1.groups[0]) == 4

    lnl0 = eng0.evaluate(tr0.start, full_traversal_=True)
    lnl1 = eng1.evaluate(tr1.start, full_traversal_=True)
    assert lnl0 == lnl1
    np.testing.assert_array_equal(eng0.per_partition_lh,
                                  eng1.per_partition_lh)

    # fused smooth + treeEvaluate program (junction/NR/evaluate helpers)
    s0 = eng0.tree_evaluate(1.0)
    s1 = eng1.tree_evaluate(1.0)
    assert s0 == s1

    # one full SPR wave per engine: lazy scoring + thorough insertions
    r0 = []
    for eng, tr, acc in ((eng0, tr0, r0), (eng1, tr1, [])):
        search = SprSearch(eng)
        search.start_lh = search.end_lh = eng.likelihood
        search.best_of_node = -1e30
        assert search.rearrange_big(tr.nodep[tr.mxtips + 5], 1, 5)
        acc.append(search.best_of_node)
        if eng is eng1:
            assert r0[0] == search.best_of_node

    # batched quartet wave: the two jitted programs differ structurally,
    # so XLA fuses the tiny P-matrix/diagonal computations differently —
    # ULP-level only (the eager stacked-vs-singleton pipeline is
    # bit-exact; verified while landing the stacking change)
    q0 = eng0.quartet_wave([(1, 2, 3, 4), (1, 3, 2, 4), (1, 4, 2, 3)])
    q1 = eng1.quartet_wave([(1, 2, 3, 4), (1, 3, 2, 4), (1, 4, 2, 3)])
    np.testing.assert_allclose(q0, q1, rtol=0, atol=1e-3)


@pytest.mark.slow
def test_stacked_engine_per_partition_branches():
    """-M (per-partition branch lengths): the stacked path gathers each
    member's branch column into the [L, P] descriptor."""
    eng0, tr0 = _engine(False, num_branches=4)
    eng1, tr1 = _engine(True, num_branches=4)
    lnl0 = eng0.evaluate(tr0.start, full_traversal_=True)
    lnl1 = eng1.evaluate(tr1.start, full_traversal_=True)
    assert lnl0 == lnl1

    # branch optimization with the per-partition NR machine (B = 4)
    p0 = tr0.start
    z0 = eng0.makenewz(p0, p0.back, list(p0.back.z), 16)
    p1 = tr1.start
    z1 = eng1.makenewz(p1, p1.back, list(p1.back.z), 16)
    np.testing.assert_array_equal(z0, z1)


@pytest.mark.slow
def test_stacked_device_modopt():
    """On-device brak/brent parameter optimization through the stacked
    evaluate/tip helpers."""
    from examl_tpu.optimize.device_opt import ALPHA_F, DeviceParamOptimizer
    outs = []
    for stack in (False, True):
        eng, tr = _engine(stack)
        eng.evaluate(tr.start, full_traversal_=True)
        opt = DeviceParamOptimizer(eng)
        lane_of = list(range(eng.n_models))
        assert opt.supported(ALPHA_F, lane_of)
        xmin, end, start = opt.optimize(
            ALPHA_F, 0, lane_of, eng.n_models,
            [eng.partitions[m].alpha for m in range(eng.n_models)],
            np.full(eng.n_models, 0.02), np.full(eng.n_models, 1000.0),
            np.full(eng.n_models, 0.1))
        outs.append((xmin, end, start))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


@pytest.mark.slow
def test_stacked_mixed_geometry():
    """DNA x2 (one stacked group) + AA (singleton group) in one engine:
    grouping must key on geometry and the per-partition outputs must
    reassemble in model order."""
    import jax
    from examl_tpu.datatypes import DataType
    from examl_tpu.io.phylip import PartitionSpec, build_alignment

    rng = np.random.default_rng(11)
    n_taxa = 12
    dna = rng.choice(list('ACGT'), size=(n_taxa, 160))
    aa = rng.choice(list('ARNDCQEGHILKMFPSTWYV'), size=(n_taxa, 40))
    mat = np.concatenate([dna, aa], axis=1)
    seqs = [''.join(row) for row in mat]
    names = [f't{i}' for i in range(n_taxa)]
    specs = [
        PartitionSpec('d1', DataType.DNA, 0, False, False, [(0, 96, 1)]),
        PartitionSpec('d2', DataType.DNA, 0, False, False, [(96, 160, 1)]),
        PartitionSpec('aa', DataType.AA, 0, True, False, [(160, 200, 1)]),
    ]
    from examl_tpu.datatypes import ProtModel
    specs[2].prot_model = ProtModel.WAG
    aln = build_alignment(names, seqs, specs)

    nwk = ''
    inner = f'({names[0]},{names[1]})'
    for nm in names[2:-1]:
        inner = f'({inner},{nm})'
    nwk = f'({inner},{names[-1]});'

    engines = []
    for stack in (False, True):
        tree = Tree(aln.taxon_names)
        parse_newick(nwk, tree)
        eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                               use_pallas=True, stack=stack, pad=128)
        engines.append((eng, tree))
    e0, t0 = engines[0]
    e1, t1 = engines[1]
    assert e0.n_groups == 3
    assert e1.n_groups == 2
    sizes = sorted(len(ms) for ms in e1.groups)
    assert sizes == [1, 2]

    lnl0 = e0.evaluate(t0.start, full_traversal_=True)
    lnl1 = e1.evaluate(t1.start, full_traversal_=True)
    # DNA members share a padded width (96->128, 64->128): strict equality
    np.testing.assert_array_equal(e0.per_partition_lh, e1.per_partition_lh)
    assert lnl0 == lnl1
    s0 = e0.tree_evaluate(1.0)
    s1 = e1.tree_evaluate(1.0)
    assert s0 == s1


@pytest.mark.slow
def test_stacked_level_fallback_masked(monkeypatch):
    """VMEM-overflow fallback (level kernels) with a partial
    execute-mask: masked members keep stale CLVs in-kernel."""
    eng0, tr0 = _engine(False)
    eng1, tr1 = _engine(True)
    for eng in (eng0, eng1):
        monkeypatch.setattr(type(eng), '_fused_plan',
                            lambda self, packed: None)
    lnls = []
    for eng, tr in ((eng0, tr0), (eng1, tr1)):
        eng.evaluate(tr.start, full_traversal_=True)
        # stale partition 1: change its alpha without refreshing CLVs,
        # then evaluate under the execute mask (evaluateChange semantics)
        eng.execute_model[:] = [True, False, True, True]
        base = tr.nodep[tr.mxtips + 4]
        eng.evaluate(base)
        lnls.append(eng.per_partition_lh.copy())
        eng.execute_model[:] = True
    np.testing.assert_array_equal(lnls[0], lnls[1])


@pytest.mark.slow
def test_stacked_psr_matches_unstacked():
    """PSR (per-site rate) stacking: level updates, root/batched
    evaluate, NR derivatives and the per-site rate-scan kernel all run
    one launch per geometry group."""
    import jax
    engines = []
    for stack in (False, True):
        aln = read_bytefile(str(DATA / '49.binary'))
        tree = Tree(aln.taxon_names)
        parse_newick((REF / '49.tree').read_text(), tree)
        eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                               use_pallas=True, stack=stack, pad=512,
                               rate_het='PSR')
        engines.append((eng, tree))
    e0, t0 = engines[0]
    e1, t1 = engines[1]
    assert e1.n_groups == 1 and len(e1.groups[0]) == 4

    lnl0 = e0.evaluate(t0.start, full_traversal_=True)
    lnl1 = e1.evaluate(t1.start, full_traversal_=True)
    assert lnl0 == lnl1
    np.testing.assert_array_equal(e0.per_partition_lh,
                                  e1.per_partition_lh)

    # non-uniform per-site rates through set_psr_state (same categories
    # for both engines)
    rng = np.random.default_rng(5)
    cats_m = [rng.integers(0, 3, e0.widths[m]).astype(np.int32)
              for m in range(e0.n_models)]
    for eng in (e0, e1):
        for m in range(eng.n_models):
            eng.set_psr_state(m, num_categories=3,
                              per_site_rates=np.array([0.5, 1.0, 2.0]),
                              rate_category=cats_m[m])
    lnl0 = e0.evaluate(t0.start, full_traversal_=True)
    lnl1 = e1.evaluate(t1.start, full_traversal_=True)
    assert lnl0 == lnl1

    # NR branch optimization (device while_loop + PSR derivatives)
    z0 = e0.makenewz(t0.start, t0.start.back, list(t0.start.back.z), 16)
    z1 = e1.makenewz(t1.start, t1.start.back, list(t1.start.back.z), 16)
    np.testing.assert_array_equal(z0, z1)

    # batched evaluate
    b0 = np.asarray(e0.evaluate_batch(
        [t0.start.number], [t0.start.back.number],
        np.array([[0.7]])))
    b1 = np.asarray(e1.evaluate_batch(
        [t1.start.number], [t1.start.back.number],
        np.array([[0.7]])))
    np.testing.assert_array_equal(b0, b1)

    # per-site rate-scan lnls (the PSR optimizer's inner kernel)
    props = [np.full(e0.widths[m], 1.3) for m in range(e0.n_models)]
    o0 = e0.psr_per_site_lnl(props)
    o1 = e1.psr_per_site_lnl(props)
    for a, b in zip(o0, o1):
        np.testing.assert_array_equal(np.asarray(a)[:len(b)], b)


@pytest.mark.slow
def test_stacked_aa_group_with_lg4x():
    """Two AA partitions (WAG + LG4X) form one 20-state stacked group:
    padded-state (24) block geometry, per-member eigensystems/rate
    weights (LG4X's four distinct systems) through the stacked kernels."""
    import jax
    from examl_tpu.datatypes import DataType, ProtModel
    from examl_tpu.io.phylip import PartitionSpec, build_alignment

    rng = np.random.default_rng(13)
    n_taxa = 10
    aa = rng.choice(list('ARNDCQEGHILKMFPSTWYV'), size=(n_taxa, 120))
    seqs = [''.join(row) for row in aa]
    names = [f't{i}' for i in range(n_taxa)]
    s1 = PartitionSpec('a1', DataType.AA, ProtModel.WAG, False, False,
                       [(0, 64, 1)])
    s2 = PartitionSpec('a2', DataType.AA, ProtModel.LG4X, False, False,
                       [(64, 120, 1)])
    aln = build_alignment(names, seqs, [s1, s2])

    inner = f'({names[0]},{names[1]})'
    for nm in names[2:-1]:
        inner = f'({inner},{nm})'
    nwk = f'({inner},{names[-1]});'

    engines = []
    for stack in (False, True):
        tree = Tree(aln.taxon_names)
        parse_newick(nwk, tree)
        eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                               use_pallas=True, stack=stack, pad=128)
        engines.append((eng, tree))
    e0, t0 = engines[0]
    e1, t1 = engines[1]
    assert e1.n_groups == 1 and len(e1.groups[0]) == 2

    lnl0 = e0.evaluate(t0.start, full_traversal_=True)
    lnl1 = e1.evaluate(t1.start, full_traversal_=True)
    np.testing.assert_array_equal(e0.per_partition_lh,
                                  e1.per_partition_lh)
    assert lnl0 == lnl1
    assert e0.tree_evaluate(1.0) == e1.tree_evaluate(1.0)
