"""The HBM-resident fused traversal (traversal_fused_hbm): bit-equal to
the VMEM-resident kernel, including chained ops (an op reading a row a
previous op of the same wave just wrote), and engaged automatically by
the engine beyond the resident kernel's row ceiling."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import examl_tpu.kernels.pallas_newview as PK


def _case(rng, rows=24, K=16, W=256, L=8, chain=False):
    clv = jnp.asarray(rng.uniform(0.1, 1.0, (rows, K, W)), jnp.float32)
    sc = jnp.asarray(rng.integers(0, 3, (rows, 1, W)), jnp.int32)
    p = np.asarray(rng.permutation(np.arange(12, 12 + L)), np.int32)
    q = np.asarray(rng.integers(1, 12, L), np.int32)
    r = np.asarray(rng.integers(1, 12, L), np.int32)
    if chain:
        # later ops read earlier ops' outputs (dependency chain)
        for i in range(2, L):
            q[i] = p[i - 1]
            r[i] = p[i - 2]
    tt = np.asarray(rng.integers(0, 2, L), np.int32)
    args = (clv, sc, jnp.asarray(p), jnp.asarray(q), jnp.asarray(r),
            jnp.asarray(tt),
            jnp.asarray(rng.uniform(-0.5, -0.01, L), jnp.float32),
            jnp.asarray(rng.uniform(-0.5, -0.01, L), jnp.float32),
            jnp.asarray(rng.uniform(-3.0, -0.1, (1, K)), jnp.float32),
            jnp.asarray(rng.uniform(-0.5, 0.5, (K, K)), jnp.float32),
            jnp.asarray(rng.uniform(-0.5, 0.5, (K, K)), jnp.float32))
    return args, L, rows


@pytest.mark.parametrize('chain', [False, True])
def test_hbm_matches_resident(chain):
    rng = np.random.default_rng(3 if chain else 0)
    args, L, rows = _case(rng, chain=chain)
    kw = dict(n_exec=L, block_w=128, min_scale=2.0 ** -30,
              inv_min_scale=2.0 ** 30, interpret=True)
    a1, s1 = PK.traversal_fused_pallas(*args, n_rows=rows, **kw)
    a2, s2 = PK.traversal_fused_hbm(*args, **kw)
    assert bool(jnp.all(a1 == a2))
    assert bool(jnp.all(s1 == s2))


def test_engine_big_tree_uses_hbm_plan():
    """Beyond ~350 taxa the resident plan cannot fit; the engine must
    pick the HBM variant (negative plan entry) — and the Pallas engine's
    lnL must match the jnp reference engine."""
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.io.bytefile import Alignment, PartitionMeta
    from examl_tpu.io.newick import parse_newick
    from examl_tpu.tree import Tree
    from examl_tpu.datatypes import DataType, ProtModel
    from examl_tpu.traversal import full_traversal, pack_traversal

    rng = np.random.default_rng(1)
    n_taxa, W = 400, 256
    names = [f'T{i}' for i in range(n_taxa)]
    codes = np.asarray([1, 2, 4, 8], np.uint8)[
        rng.integers(0, 4, (n_taxa, W))]
    aln = Alignment(
        n_taxa=n_taxa, n_patterns=W, gappyness=0.0,
        weights=np.ones(W, np.int64), taxon_names=names,
        partitions=[PartitionMeta(
            name='p0', states=4, max_tip_states=16, lower=0, upper=W,
            data_type=DataType.DNA, prot_model=ProtModel.NONE,
            prot_freqs=False, non_gtr=False,
            optimize_base_frequencies=False,
            frequencies=np.full(4, 0.25))],
        codes=codes)

    subtrees = [f'T{t}:0.05' for t in range(n_taxa)]
    rng.shuffle(subtrees)
    while len(subtrees) > 3:
        a = subtrees.pop(int(rng.integers(0, len(subtrees))))
        b = subtrees.pop(int(rng.integers(0, len(subtrees))))
        subtrees.append(f'({a},{b}):0.05')
    nwk = f'({subtrees[0]},{subtrees[1]},{subtrees[2]});'

    tree = Tree(names)
    parse_newick(nwk, tree)
    eng = LikelihoodEngine(aln, tree, dtype=jnp.float32, use_pallas=True,
                           pad=128)
    entries = full_traversal(tree, tree.start.back)
    packed = pack_traversal(tree, entries,
                            slots=eng._fused_slots(len(entries)))
    plan = eng._fused_plan(packed)
    assert plan is not None and plan[1][0] < 0, \
        'big tree must select the HBM-resident fused variant'
    lnl = eng.evaluate(tree.start, full_traversal_=True)

    tree2 = Tree(names)
    parse_newick(nwk, tree2)
    eng2 = LikelihoodEngine(aln, tree2, dtype=jnp.float32,
                            use_pallas=False)
    lnl2 = eng2.evaluate(tree2.start, full_traversal_=True)
    assert lnl == pytest.approx(lnl2, rel=2e-6)
