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


class _GeomTree:
    mxtips = 12
    num_branches = 1


def _grouped_case(rng, L=8):
    """A chained descriptor packed via pack_grouped (aligned independent
    blocks + interleaved scratch-row padding)."""
    from examl_tpu.traversal import TraversalEntry, pack_grouped
    args, _, rows = _case(rng, L=L, chain=True)
    clv, sc, p, q, r, tt, lzq, lzr, lam, ei, ev = args
    entries = [TraversalEntry(0 if int(tt[i]) else 2, int(p[i]),
                              int(q[i]), int(r[i]),
                              [float(np.exp(lzq[i]))],
                              [float(np.exp(lzr[i]))])
               for i in range(L)]
    pk = pack_grouped(_GeomTree(), entries, group=4,
                      pad_rows=[20, 21, 22, 23])
    glzq = jnp.asarray(np.log(np.maximum(pk.qz[:, 0], 1e-15)), jnp.float32)
    glzr = jnp.asarray(np.log(np.maximum(pk.rz[:, 0], 1e-15)), jnp.float32)
    return ((clv, sc, jnp.asarray(pk.p_idx), jnp.asarray(pk.q_idx),
             jnp.asarray(pk.r_idx), jnp.asarray(pk.tip_tip.astype(np.int32)),
             glzq, glzr, lam, ei, ev), pk)


def test_hbm_grouped_matches_sequential():
    """G concurrent child DMAs per independent block == the sequential
    op loop (padding slots write distinct pad_rows sinks)."""
    rng = np.random.default_rng(7)
    args, pk = _grouped_case(rng)
    kw = dict(n_exec=pk.n_exec, block_w=128,
              min_scale=2.0 ** -30, inv_min_scale=2.0 ** 30,
              interpret=True)
    a_ref, s_ref = PK.traversal_fused_hbm(*args, group=1, **kw)
    for G in (2, 4):
        a, s = PK.traversal_fused_hbm(*args, group=G, **kw)
        assert bool(jnp.all(a == a_ref)), G
        assert bool(jnp.all(s == s_ref)), G


def test_hbm_stacked_matches_flat():
    """The stacked HBM kernel == per-partition flat HBM runs, including
    execute-mask skipping and per-partition branch columns."""
    rng = np.random.default_rng(11)
    args, pk = _grouped_case(rng)
    clv, sc = args[0], args[1]
    rows, K, W = clv.shape
    L = pk.p_idx.shape[0]
    P = 3
    clvs = jnp.asarray(rng.uniform(0.1, 1.0, (P, rows, K, W)), jnp.float32)
    scs = jnp.asarray(rng.integers(0, 3, (P, rows, 1, W)), jnp.int32)
    lams = jnp.asarray(rng.uniform(-3.0, -0.1, (P, K)), jnp.float32)
    eis = jnp.asarray(rng.uniform(-0.5, 0.5, (P, K, K)), jnp.float32)
    evs = jnp.asarray(rng.uniform(-0.5, 0.5, (P, K, K)), jnp.float32)
    lzqP = jnp.asarray(rng.uniform(-0.5, -0.01, (L, P)), jnp.float32)
    lzrP = jnp.asarray(rng.uniform(-0.5, -0.01, (L, P)), jnp.float32)
    cols = jnp.arange(P, dtype=jnp.int32)   # partition p -> class column p
    ex = jnp.asarray([1, 0, 1], jnp.int32)
    kw = dict(n_exec=pk.n_exec, block_w=128,
              min_scale=2.0 ** -30, inv_min_scale=2.0 ** 30,
              interpret=True)
    a4, s4 = PK.traversal_fused_hbm_stacked(
        clvs, scs, args[2], args[3], args[4], args[5], lzqP, lzrP, cols,
        lams, eis, evs, ex, group=4, **kw)
    for p in range(P):
        if int(ex[p]) == 0:
            assert bool(jnp.all(a4[p] == clvs[p]))
            assert bool(jnp.all(s4[p] == scs[p]))
            continue
        a1, s1 = PK.traversal_fused_hbm(
            clvs[p], scs[p], args[2], args[3], args[4], args[5],
            lzqP[:, p], lzrP[:, p], lams[p][None], eis[p], evs[p],
            group=1, **kw)
        assert bool(jnp.all(a4[p] == a1)), p
        assert bool(jnp.all(s4[p] == s1)), p


def test_pack_grouped_slot_of():
    """slot_of must map each original entry to its permuted descriptor
    slot (sub_mask routing for the speculative SPR waves)."""
    from examl_tpu.traversal import TraversalEntry, pack_grouped
    rng = np.random.default_rng(2)
    L = 8
    p = rng.permutation(np.arange(12, 12 + L))
    q = rng.integers(1, 12, L)
    r = rng.integers(1, 12, L)
    for i in range(2, L):
        q[i] = p[i - 1]
    entries = [TraversalEntry(2, int(p[i]), int(q[i]), int(r[i]),
                              [0.5 + 0.01 * i], [0.6 + 0.01 * i])
               for i in range(L)]
    pk = pack_grouped(_GeomTree(), entries, group=4)
    assert pk.slot_of is not None and pk.slot_of.shape == (L,)
    for i, e in enumerate(entries):
        s = pk.slot_of[i]
        assert pk.p_idx[s] == e.p_number
        assert pk.q_idx[s] == e.q_number
        assert pk.r_idx[s] == e.r_number
        assert pk.qz[s, 0] == e.qz[0]


def test_engine_big_tree_stacked_hbm():
    """A multi-partition DNA group on a big tree must stay STACKED (no
    de-stack) and select the stacked HBM plan — one launch per group at
    any tree size — and the lnL must match the jnp engine."""
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.io.bytefile import Alignment, PartitionMeta
    from examl_tpu.io.newick import parse_newick
    from examl_tpu.tree import Tree
    from examl_tpu.datatypes import DataType, ProtModel
    from examl_tpu.traversal import full_traversal

    rng = np.random.default_rng(5)
    n_taxa, Wp, nparts = 400, 128, 3
    W = Wp * nparts
    names = [f'T{i}' for i in range(n_taxa)]
    codes = np.asarray([1, 2, 4, 8], np.uint8)[
        rng.integers(0, 4, (n_taxa, W))]
    parts = [PartitionMeta(
        name=f'p{k}', states=4, max_tip_states=16,
        lower=k * Wp, upper=(k + 1) * Wp,
        data_type=DataType.DNA, prot_model=ProtModel.NONE,
        prot_freqs=False, non_gtr=False,
        optimize_base_frequencies=False,
        frequencies=np.full(4, 0.25)) for k in range(nparts)]
    aln = Alignment(
        n_taxa=n_taxa, n_patterns=W, gappyness=0.0,
        weights=np.ones(W, np.int64), taxon_names=names,
        partitions=parts, codes=codes)

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
    assert any(len(ms) == nparts for ms in eng.groups), \
        'big tree must not de-stack the group'
    entries = full_traversal(tree, tree.start.back)
    packed = eng._pack_fused(entries)
    plan = eng._fused_plan(packed)
    assert plan is not None and plan[1][0] < 0, \
        'big tree must select the stacked HBM fused variant'
    assert eng._fused_grouped
    lnl = eng.evaluate(tree.start, full_traversal_=True)

    tree2 = Tree(names)
    parse_newick(nwk, tree2)
    eng2 = LikelihoodEngine(aln, tree2, dtype=jnp.float32,
                            use_pallas=False)
    lnl2 = eng2.evaluate(tree2.start, full_traversal_=True)
    assert lnl == pytest.approx(lnl2, rel=2e-6)


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
