"""-M at partition scale (VERDICT r5 item 8 / ROADMAP #4): build a
synthetic N-partition DNA alignment with per-partition branch lengths
(num_branches = N, the reference's NUM_BRANCHES=256 regime,
examl/axml.h:134) and drive the hot -M paths on hardware: engine build,
full evaluate, tree_evaluate, one thorough SPR wave, and one NR batch —
the kernels whose lz operands carry [P, N] / [N, B] scalar blocks.

Usage: python tools/m_scale_probe.py [partitions] [width_per_part]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    if jax.default_backend() not in ('cpu',):
        import os
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    import jax.numpy as jnp
    from examl_tpu.datatypes import DataType, ProtModel
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.io.bytefile import Alignment, PartitionMeta
    from examl_tpu.io.newick import parse_newick
    from examl_tpu.search.spr import SprSearch
    from examl_tpu.search.topologies import BestList
    from examl_tpu.tree import Tree

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    NT = 32
    rng = np.random.default_rng(11)
    W = P * w
    codes = (1 << rng.integers(0, 4, (NT, W))).astype(np.uint8)
    parts = []
    for g in range(P):
        parts.append(PartitionMeta(
            name=f'gene{g}', states=4, max_tip_states=16, lower=g * w,
            upper=(g + 1) * w, data_type=DataType.DNA,
            prot_model=ProtModel.NONE, prot_freqs=False, non_gtr=False,
            optimize_base_frequencies=False,
            frequencies=np.full(4, 0.25)))
    aln = Alignment(n_taxa=NT, n_patterns=W, gappyness=0.0,
                    weights=np.ones(W, dtype=np.int64),
                    taxon_names=[f't{i}' for i in range(NT)],
                    partitions=parts, codes=codes)
    names = aln.taxon_names
    tree = Tree(names, num_branches=P)
    nwk = ('(' + ',('.join(names[:-2]) + ',(' + names[-2] + ',' +
           names[-1] + ')' + ')' * (len(names) - 3) + ');')
    parse_newick(nwk, tree)

    t0 = time.time()
    eng = LikelihoodEngine(aln, tree, dtype=jnp.float32, use_pallas=True,
                           pad=128, num_branches=P)
    print(f'build {time.time() - t0:.1f}s; groups={eng.n_groups} '
          f'stack={eng.stack}', flush=True)
    t0 = time.time()
    lnl = eng.evaluate(tree.start, full_traversal_=True)
    print(f'evaluate {time.time() - t0:.1f}s lnL={lnl:.2f}', flush=True)
    assert np.isfinite(lnl) and lnl < 0
    t0 = time.time()
    lnl2 = eng.tree_evaluate(1.0)
    print(f'tree_evaluate {time.time() - t0:.1f}s lnL={lnl2:.2f}',
          flush=True)
    assert lnl2 >= lnl - 1e-3

    # one thorough SPR side: the [N, B]-lane junction + NR wave kernels
    # at partition scale (a full cycle at B=256 spends tens of minutes in
    # remote thorough-shape compiles; one wave proves the kernels plan)
    s = SprSearch(eng)
    s.thorough = True
    assert s.batch_thorough
    s.start_lh = s.end_lh = eng.likelihood
    s.lh_cutoff = float('inf')
    s.best_of_node = float('-inf')
    p_node = next(n for n in (tree.nodep[i] for i in
                              range(tree.mxtips + 1, 2 * tree.mxtips - 1))
                  if not (tree.is_tip(n.next.back.number)
                          and tree.is_tip(n.next.next.back.number)))
    t0 = time.time()
    nb = s.rearrange_big(p_node, 1, 2)
    print(f'thorough wave {time.time() - t0:.1f}s n={nb} '
          f'best={s.best_of_node:.2f}', flush=True)
    assert nb == 1 and np.isfinite(s.best_of_node)
    print('M-SCALE OK', flush=True)


if __name__ == '__main__':
    main()
