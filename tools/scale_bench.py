"""Representative-scale hardware measurement (VERDICT r2 #5): build a
synthetic whole-genome-class alignment (default 512 taxa x 100k DNA sites
in 64 partitions — the per-chip HBM capacity class; multi-chip meshes
extend width linearly by site sharding), compile it with the production
parser, and measure the engine's hot operations plus one full lazy SPR
pass on the chip. Appends nothing; prints one JSON line for BASELINE.md.

Usage: python tools/scale_bench.py [taxa] [sites] [partitions]
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def synth(n_taxa, n_sites, n_parts, tmp):
    """Write a synthetic PHYLIP alignment + model file. Sites are drawn
    from per-column dominant bases with noise so pattern compression
    behaves like real data (not all-unique, not all-identical)."""
    rng = np.random.default_rng(7)
    bases = np.array(list('ACGT'))
    dom = rng.integers(0, 4, n_sites)
    probs = np.full((n_sites, 4), 0.08)
    probs[np.arange(n_sites), dom] = 0.76
    aln_path = tmp / 'scale.phy'
    with open(aln_path, 'w') as f:
        f.write(f' {n_taxa} {n_sites}\n')
        for t in range(n_taxa):
            draws = rng.random((n_sites, 1))
            cum = probs.cumsum(axis=1)
            idx = (draws > cum).sum(axis=1)
            f.write(f'T{t:05d} ' + ''.join(bases[idx]) + '\n')
    model_path = tmp / 'scale.model'
    edges = np.linspace(0, n_sites, n_parts + 1).astype(int)
    with open(model_path, 'w') as f:
        for i in range(n_parts):
            f.write(f'DNA, gene{i} = {edges[i] + 1}-{edges[i + 1]}\n')
    return str(aln_path), str(model_path)


def main():
    n_taxa = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_parts = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    tmp = pathlib.Path('/tmp/scale_bench')
    tmp.mkdir(exist_ok=True)

    t0 = time.time()
    aln_path, model_path = synth(n_taxa, n_sites, n_parts, tmp)
    t_synth = time.time() - t0

    from examl_tpu.io.phylip import parse_phylip
    t0 = time.time()
    aln = parse_phylip(aln_path, model_path, 'DNA')
    t_parse = time.time() - t0
    n_patterns = sum(p.width for p in aln.partitions)

    import jax
    import jax.numpy as jnp
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.tree import Tree
    from examl_tpu.search.spr import SprSearch
    from examl_tpu.search.topologies import BestList

    # random binary tree over the taxa: random sequential joins emitted
    # as a Newick string, parsed by the production reader
    rng = np.random.default_rng(11)
    subtrees = [f'T{t:05d}:0.05' for t in range(n_taxa)]
    rng.shuffle(subtrees)
    while len(subtrees) > 3:
        i = rng.integers(0, len(subtrees) - 1)
        a = subtrees.pop(int(i))
        j = rng.integers(0, len(subtrees) - 1)
        b = subtrees.pop(int(j))
        subtrees.append(f'({a},{b}):0.05')
    nwk = f'({subtrees[0]},{subtrees[1]},{subtrees[2]});'
    tree = Tree(aln.taxon_names)
    from examl_tpu.io.newick import parse_newick
    parse_newick(nwk, tree)

    dtype = jnp.float32
    t0 = time.time()
    eng = LikelihoodEngine(aln, tree, dtype=dtype, use_pallas=None)
    t_build = time.time() - t0
    est = eng.memory_estimate()

    print(f'# engine built in {t_build:.1f}s, parse {t_parse:.1f}s, '
          f'patterns {n_patterns}, clv {est["total"] / (1 << 30):.2f} GiB',
          flush=True)
    t0 = time.time()
    lnl = eng.evaluate(tree.start, full_traversal_=True)
    t_first_eval = time.time() - t0            # includes compiles
    t0 = time.time()
    lnl = eng.evaluate(tree.start, full_traversal_=True)
    t_eval = time.time() - t0
    # CLV throughput of the warm full traversal
    updates = n_patterns * (n_taxa - 2)

    print(f'# eval warm {t_eval:.3f}s ({updates / t_eval:.3g} '
          f'site-updates/s), first {t_first_eval:.1f}s', flush=True)
    t0 = time.time()
    eng.tree_evaluate(1.0)
    t_smooth = time.time() - t0
    print(f'# tree_evaluate {t_smooth:.1f}s', flush=True)

    s = SprSearch(eng)
    s.start_lh = s.end_lh = eng.likelihood
    bt = BestList(20)
    t0 = time.time()
    lh = s.tree_optimize_rapid(1, 5, bt)
    t_cycle = time.time() - t0

    print(json.dumps(dict(
        taxa=n_taxa, sites=n_sites, partitions=n_parts,
        patterns=int(n_patterns), backend=jax.default_backend(),
        clv_gib=round(est['total'] / (1 << 30), 2),
        t_synth=round(t_synth, 1), t_parse=round(t_parse, 1),
        t_engine_build=round(t_build, 1),
        t_first_eval=round(t_first_eval, 1),
        t_eval_warm=round(t_eval, 3),
        eval_site_updates_per_s=round(updates / t_eval),
        t_tree_evaluate=round(t_smooth, 1),
        t_spr_cycle=round(t_cycle, 1),
        spr_cycle_lnl=round(float(lh), 2),
        syncs=dict(sorted(eng.op_stats.items())),
    )), flush=True)


if __name__ == '__main__':
    main()
