"""The docs/SEV.md synthetic at full scale with the implemented
induced-subtree compaction: 256 taxa x 120k sites x 64 DNA partitions,
~73-75% block-missing. Builds the dense and compacted engines, compares
the full-evaluate lnL, and prints the CLV bytes of both layouts (target:
compact <= 0.49 GiB f32, docs/SEV.md table).

Usage: python tools/sev_compact_hw.py [taxa] [sites] [parts]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / 'tests'))

from test_sev_scale import _gappy_alignment  # noqa: E402


def main():
    import jax.numpy as jnp
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.io.newick import parse_newick
    from examl_tpu.tree import Tree

    n_taxa = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sites = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    aln = _gappy_alignment(n_taxa=n_taxa, part_width=sites // parts,
                           n_parts=parts, present_frac=0.25, seed=7)
    print(f'{n_taxa} taxa x {sites} sites x {parts} partitions, '
          f'gappyness {aln.gappyness:.2f}', flush=True)
    names = aln.taxon_names
    nwk = ('(' + ',('.join(names[:-2]) + ',(' + names[-2] + ',' +
           names[-1] + ')' + ')' * (len(names) - 3) + ');')

    gib = 1 << 30
    results = {}
    for mode in ('compact', 'dense'):
        tree = Tree(names)
        parse_newick(nwk, tree)
        t0 = time.time()
        eng = LikelihoodEngine(aln, tree, dtype=jnp.float32,
                               use_pallas=True, pad=128,
                               compact=(mode == 'compact'))
        build = time.time() - t0
        clv_b = sum(c.nbytes for c in eng.clv)
        t0 = time.time()
        lnl = eng.evaluate(tree.start, full_traversal_=True)
        first = time.time() - t0
        t0 = time.time()
        lnl = eng.evaluate(tree.start, full_traversal_=True)
        warm = time.time() - t0
        results[mode] = (clv_b, lnl)
        print(f'{mode}: CLV {clv_b / gib:.3f} GiB, lnL {lnl:.4f}, '
              f'build {build:.1f}s, evaluate {first:.2f}s cold / '
              f'{warm:.3f}s warm', flush=True)
        del eng

    cb, cl = results['compact']
    db, dl = results['dense']
    print(f'saving {db / cb:.2f}x, lnL diff {abs(cl - dl):.4f}')


if __name__ == '__main__':
    main()
