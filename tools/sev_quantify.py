"""Quantify the -S (SEV) question with data (VERDICT r3 #9): build a
realistic gappy whole-genome synthetic (clade-clustered missing-taxon
blocks, ~75% missing), and compare
  (a) this engine's CLV bytes (f32 and bf16),
  (b) the reference's SEV model: CLV entries only for (node, site)
      pairs whose subtree has any non-gap taxon (newviewGenericSpecial.c
      :135-160; all-gap columns share one per-node gapColumn),
  (c) the induced-subtree model (rows = 2 * present-taxa per partition —
      the exact lnL-preserving compaction; see docs/SEV.md).
Usage: python tools/sev_quantify.py [taxa] [sites] [partitions]
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    n_taxa = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_sites = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    n_parts = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.default_rng(3)

    # clade-clustered presence: a random binary tree; each partition is
    # sequenced for a few clades (realistic multi-gene missingness:
    # related taxa get the same genes) totalling ~25% of taxa
    children = {}
    avail = list(range(1, n_taxa + 1))
    rng.shuffle(avail)
    nxt = n_taxa + 1
    order = []
    while len(avail) > 1:
        a = avail.pop()
        b = avail.pop()
        children[nxt] = (a, b)
        order.append(nxt)
        avail.insert(rng.integers(0, max(1, len(avail))), nxt)
        nxt += 1
    root = avail[0]

    # tip sets per node (bottom-up)
    tipset = {i: {i} for i in range(1, n_taxa + 1)}
    for v in order:
        a, b = children[v]
        tipset[v] = tipset[a] | tipset[b]

    clades = [v for v in order if 4 <= len(tipset[v]) <= n_taxa // 8]
    present = np.zeros((n_parts, n_taxa + 1), bool)
    for p in range(n_parts):
        got = 0
        while got < 0.25 * n_taxa:
            c = clades[rng.integers(0, len(clades))]
            for t in tipset[c]:
                if not present[p, t]:
                    present[p, t] = True
                    got += 1
    missing = 1.0 - present[:, 1:].mean()

    W = n_sites // n_parts
    K = 16                      # 4 states x 4 gamma
    inner = order + [root] if root > n_taxa else order

    # (a) our dense stacked layout: every inner node x partition x K x W
    rows_inner = n_taxa - 1
    dense = n_parts * rows_inner * K * W * 4
    dense_bf16 = dense // 2

    # (b) SEV: an inner node's CLV for partition p is materialized only
    # if subtree(node) has a present taxon in p (block-missing data has
    # no within-block site granularity beyond this)
    live = 0
    for v in inner:
        ts = tipset[v]
        for p in range(n_parts):
            if any(present[p, t] for t in ts):
                live += 1
    sev = live * K * W * 4
    # (c) induced subtree: rows per partition = present_p - 1 inner nodes
    induced = int(sum(max(present[p, 1:].sum() - 1, 0)
                      for p in range(n_parts))) * K * W * 4

    print(f'taxa={n_taxa} sites={n_sites} parts={n_parts} '
          f'missing={missing:.2f}')
    print(f'dense f32      : {dense / 2**30:.2f} GiB')
    print(f'dense bf16     : {dense_bf16 / 2**30:.2f} GiB '
          f'({dense / dense_bf16:.2f}x)')
    print(f'SEV model f64->f32: {sev / 2**30:.2f} GiB '
          f'({dense / sev:.2f}x vs dense f32)')
    print(f'induced subtree: {induced / 2**30:.2f} GiB '
          f'({dense / induced:.2f}x)')
    print(f'SEV+bf16 equiv : {sev / 2 / 2**30:.2f} GiB')


if __name__ == '__main__':
    main()
