"""Host-side search-runtime overhead at 10^4 taxa (VERDICT r3 #10):
traversal-descriptor construction, grouped packing, canonical/RF
hashing, and the projected per-SPR-cycle host cost.
Usage: python tools/host_overhead.py [taxa]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.tree import Tree
from examl_tpu.io.newick import parse_newick
from examl_tpu.traversal import (full_traversal, partial_traversal,
                                 pack_grouped, pack_traversal)
from examl_tpu import native


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    rng = np.random.default_rng(1)
    subtrees = [f'T{t}:0.05' for t in range(n)]
    rng.shuffle(subtrees)
    while len(subtrees) > 3:
        a = subtrees.pop(int(rng.integers(0, len(subtrees))))
        b = subtrees.pop(int(rng.integers(0, len(subtrees))))
        subtrees.append(f'({a},{b}):0.05')
    nwk = f'({subtrees[0]},{subtrees[1]},{subtrees[2]});'
    tr = Tree([f'T{t}' for t in range(n)])
    t0 = time.perf_counter()
    parse_newick(nwk, tr)
    t_parse = time.perf_counter() - t0

    t0 = time.perf_counter()
    entries = full_traversal(tr, tr.start.back)
    t_trav = time.perf_counter() - t0

    t0 = time.perf_counter()
    pk = pack_grouped(tr, entries, group=8)
    t_packg = time.perf_counter() - t0

    for e in entries:
        pass
    t0 = time.perf_counter()
    pack_traversal(tr, entries, slots=len(entries))
    t_packf = time.perf_counter() - t0

    # partial traversals: orient away then re-derive (the SPR smoothing
    # pattern); measure a batch of 100
    t0 = time.perf_counter()
    for i in range(100):
        node = tr.nodep[n + 2 + int(rng.integers(0, n - 3))]
        partial_traversal(tr, node)
    t_partial = (time.perf_counter() - t0) / 100

    t0 = time.perf_counter()
    h = native.canonical_hash(tr)
    t_hash = time.perf_counter() - t0
    t0 = time.perf_counter()
    native.bipartition_hashes(tr)
    t_bip = time.perf_counter() - t0

    # a fast-SPR cycle visits ~2n prune nodes; per node the driver does
    # ~2 partial traversals + 1 grouped pack of a small descriptor +
    # bookkeeping. Project with measured partials + small packs.
    t0 = time.perf_counter()
    for _ in range(100):
        pack_grouped(tr, entries[:24], group=8)
    t_packsmall = (time.perf_counter() - t0) / 100
    cycle = 2 * n * (2 * t_partial + t_packsmall)

    print(f'taxa={n} entries={len(entries)} slots={pk.p_idx.shape[0]}')
    print(f'newick parse        : {t_parse:.3f} s')
    print(f'full_traversal      : {t_trav * 1e3:.1f} ms')
    print(f'pack_grouped (full) : {t_packg * 1e3:.1f} ms')
    print(f'pack_traversal(flat): {t_packf * 1e3:.1f} ms')
    print(f'partial_traversal   : {t_partial * 1e6:.0f} us')
    print(f'pack_grouped (small): {t_packsmall * 1e6:.0f} us')
    print(f'canonical hash (C)  : {t_hash * 1e3:.1f} ms')
    print(f'bipartition hash (C): {t_bip * 1e3:.1f} ms')
    print(f'projected host overhead per fast-SPR cycle: {cycle:.1f} s')


if __name__ == '__main__':
    main()
