import pathlib
import time

import numpy as np

import jax
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path('tests/data')

aln = read_bytefile(str(DATA / '49.binary'))
tree = Tree(aln.taxon_names)
parse_newick((REF / '49.tree').read_text(), tree)
eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32, use_pallas=True)
print('backend', jax.default_backend(), 'widths', eng.widths)

import sys
if len(sys.argv) > 1 and sys.argv[1] == 'old':
    from examl_tpu.traversal import _bucket
    eng._fused_slots = _bucket
    print('using OLD per-length buckets')

lnl = eng.evaluate(tree.start, full_traversal_=True)
print('initial', lnl)

# warm: evaluate with a small partial traversal (invalidate 2 nodes)
inner = tree.nodep[tree.mxtips + 5]


def one():
    inner.x, inner.next.x, inner.next.next.x = 0, 0, 1
    return eng.evaluate(tree.start)


one()
one()
t0 = time.perf_counter()
N = 30
for _ in range(N):
    one()
dt = (time.perf_counter() - t0) / N
print(f'evaluate (partial, synced): {dt*1000:.1f} ms')

# pure full-traversal evaluate
eng.evaluate(tree.start, full_traversal_=True)
t0 = time.perf_counter()
for _ in range(10):
    eng.evaluate(tree.start, full_traversal_=True)
dt = (time.perf_counter() - t0) / 10
print(f'evaluate (full, synced): {dt*1000:.1f} ms')
