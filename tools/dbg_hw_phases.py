import pathlib
import time

import numpy as np

import jax
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.optimize.model_opt import ModelOptimizer
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path('tests/data')

t00 = time.perf_counter()


def mark(label):
    global t00
    t = time.perf_counter()
    print(f'[{t - t00:8.2f}s] {label}', flush=True)
    t00 = t


aln = read_bytefile(str(DATA / '49.binary'))
tree = Tree(aln.taxon_names)
parse_newick((REF / '49.tree').read_text(), tree)
eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32, use_pallas=True)
mark('engine built')
eng.evaluate(tree.start, full_traversal_=True)
mark('initial evaluate')
eng.tree_evaluate(1.0)
mark('tree_evaluate')
mod = ModelOptimizer(eng)
eng.op_context = 'modopt:'
mod.mod_opt(10.0)
eng.op_context = ''
mark('modOpt(10)')
s = SprSearch(eng)
bt = BestList(20)
best = s.determine_rearrangement_setting(BestList(20), bt)
mark(f'determine_rearrangement (best={best})')
lh = s.tree_optimize_rapid(1, best, bt)
mark(f'one FAST cycle lh={lh:.3f}')
lh = s.tree_optimize_rapid(1, best, bt)
mark(f'second FAST cycle lh={lh:.3f}')
for k, v in sorted(eng.op_time.items(), key=lambda kv: -kv[1]):
    cnt = eng.op_stats.get(
        k if k.startswith('compile:') else k[len('sync:'):], 0)
    print(f'  {k:40s} {v:8.1f}s ({cnt}x)')
