import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import pathlib
import time

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.optimize.model_opt import ModelOptimizer
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path('tests/data')

import sys
no_dev = 'nodev' in sys.argv

aln = read_bytefile(str(DATA / '49.binary'))
tree = Tree(aln.taxon_names)
parse_newick((REF / '49.tree').read_text(), tree)
eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32, use_pallas=True,
                       pad=128)
eng.evaluate(tree.start, full_traversal_=True)
eng.tree_evaluate(1.0)
mod = ModelOptimizer(eng)
if 'oldslots' in sys.argv:
    from examl_tpu.traversal import _bucket
    eng._fused_slots = _bucket
if no_dev:
    mod._device_opt_for = lambda which, ll: None
mod.mod_opt(10.0)
print('after modOpt', eng.likelihood, flush=True)
s = SprSearch(eng)
bt = BestList(20)
best = s.determine_rearrangement_setting(BestList(20), bt)
print('best trav', best, eng.likelihood, flush=True)
best_t = BestList(1)
eng.evaluate(tree.start, full_traversal_=True)
best_t.save(tree, eng.likelihood, keep_identical=True)
lh = previous_lh = eng.likelihood
for it in range(3):
    s._recall(best_t, 1)
    eng.tree_evaluate(1.0)
    best_t.save(tree, eng.likelihood, keep_identical=True)
    previous_lh = eng.likelihood
    print('cycle', it, 'start', eng.likelihood, flush=True)
    s.tree_optimize_rapid(1, best, bt)
    for i in range(1, bt.nvalid + 1):
        s._recall(bt, i)
        eng.tree_evaluate(0.25)
        if eng.likelihood > lh:
            lh = eng.likelihood
            best_t.save(tree, eng.likelihood, keep_identical=True)
    print('cycle', it, 'best', lh, flush=True)

