"""A/B measurement of verdict prediction (spr.SprSearch.predict_verdicts):
spec_fetch sync counts and final lnL over the first fast SPR cycles of
testData/49 with the cutoff heuristic active. The sync count is
platform-independent (each fetch is one host round trip ~34 ms through
the axon tunnel); the trajectory must be identical in both arms.

Usage: python tools/verdict_pred_sync.py [ncycles]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update('jax_platforms', 'cpu')   # never contend for the chip

import numpy as np

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'
NCYC = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def run(predict: bool):
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree, dtype=jax.numpy.float32,
                           use_pallas=True, pad=128)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    s = SprSearch(eng)
    s.predict_verdicts = predict
    bt = BestList(20)
    lhs = []
    for _ in range(NCYC):
        lh = s.tree_optimize_rapid(1, 5, bt)
        eng.tree_evaluate(1.0)
        lhs.append(round(float(eng.likelihood), 4))
    stats = dict(eng.op_stats)
    spec = sum(v for k, v in stats.items() if k.endswith('spec_fetch'))
    total = sum(v for k, v in stats.items()
                if not k.startswith('compile:'))
    return lhs, spec, total


lhs_on, spec_on, tot_on = run(True)
lhs_off, spec_off, tot_off = run(False)
print(f'pred=on  lhs={lhs_on} spec_fetch={spec_on} total_syncs={tot_on}')
print(f'pred=off lhs={lhs_off} spec_fetch={spec_off} total_syncs={tot_off}')
assert lhs_on == lhs_off, 'trajectory must be identical'
print(f'identical trajectories; spec_fetch {spec_off} -> {spec_on} '
      f'({100 * (spec_off - spec_on) / max(spec_off, 1):.1f}% fewer)')
