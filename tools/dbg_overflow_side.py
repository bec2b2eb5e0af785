"""Instrument _dispatch_side for one prune side (node 85 of the repro):
log per-candidate recorded entries + read resolutions for batched pool-24
vs batched default, and diff candidate structure."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent.parent / 'tests/data'

TARGET = 85


def run(n_scratch):
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    if n_scratch is not None:
        eng.n_scratch = n_scratch
    search = SprSearch(eng, batch_lazy=True)
    logs = []
    orig = SprSearch._dispatch_side

    def wrapped(self, p, p1, p2, mintrav, maxtrav, **kw):
        side = orig(self, p, p1, p2, mintrav, maxtrav, **kw)
        if p.number == TARGET and isinstance(side, dict):
            rec = side['rec']
            # per-candidate entry structure
            percand = {}
            for i, e in enumerate(rec.entries):
                ci = rec.entry_writer[i]
                percand.setdefault(ci, []).append(
                    (rec.entry_node[i], e.tip_case))
            logs.append(dict(
                nverd=len(kw.get('verdicts') or side['verdicts'][:0]),
                verdicts_in=list(kw.get('verdicts') or []),
                u=[c['u'].number for c in side['cands']],
                truncated=side.get('truncated'),
                reads=list(rec.reads),
                percand=percand,
                sc=(list(rec.sc_p), list(rec.sc_q),
                    [tuple(z) for z in rec.sc_z]),
            ))
        return side

    SprSearch._dispatch_side = wrapped
    try:
        bt = BestList(20)
        search.tree_optimize_rapid(1, 5, bt)
    finally:
        SprSearch._dispatch_side = orig
    return logs


la = run(24)
lb = run(None)
print(f'pool24 rounds for node {TARGET}: {len(la)}')
for r in la:
    print('  nverd:', len(r['verdicts_in']), 'u:', r['u'],
          'trunc:', r['truncated'])
print(f'default rounds: {len(lb)}')
for r in lb:
    print('  nverd:', len(r['verdicts_in']), 'u:', r['u'],
          'trunc:', r['truncated'])

# locate candidate u=23 in each and compare structure
for name, logs in (('pool24', la), ('default', lb)):
    for ri, r in enumerate(logs):
        if 23 in r['u']:
            ci = r['u'].index(23)
            print(f'--- {name}: u=23 is cand {ci} of round {ri} '
                  f'(global prefix {len(r["verdicts_in"])})')
            print('  entries:', r['percand'].get(ci))
            print('  sc_p row:', r['sc'][0][ci], ' sc_q row:',
                  r['sc'][1][ci])
            print('  sc_z:', [f'{z:.6f}' for z in r['sc'][2][ci]])
            # reads attributed by scanning entry structure is awkward;
            # dump all reads with index
            print('  reads:', r['reads'])
