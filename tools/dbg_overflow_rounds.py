"""Log EVERY _side_rounds round (dispatch prefix, cands, truncated,
accepted, commit set, scores) for batched pool-24 vs default, then diff
in order to find the first structural/bookkeeping divergence."""
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

    orig_replay = SprSearch._replay_side
    orig_commit = SprSearch._commit_side

    def replay(self, side):
        done = orig_replay(self, side)
        sc = []
        for seg in side['segs']:
            sc.extend(float(v) for v in seg['scores'][:seg['n']])
        logs.append(dict(
            p=side['p'].number,
            prefix=len(side['verdicts']) - side['accepted'],
            u=[c['u'].number for c in side['cands']],
            trunc=bool(side.get('truncated')),
            accepted=side['accepted'],
            done=done,
            scores=[round(s, 4) for s in sc],
        ))
        return done

    def commit(self, side):
        rec = side['rec']
        first = side.get('replayed_from', 0)
        accepted = side['accepted']
        cs = {}
        for i, node in enumerate(rec.entry_node):
            if node is None:
                continue
            if first <= rec.entry_writer[i] < accepted:
                cs[node] = rec.entry_gid[i]
        logs[-1]['commit'] = sorted(cs.items())
        logs[-1]['norient'] = sum(1 for _r, ci in rec.orient_log
                                  if first <= ci < accepted)
        return orig_commit(self, side)

    SprSearch._replay_side = replay
    SprSearch._commit_side = commit
    try:
        bt = BestList(20)
        search.tree_optimize_rapid(1, 5, bt)
    finally:
        SprSearch._replay_side = orig_replay
        SprSearch._commit_side = orig_commit
    return logs


la = run(24)
lb = run(None)
print('rounds:', len(la), len(lb))
# align by flattened (p, u[i]) tested-candidate sequence; simply walk both
# logs and find first round whose (p, prefix-adjusted candidate list,
# accepted verdicts, scores) diverges.
ia = ib = 0
ja = jb = 0  # index within round's cands


def flat(logs):
    out = []
    for r in logs:
        for k in range(r['accepted']):
            out.append((r['p'], r['u'][k], r['scores'][k], r['trunc'],
                        id(r)))
    return out, logs


fa, _ = flat(la)
fb, _ = flat(lb)
print('flat tested/accepted candidates:', len(fa), len(fb))
for i, (x, y) in enumerate(zip(fa, fb)):
    if x[:2] != y[:2] or abs(x[2] - y[2]) > 1e-3:
        print(f'first flat divergence at {i}:')
        for j in range(max(0, i - 4), min(i + 4, min(len(fa), len(fb)))):
            print(' A', fa[j][:4], ' B', fb[j][:4])
        # dump surrounding rounds
        break
else:
    print('flat sequences equal to', min(len(fa), len(fb)))

# also: find the rounds containing that divergence for context
import json
with open('/tmp/rounds_a.json', 'w') as f:
    json.dump(la, f, indent=1, default=str)
with open('/tmp/rounds_b.json', 'w') as f:
    json.dump(lb, f, indent=1, default=str)
print('full logs in /tmp/rounds_a.json /tmp/rounds_b.json')
