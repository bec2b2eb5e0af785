"""Reproduce the round-4 overflow-segmentation divergence: one fast SPR
cycle on testData/49 with a shrunk scratch pool, batched (trace) vs
sequential (trace); print the first divergent trace line and summary."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick, write_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent.parent / 'tests/data'


class _Tr:
    def __init__(self):
        self.lines = []

    def write(self, s):
        self.lines.append(s)


def one_cycle(batch_lazy, n_scratch=None):
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    eng.evaluate(tree.start, full_traversal_=True)
    eng.tree_evaluate(1.0)
    if n_scratch is not None:
        eng.n_scratch = n_scratch
    search = SprSearch(eng, batch_lazy=batch_lazy)
    tr = _Tr()
    search.trace = tr
    bt = BestList(20)
    lh = search.tree_optimize_rapid(1, 5, bt)
    return dict(lh=lh, end_lh=search.end_lh, lh_dec=search.lh_dec,
                lh_avg=search.lh_avg, tree=write_newick(tree),
                trace=tr.lines)


def diff(a, b, la='A', lb='B'):
    print(f'{la}: lh={a["lh"]:.4f} end={a["end_lh"]:.4f} dec={a["lh_dec"]}')
    print(f'{lb}: lh={b["lh"]:.4f} end={b["end_lh"]:.4f} dec={b["lh_dec"]}')
    print('tree equal:', a['tree'] == b['tree'])
    print('trace lens:', len(a['trace']), len(b['trace']))
    for i, (x, y) in enumerate(zip(a['trace'], b['trace'])):
        if x != y:
            print(f'first divergence at line {i}:')
            for j in range(max(0, i - 3),
                           min(i + 4, min(len(a['trace']), len(b['trace'])))):
                m = '  ' if a['trace'][j] == b['trace'][j] else '>>'
                print(f'{m} {j} {la}: {a["trace"][j].strip()}')
                if a['trace'][j] != b['trace'][j]:
                    print(f'{m} {j} {lb}: {b["trace"][j].strip()}')
            return
    print('common trace prefix identical')


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = None if n == 0 else n
    a = one_cycle(True, n)
    b = one_cycle(False)
    diff(a, b, f'batched({n})', 'sequential')
