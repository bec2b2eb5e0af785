"""Capture dispatch descriptors (entries + scoring rows) for every
(p=85, 23-in-u) side in pool24 and default runs; print the dependency
subgraph feeding candidate u=23's scoring lane for comparison."""
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
    caps = []
    orig = SprSearch._dispatch_side

    def wrapped(self, p, p1, p2, mintrav, maxtrav, **kw):
        side = orig(self, p, p1, p2, mintrav, maxtrav, **kw)
        if (isinstance(side, dict) and p.number == 85
                and any(c['u'].number == 23 for c in side['cands'])):
            rec = side['rec']
            caps.append(dict(
                u=[c['u'].number for c in side['cands']],
                entries=[(e.tip_case, e.p_number, e.q_number, e.r_number,
                          tuple(round(z, 12) for z in e.qz),
                          tuple(round(z, 12) for z in e.rz))
                         for e in rec.entries],
                writers=list(rec.entry_writer),
                nodes=list(rec.entry_node),
                sc_p=list(rec.sc_p), sc_q=list(rec.sc_q),
                sc_z=[tuple(round(z, 12) for z in z_) for z_ in rec.sc_z],
                trunc=bool(side.get('truncated')),
            ))
        return side

    SprSearch._dispatch_side = wrapped
    try:
        bt = BestList(20)
        search.tree_optimize_rapid(1, 5, bt)
    finally:
        SprSearch._dispatch_side = orig
    return caps


def subgraph(cap, lane):
    """Expand the row-dependency tree feeding scoring lane `lane`."""
    wrote = {}
    for i, e in enumerate(cap['entries']):
        wrote[e[1]] = i    # dest row -> entry idx (last write wins)

    def expand(row, depth=0):
        out = []
        i = wrote.get(row)
        pre = '  ' * depth
        if i is None:
            out.append(f'{pre}row {row} = MAIN/pre')
            return out
        tc, pr, qr, rr, qz, rz = cap['entries'][i]
        out.append(f'{pre}row {row} <- entry{i} (w{cap["writers"][i]} '
                   f'node={cap["nodes"][i]}) tc={tc} q={qr} r={rr} '
                   f'qz={qz[0]:.9f} rz={rz[0]:.9f}')
        out += expand(qr, depth + 1)
        out += expand(rr, depth + 1)
        return out

    lines = [f'lane {lane}: sc_p={cap["sc_p"][lane]} '
             f'sc_q={cap["sc_q"][lane]} z={cap["sc_z"][lane][0]:.9f}']
    lines += expand(cap['sc_p'][lane])
    lines += expand(cap['sc_q'][lane])
    return lines


if __name__ == '__main__':
    ca = run(24)
    cb = run(None)
    print('captures:', len(ca), len(cb))
    for name, caps in (('A(24)', ca), ('B(def)', cb)):
        for k, cap in enumerate(caps):
            lane = cap['u'].index(23)
            print(f'=== {name} cap{k} trunc={cap["trunc"]} u={cap["u"]}')
            if lane >= len(cap['sc_p']):
                print(f'    INCONSISTENT: {len(cap["u"])} cands but only '
                      f'{len(cap["sc_p"])} scoring lanes')
                continue
            for ln in subgraph(cap, lane):
                print('   ', ln)
