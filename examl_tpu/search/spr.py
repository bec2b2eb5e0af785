"""SPR hill-climbing tree search — the RAxML search algorithm.

Port of the reference search driver (reference: examl/searchAlgo.c —
computeBIGRAPID :1914, treeOptimizeRapid :914, rearrangeBIG :804,
insertBIG/testInsertBIG :484/:682, determineRearrangementSetting :1752,
restoreTreeFast :1090; examl/trash.c nodeRectifier :55). Heuristic
constants and control flow match the reference so the search visits the
same trees; the likelihood/branch-length math runs on the device engine.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np

from .. import constants as C
from ..engine import LikelihoodEngine
from ..traversal import (TIP_TIP, INNER_INNER, TraversalEntry,
                         full_traversal, partial_traversal)
from ..tree import Node, Tree
from .topologies import BestList, canonical_key

BAD_REAR = -1


def node_rectifier(tr: Tree) -> None:
    """Renumber inner ring records in traversal order from tip 1
    (trash.c nodeRectifier :55). The ring record encountered first becomes
    nodep[mxtips+1+k] for traversal index k."""
    tr.start = tr.nodep[1]
    tr.rooted = False

    old = {i: tr.nodep[i] for i in range(tr.mxtips + 1, 2 * tr.mxtips - 1)}
    count = [0]

    def reorder(p: Node):
        if tr.is_tip(p.number):
            return
        tr.nodep[count[0] + tr.mxtips + 1] = p
        count[0] += 1
        reorder(p.next.back)
        reorder(p.next.next.back)

    reorder(tr.start.back)
    assert count[0] == tr.mxtips - 2
    # renumber all ring records to match their new slots
    for i in range(tr.mxtips + 1, 2 * tr.mxtips - 1):
        p = tr.nodep[i]
        p.number = p.next.number = p.next.next.number = i


@dataclasses.dataclass
class InfoList:
    """Top-50 prune candidates from the fast pass (searchAlgo.c iList)."""
    n: int = 50
    nodes: List[Optional[Node]] = dataclasses.field(default_factory=list)
    likelihoods: List[float] = dataclasses.field(default_factory=list)
    valid: int = 0

    def reset(self):
        self.nodes = [None] * self.n
        self.likelihoods = [C.UNLIKELY] * self.n
        self.valid = 0

    def insert(self, node: Node, likelihood: float):
        mn = int(np.argmin(self.likelihoods))
        if likelihood > self.likelihoods[mn]:
            self.likelihoods[mn] = likelihood
            self.nodes[mn] = node
            self.valid = min(self.valid + 1, self.n)


class SprSearch:
    def __init__(self, engine: LikelihoodEngine, *,
                 step_width: int = 5, max_rearrange: int = 21,
                 do_cutoff: bool = True, big_cutoff: bool = False,
                 initial_radius: Optional[int] = None,
                 search_convergence: bool = False,
                 constraint=None, save_best_trees: int = 0,
                 log_fn=None, checkpointer=None,
                 batch_lazy: Optional[bool] = None):
        self.eng = engine
        self.tr = engine.tree
        self.thorough = False
        self.step_width = step_width
        self.max_rearrange = max_rearrange
        self.do_cutoff = do_cutoff
        self.big_cutoff = big_cutoff
        self.initial_radius = initial_radius
        self.search_convergence = search_convergence
        self.log_fn = log_fn or (lambda *a: None)
        self.checkpointer = checkpointer
        # Batch all lazy-insertion candidates of one pruned subtree into
        # device waves (cutoff bookkeeping replayed post-hoc in traversal
        # order). The batched path always computes candidate-support CLVs
        # FRESH in scratch rows, whereas the sequential walk — like the
        # reference (evaluateGeneric's partial traversals trust x-flags,
        # newviewGenericSpecial.c:691-813) — knowingly reuses CLVs left
        # from *earlier prune positions in the same cycle* whose junction
        # branch (zqr) has since been restored; identical search
        # trajectories under batching would require emulating those stale
        # reads and the x-flag evolution bit-for-bit. Policy: on
        # accelerators (f32, ~6 ms/dispatch, where per-candidate dispatch
        # is unusable) default to batched waves; on the CPU/f64 parity
        # path default to the sequential walk so the trajectory matches
        # the reference binary exactly. tests/test_spr_batch.py pins both
        # paths to identical scores/cycle results from a common state.
        if batch_lazy is None:
            batch_lazy = engine.use_pallas
        self.batch_lazy = batch_lazy
        # thorough insertions batch the same way (whole insertBIG +
        # localSmooth pipeline per candidate in one device wave); the
        # vectorized NR program is single-branch-class GAMMA only
        self.batch_thorough = (engine.use_pallas and not engine.is_psr
                               and engine.num_branches == 1)
        # Speculative prune-node batching (accelerator): dispatch the
        # device programs of several consecutive prune nodes WITHOUT
        # fetching (the junction NR result flows into the wave programs by
        # device-side branch substitution), fetch the whole batch in ONE
        # round trip, replay the bookkeeping, and discard + re-dispatch
        # from the first applied improvement. Through a remote runtime a
        # fetch costs ~34 ms, so this divides the search's dominant cost
        # by the speculation depth.
        # sub_capable: the fused program's device branch substitution is
        # available; the SYNC driver then routes zqr through it too, so
        # toggling self.speculate never changes the device computation
        self.sub_capable = (engine.use_pallas
                            and engine.speculation_supported())
        self.speculate = self.sub_capable
        self.spec_depth = 16
        # constraint vector (tip group ids); inner entries are resolved by
        # recursion to the first tip (searchAlgo.c checker :69)
        self.constraint = constraint
        # -B: additional cache of the N best distinct ML trees
        self.best_ml = BestList(save_best_trees) if save_best_trees else None

        # optional trajectory trace stream (tools/dbg_traj.py): one line
        # per tested insertion candidate / applied improvement, used to
        # pin the batched drivers to the sequential walk's exact decisions
        self.trace = None

        self.ilist = InfoList()
        # per-cycle SPR bookkeeping (tree struct fields in the reference)
        self.start_lh = 0.0
        self.end_lh = 0.0
        self.best_of_node = C.UNLIKELY
        self.zqr = [C.DEFAULTZ] * engine.num_branches
        self.current_zqr = [C.DEFAULTZ] * engine.num_branches
        self.lzq = [0.0] * engine.num_branches
        self.lzr = [0.0] * engine.num_branches
        self.lzs = [0.0] * engine.num_branches
        self.lzi = [0.0] * engine.num_branches
        self.current_lzq = [0.0] * engine.num_branches
        self.current_lzr = [0.0] * engine.num_branches
        self.current_lzs = [0.0] * engine.num_branches
        self.insert_node: Optional[Node] = None
        self.remove_node: Optional[Node] = None
        self.lh_cutoff = 0.0
        self.lh_avg = 0.0
        self.lh_dec = 0
        self.it_count = 0
        # RF convergence state: bipartition sets of the two last cycles,
        # plus their Newick strings for checkpoint persistence (the
        # reference persists tree0/tree1 and re-hashes them on restart,
        # searchAlgo.c:1208-1209, restartHashTable.c:279)
        self.rf_slots = [None, None]
        self.rf_newicks = ['', '']

    # ------------------------------------------------------------------
    # SPR primitives

    def remove_node_big(self, p: Node):
        tr = self.tr
        q = p.next.back
        r = p.next.next.back
        zqr = [qz * rz for qz, rz in zip(q.z, r.z)]
        result = self.eng.makenewz(q, r, zqr, C.ITERATIONS, mask=False)
        self.zqr = list(result)
        tr.hookup(q, r, result)
        p.next.back = p.next.next.back = None
        return q

    def remove_node_big_lazy(self, p: Node):
        """remove_node_big with the junction NR result left ON DEVICE: the
        tree is hooked up with the pre-NR product placeholder (never read
        by device math — the wave programs substitute the device value
        into the marked descriptor slots) and the handle is fetched with
        the whole speculative batch."""
        tr = self.tr
        q = p.next.back
        r = p.next.next.back
        zqr0 = [qz * rz for qz, rz in zip(q.z, r.z)]
        zdev = self.eng.makenewz_lazy(q, r, zqr0, C.ITERATIONS)
        tr.hookup(q, r, zqr0)
        p.next.back = p.next.next.back = None
        return q, zdev

    def remove_node_restore_big(self, p: Node):
        tr = self.tr
        q = p.next.back
        r = p.next.next.back
        self.eng.newview(q)
        self.eng.newview(r)
        tr.hookup(q, r, self.current_zqr)
        p.next.back = p.next.next.back = None
        return q

    def insert_big(self, p: Node, q: Node):
        tr = self.tr
        B = self.eng.num_branches
        r = q.back
        s = p.back
        self.lzi = list(q.z)
        if self.thorough:
            qz = list(q.z)
            default = [C.DEFAULTZ] * B
            zqr = self.eng.makenewz(q, r, qz, C.ITERATIONS, mask=False)
            zqs = self.eng.makenewz(q, s, default, C.ITERATIONS, mask=False)
            zrs = self.eng.makenewz(r, s, default, C.ITERATIONS, mask=False)
            e1, e2, e3 = [0.0] * B, [0.0] * B, [0.0] * B
            for i in range(B):
                lzqr = math.log(max(zqr[i], C.ZMIN))
                lzqs = math.log(max(zqs[i], C.ZMIN))
                lzrs = math.log(max(zrs[i], C.ZMIN))
                lzsum = 0.5 * (lzqr + lzqs + lzrs)
                lzq = lzsum - lzrs
                lzr = lzsum - lzqs
                lzs = lzsum - lzqr
                lzmax = math.log(C.ZMAX)
                if lzq > lzmax:
                    lzq, lzr, lzs = lzmax, lzqr, lzqs
                elif lzr > lzmax:
                    lzr, lzq, lzs = lzmax, lzqr, lzrs
                elif lzs > lzmax:
                    lzs, lzq, lzr = lzmax, lzqs, lzrs
                e1[i] = math.exp(lzq)
                e2[i] = math.exp(lzr)
                e3[i] = math.exp(lzs)
            tr.hookup(p.next, q, e1)
            tr.hookup(p.next.next, r, e2)
            tr.hookup(p, s, e3)
        else:
            z = [min(max(math.sqrt(zi), C.ZMIN), C.ZMAX) for zi in q.z]
            tr.hookup(p.next, q, z)
            tr.hookup(p.next.next, r, z)
        self.eng.newview(p)
        if self.thorough:
            self.eng.local_smooth(p, C.SMOOTHINGS)
            self.lzq = list(p.next.z)
            self.lzr = list(p.next.next.z)
            self.lzs = list(p.z)

    def insert_restore_big(self, p: Node, q: Node):
        tr = self.tr
        r = q.back
        s = p.back
        if self.thorough:
            tr.hookup(p.next, q, self.current_lzq)
            tr.hookup(p.next.next, r, self.current_lzr)
            tr.hookup(p, s, self.current_lzs)
        else:
            z = [min(max(math.sqrt(zi), C.ZMIN), C.ZMAX) for zi in q.z]
            tr.hookup(p.next, q, z)
            tr.hookup(p.next.next, r, z)
        self.eng.newview(p)

    def _subtree_group(self, p: Node) -> int:
        """Group id of the subtree behind p: the common group if all tips
        below belong to one constraint group, else 0 (= the backbone tag
        the reference assigns to nodes above the multifurcation groups,
        treeIO.c addElementLenMULT :928). A pure-group subtree may only be
        inserted next to its own group; a backbone/mixed subtree only at
        backbone edges — exactly the reference's checker gate."""
        tr = self.tr
        if tr.is_tip(p.number):
            return int(self.constraint[p.number])
        g1 = self._subtree_group(p.next.back)
        g2 = self._subtree_group(p.next.next.back)
        return g1 if g1 == g2 else 0

    def test_insert_big(self, p: Node, q: Node) -> bool:
        tr = self.tr
        r = q.back
        qz = list(q.z)
        pz = list(p.z)
        start_lh = self.end_lh

        if self.constraint is not None:
            # reject insertions that would move the pruned subtree into a
            # different constraint group (testInsertBIG :690-715)
            p_group = self._subtree_group(p.back)
            q_group = self._subtree_group(q)
            r_group = self._subtree_group(r)
            if p_group != q_group and p_group != r_group:
                return True

        self.insert_big(p, q)
        lh = self.eng.evaluate(p.next.next)
        if self.trace is not None:
            self.trace.write(f'T {p.number} {q.number} {lh:.9f} '
                             f'{self.end_lh:.9f}\n')

        if lh > self.best_of_node:
            self.best_of_node = lh
            self.insert_node = q
            self.remove_node = p
            self.current_zqr = list(self.zqr)
            self.current_lzr = list(self.lzr)
            self.current_lzq = list(self.lzq)
            self.current_lzs = list(self.lzs)
        if lh > self.end_lh:
            self.insert_node = q
            self.remove_node = p
            self.current_zqr = list(self.zqr)
            self.end_lh = lh

        tr.hookup(q, r, qz)
        p.next.back = p.next.next.back = None
        if self.thorough:
            s = p.back
            tr.hookup(p, s, pz)

        if self.do_cutoff and lh < start_lh:
            self.lh_avg += start_lh - lh
            self.lh_dec += 1
            return (start_lh - lh) < self.lh_cutoff
        return True

    # ------------------------------------------------------------------
    # batched lazy-SPR candidate scoring (the TPU-native form of the
    # addTraverseBIG/testInsertBIG walk, searchAlgo.c:682-798): all
    # insertion candidates of one pruned subtree are scored in a few
    # device waves — synthetic newview ops build the "proximal" CLVs
    # (the view from each insertion edge back toward the prune junction)
    # and the candidate junction CLVs in scratch buffer rows, then one
    # batched evaluate scores every candidate. The sequential cutoff /
    # best-insertion bookkeeping is replayed host-side in traversal
    # order, so results match the reference walk exactly (each lazy
    # score is independent of evaluation order).

    def _batched_dfs(self, p: Node, p1: Node, p2: Node,
                     mintrav: int, maxtrav: int):
        """Enumerate the candidate insertions below p1/p2 after pruning p
        (mirrors the four addTraverseBIG calls of rearrangeBIG) together
        with the proximal-CLV op graph they need."""
        tr = self.tr
        s = p.back
        p_group = (self._subtree_group(s)
                   if self.constraint is not None else None)

        cands: List[dict] = []
        prox_ops: List[dict] = []
        walked: List[Node] = []

        def new_prox(src1, z1, src2, z2, tip_tip, sub=False):
            # sub: z2 is the pruned junction branch (the makenewz result) —
            # under speculation a placeholder whose real value the device
            # substitutes from the in-flight NR handle
            prox_ops.append(dict(src1=src1, z1=list(z1), src2=src2,
                                 z2=list(z2), tip_tip=tip_tip, sub=sub))
            return len(prox_ops) - 1

        def walk(q, mintrav, maxtrav, parent, vkey):
            walked.append(q)
            mintrav -= 1
            new_parent = parent
            if mintrav <= 0:
                scored = True
                if self.constraint is not None:
                    q_group = self._subtree_group(q)
                    r_group = self._subtree_group(q.back)
                    if p_group != q_group and p_group != r_group:
                        scored = False       # skipped, walk continues
                if scored:
                    zp = [min(max(math.sqrt(zi), C.ZMIN), C.ZMAX)
                          for zi in q.z]
                    cands.append(dict(u=q, parent=parent, vkey=vkey,
                                      zprime=zp, z0=list(q.z)))
                    new_parent = len(cands) - 1
            maxtrav -= 1
            if not tr.is_tip(q.number) and maxtrav > 0:
                c1 = q.next.back
                c2 = q.next.next.back
                # view at q toward child c = combine(view at q.back toward
                # q [= vkey's CLV] over branch q.z, distal CLV of the
                # other child over its branch)
                k1 = new_prox(('prox', vkey), q.z, ('row', c2.number),
                              c2.z, False)
                k2 = new_prox(('prox', vkey), q.z, ('row', c1.number),
                              c1.z, False)
                walk(c1, mintrav, maxtrav, new_parent, k1)
                walk(c2, mintrav, maxtrav, new_parent, k2)

        for a, b in ((p1, p2), (p2, p1)):
            if tr.is_tip(a.number):
                continue
            r0 = a.next.back
            r1 = a.next.next.back
            # root proximal views at a: the pruned branch is now the
            # direct a--b hookup with the freshly optimized zqr (= a.z)
            k0 = new_prox(('row', r1.number), r1.z, ('row', b.number), a.z,
                          tr.is_tip(r1.number) and tr.is_tip(b.number),
                          sub=True)
            k1 = new_prox(('row', r0.number), r0.z, ('row', b.number), a.z,
                          tr.is_tip(r0.number) and tr.is_tip(b.number),
                          sub=True)
            walk(r0, mintrav, maxtrav, -1, k0)
            walk(r1, mintrav, maxtrav, -1, k1)

        return cands, prox_ops, walked

    def _dispatch_side(self, p: Node, p1: Node, p2: Node,
                       mintrav: int, maxtrav: int, zqr_dev=None):
        """Dispatch every candidate wave of one pruned side WITHOUT
        fetching. Returns a side spec (None when no candidates): cands
        metadata plus device handles per segment; _fetch_sides
        materializes the handles and _replay_side runs the sequential
        testInsertBIG bookkeeping. zqr_dev is the device-resident junction
        NR result under speculation (the root proximal ops' descriptors
        then carry placeholders substituted on device)."""
        tr = self.tr
        eng = self.eng
        s = p.back
        cands, prox_ops, walked = self._batched_dfs(p, p1, p2, mintrav,
                                                    maxtrav)
        if not cands:
            return None

        # 1. make every distal source CLV valid in the main buffer
        entries: List[TraversalEntry] = []
        for node in [s, p1, p2] + walked:
            if not tr.is_tip(node.number) and not node.x:
                entries += partial_traversal(tr, node)
        if entries:
            eng._run_traversal(entries)

        # 2. score in segments bounded by the scratch-row pool
        segs = []
        cap = eng.n_scratch
        i0 = 0
        while i0 < len(cands):
            seg: List[int] = []
            needed: dict = {}            # prox key -> insertion order
            i = i0
            while i < len(cands):
                chain = []
                k = cands[i]['vkey']
                while k is not None and k not in needed:
                    chain.append(k)
                    src1 = prox_ops[k]['src1']
                    k = src1[1] if src1[0] == 'prox' else None
                if seg and len(needed) + len(chain) + len(seg) + 1 > cap:
                    break
                for k2 in reversed(chain):
                    needed[k2] = None
                seg.append(i)
                i += 1

            base = eng.scratch_base
            prox_row = {}
            syn: List[TraversalEntry] = []
            sub: List[bool] = []
            for j, k in enumerate(needed):
                row = base + j
                prox_row[k] = row
                op = prox_ops[k]
                q_num = (prox_row[op['src1'][1]]
                         if op['src1'][0] == 'prox' else op['src1'][1])
                syn.append(TraversalEntry(
                    TIP_TIP if op['tip_tip'] else INNER_INNER,
                    row, q_num, op['src2'][1], op['z1'], op['z2']))
                sub.append(op['sub'])
            if zqr_dev is None:
                sub = None
            jbase = base + len(needed)
            if self.thorough:
                # batched thorough wave: the whole insertBIG + localSmooth
                # + evaluate pipeline per candidate, one dispatch
                u_rows, v_rows, j_rows, z0 = [], [], [], []
                for jj, ci in enumerate(seg):
                    c = cands[ci]
                    u_rows.append(c['u'].number)
                    v_rows.append(prox_row[c['vkey']])
                    j_rows.append(jbase + jj)
                    z0.append(c['z0'][0])
                eng._run_traversal(syn, sub_mask=sub, zqr_sub=zqr_dev)
                handles = eng.thorough_score_wave_lazy(
                    s.number, u_rows, v_rows, j_rows, z0)
                segs.append(dict(idx=seg, handles=handles, n=len(seg)))
            else:
                p_rows, q_rows, zs = [], [], []
                for jj, ci in enumerate(seg):
                    c = cands[ci]
                    u = c['u']
                    jrow = jbase + jj
                    tt = tr.is_tip(s.number) and tr.is_tip(u.number)
                    # candidate junction CLV: pruned subtree (via its old
                    # branch p.z) joined with the walked node's distal CLV
                    # over the lazy half-branch z' (insertBIG lazy path)
                    syn.append(TraversalEntry(
                        TIP_TIP if tt else INNER_INNER,
                        jrow, s.number, u.number, list(p.z), c['zprime']))
                    p_rows.append(jrow)
                    q_rows.append(prox_row[c['vkey']])
                    zs.append(c['zprime'])
                if sub is not None:
                    sub = sub + [False] * len(seg)
                handle = eng.traverse_and_score_lazy(
                    syn, p_rows, q_rows, np.asarray(zs),
                    sub_mask=sub, zqr_sub=zqr_dev)
                segs.append(dict(idx=seg, handle=handle, n=len(seg)))
            i0 = i
        return dict(p=p, cands=cands, segs=segs)

    def _fetch_sides(self, sides):
        """Materialize every device handle of the given side specs in ONE
        synchronization point."""
        handles, slots = [], []
        for side in sides:
            if 'zqr_handle' in side:
                handles.append(side['zqr_handle'])
                slots.append((side, 'zqr'))
            for seg in side['segs']:
                if 'handles' in seg:                       # thorough
                    for h, f in zip(seg['handles'],
                                    ('raw', 'e1', 'e2', 'e3')):
                        handles.append(h)
                        slots.append((seg, f))
                else:
                    handles.append(seg['handle'])
                    slots.append((seg, 'raw'))
        if not handles:
            return
        vals = self.eng.fetch(handles, kind='spec_fetch')
        for (obj, f), v in zip(slots, vals):
            obj[f] = v
        for side in sides:
            for seg in side['segs']:
                # raw is per-partition [M, L] for both wave kinds
                seg['scores'] = seg['raw'][:, :seg['n']].sum(axis=0)

    def _replay_side(self, side):
        """Step 3: replay testInsertBIG bookkeeping in traversal order
        over the fetched scores (each lazy score is independent of
        evaluation order, so this matches the reference walk exactly)."""
        p = side['p']
        cands = side['cands']
        scores = np.empty(len(cands))
        for seg in side['segs']:
            scores[seg['idx']] = seg['scores'][:seg['n']]
            if self.thorough:
                for jj, ci in enumerate(seg['idx']):
                    cands[ci]['lz'] = (float(seg['e1'][jj]),
                                       float(seg['e2'][jj]),
                                       float(seg['e3'][jj]))
        cut = [False] * len(cands)
        for i, c in enumerate(cands):
            if c['parent'] >= 0 and cut[c['parent']]:
                cut[i] = True            # ancestor was cut: never tested
                continue
            lh = float(scores[i])
            if self.trace is not None:
                self.trace.write(f'T {p.number} {c["u"].number} {lh:.9f} '
                                 f'{self.end_lh:.9f}\n')
            start_lh = self.end_lh
            if lh > self.best_of_node:
                self.best_of_node = lh
                self.insert_node = c['u']
                self.remove_node = p
                self.current_zqr = list(self.zqr)
                if self.thorough:
                    e1, e2, e3 = c['lz']
                    self.current_lzq = [e1] * len(self.lzq)
                    self.current_lzr = [e2] * len(self.lzr)
                    self.current_lzs = [e3] * len(self.lzs)
                else:
                    self.current_lzr = list(self.lzr)
                    self.current_lzq = list(self.lzq)
                    self.current_lzs = list(self.lzs)
            if lh > self.end_lh:
                self.insert_node = c['u']
                self.remove_node = p
                self.current_zqr = list(self.zqr)
                self.end_lh = lh
            if self.do_cutoff and lh < start_lh:
                self.lh_avg += start_lh - lh
                self.lh_dec += 1
                if not ((start_lh - lh) < self.lh_cutoff):
                    cut[i] = True

    def _batched_rearrange_side(self, p: Node, p1: Node, p2: Node,
                                mintrav: int, maxtrav: int):
        """Synchronous batched side scoring: dispatch, fetch, replay. On
        the fused-program path the junction branch still flows through the
        device substitution (re-uploading the fetched zqr bit-exactly), so
        the speculative and synchronous drivers run the identical device
        computation."""
        import jax.numpy as jnp
        zdev = (jnp.asarray(self.zqr, jnp.float32)
                if self.sub_capable else None)
        side = self._dispatch_side(p, p1, p2, mintrav, maxtrav,
                                   zqr_dev=zdev)
        if side is None:
            return
        self._fetch_sides([side])
        self._replay_side(side)

    def add_traverse_big(self, p: Node, q: Node, mintrav: int, maxtrav: int):
        mintrav -= 1
        if mintrav <= 0:
            if not self.test_insert_big(p, q):
                return
        maxtrav -= 1
        if (not self.tr.is_tip(q.number)) and maxtrav > 0:
            self.add_traverse_big(p, q.next.back, mintrav, maxtrav)
            self.add_traverse_big(p, q.next.next.back, mintrav, maxtrav)

    def rearrange_big(self, p: Node, mintrav: int, maxtrav: int) -> int:
        tr = self.tr
        if maxtrav < 1 or mintrav > maxtrav:
            return 0
        q = p.back
        batched = (self.batch_thorough if self.thorough
                   else self.batch_lazy)

        if not tr.is_tip(p.number):
            p1 = p.next.back
            p2 = p.next.next.back
            if not tr.is_tip(p1.number) or not tr.is_tip(p2.number):
                p1z = list(p1.z)
                p2z = list(p2.z)
                self.remove_node_big(p)
                if batched:
                    self._batched_rearrange_side(p, p1, p2, mintrav, maxtrav)
                else:
                    if not tr.is_tip(p1.number):
                        self.add_traverse_big(p, p1.next.back, mintrav,
                                              maxtrav)
                        self.add_traverse_big(p, p1.next.next.back, mintrav,
                                              maxtrav)
                    if not tr.is_tip(p2.number):
                        self.add_traverse_big(p, p2.next.back, mintrav,
                                              maxtrav)
                        self.add_traverse_big(p, p2.next.next.back, mintrav,
                                              maxtrav)
                tr.hookup(p.next, p1, p1z)
                tr.hookup(p.next.next, p2, p2z)
                self.eng.newview(p)

        if not tr.is_tip(q.number) and maxtrav > 0:
            q1 = q.next.back
            q2 = q.next.next.back
            if ((not tr.is_tip(q1.number)
                 and (not tr.is_tip(q1.next.back.number)
                      or not tr.is_tip(q1.next.next.back.number)))
                    or (not tr.is_tip(q2.number)
                        and (not tr.is_tip(q2.next.back.number)
                             or not tr.is_tip(q2.next.next.back.number)))):
                q1z = list(q1.z)
                q2z = list(q2.z)
                self.remove_node_big(q)
                mintrav2 = max(mintrav, 2)
                if batched:
                    self._batched_rearrange_side(q, q1, q2, mintrav2,
                                                 maxtrav)
                else:
                    if not tr.is_tip(q1.number):
                        self.add_traverse_big(q, q1.next.back, mintrav2,
                                              maxtrav)
                        self.add_traverse_big(q, q1.next.next.back, mintrav2,
                                              maxtrav)
                    if not tr.is_tip(q2.number):
                        self.add_traverse_big(q, q2.next.back, mintrav2,
                                              maxtrav)
                        self.add_traverse_big(q, q2.next.next.back, mintrav2,
                                              maxtrav)
                tr.hookup(q.next, q1, q1z)
                tr.hookup(q.next.next, q2, q2z)
                self.eng.newview(q)
        return 1

    def _scan_best_list(self, bt: BestList, previous_lh: float, lh: float,
                        best_t: BestList, epsilon: float):
        """Re-evaluate every bt candidate (recall + treeEvaluate(0.25) +
        improvement bookkeeping, searchAlgo.c computeBIGRAPID's bt scan).
        On the accelerator all candidates' smooth+evaluate programs are
        dispatched lazily and fetched in ONE round trip; the bookkeeping
        replays sequentially. Returns (impr, lh)."""
        eng = self.eng
        tr = self.tr
        impr = False
        specs = None
        if self.speculate:
            specs = []
            for i in range(1, bt.nvalid + 1):
                # restore the candidate and repair its CLVs with a
                # dispatch-only full traversal — the sequential path's
                # _recall pays a full evaluate SYNC here whose lnl value
                # is never used by the scan
                bt.recall(i, tr)
                eng._run_traversal(full_traversal(tr, tr.start.back))
                spec = eng.tree_evaluate_lazy(0.25)
                if spec is None:
                    specs = None
                    break
                specs.append(spec)
        if specs is not None:
            handles = [h for s in specs for h in (s['z'], s['lhs'])]
            vals = eng.fetch(handles, kind='bestlist_scan')
            for i, spec in enumerate(specs):
                znew, lhs = vals[2 * i], vals[2 * i + 1]
                # topology-only restore: bt.save snapshots the host tree
                bt.recall(i + 1, tr)
                lnl = eng.tree_evaluate_finish(spec, znew, lhs)
                difference = abs(lnl - previous_lh)
                if lnl > lh and difference > epsilon:
                    impr = True
                    lh = lnl
                    best_t.save(self.tr, lnl, keep_identical=True)
            return impr, lh
        for i in range(1, bt.nvalid + 1):
            self._recall(bt, i)
            eng.tree_evaluate(0.25)
            difference = abs(eng.likelihood - previous_lh)
            if eng.likelihood > lh and difference > epsilon:
                impr = True
                lh = eng.likelihood
                best_t.save(self.tr, eng.likelihood, keep_identical=True)
        return impr, lh

    def rearrange_dispatch(self, p: Node, mintrav: int, maxtrav: int):
        """rearrange_big's dispatch phase for the speculative driver:
        prune both positions, dispatch the candidate waves lazily (the
        junction NR runs on device and its result is substituted into the
        wave descriptors there), restore the tree. Returns a node spec for
        rearrange_replay, or None when rearrange_big would return 0."""
        tr = self.tr
        if maxtrav < 1 or mintrav > maxtrav:
            return None
        q = p.back
        sides = []

        if not tr.is_tip(p.number):
            p1 = p.next.back
            p2 = p.next.next.back
            if not tr.is_tip(p1.number) or not tr.is_tip(p2.number):
                p1z = list(p1.z)
                p2z = list(p2.z)
                _, zdev = self.remove_node_big_lazy(p)
                side = self._dispatch_side(p, p1, p2, mintrav, maxtrav,
                                           zqr_dev=zdev)
                if side is not None:
                    side['zqr_handle'] = zdev
                    sides.append(side)
                tr.hookup(p.next, p1, p1z)
                tr.hookup(p.next.next, p2, p2z)
                self.eng.newview(p)

        if not tr.is_tip(q.number) and maxtrav > 0:
            q1 = q.next.back
            q2 = q.next.next.back
            if ((not tr.is_tip(q1.number)
                 and (not tr.is_tip(q1.next.back.number)
                      or not tr.is_tip(q1.next.next.back.number)))
                    or (not tr.is_tip(q2.number)
                        and (not tr.is_tip(q2.next.back.number)
                             or not tr.is_tip(q2.next.next.back.number)))):
                q1z = list(q1.z)
                q2z = list(q2.z)
                _, zdev = self.remove_node_big_lazy(q)
                side = self._dispatch_side(q, q1, q2, max(mintrav, 2),
                                           maxtrav, zqr_dev=zdev)
                if side is not None:
                    side['zqr_handle'] = zdev
                    sides.append(side)
                tr.hookup(q.next, q1, q1z)
                tr.hookup(q.next.next, q2, q2z)
                self.eng.newview(q)
        return dict(node=p, sides=sides)

    def rearrange_replay(self, spec):
        """Replay the bookkeeping of one dispatched node after its handles
        were fetched (mutates best_of_node / end_lh / cutoff state exactly
        like the synchronous rearrange_big)."""
        for side in spec['sides']:
            self.zqr = [float(v) for v in side['zqr']]
            self._replay_side(side)

    def _spr_pass(self, nodes, mintrav: int, maxtrav: int, on_node):
        """Run the rearrangement loop over `nodes`, calling on_node(node)
        after each node's bookkeeping (on_node returns True when it
        APPLIED an improvement, i.e. changed the tree).

        On accelerators this speculates: the device programs of up to
        spec_depth consecutive prune nodes are dispatched without any
        host sync (assuming no intervening applies), the whole batch is
        fetched in ONE round trip, and the sequential bookkeeping is
        replayed; at the first applied improvement the remaining
        speculated results are discarded and re-dispatched against the
        updated tree. A misprediction leaves only benignly-stale CLV
        refreshes — the same staleness class the reference's lazy SPR
        embraces (it trusts x-flags across restoreTreeFast,
        newviewGenericSpecial.c:691-813)."""
        batched = self.batch_thorough if self.thorough else self.batch_lazy
        if not (self.speculate and batched):
            for node in nodes:
                self.best_of_node = C.UNLIKELY
                if self.rearrange_big(node, mintrav, maxtrav):
                    on_node(node)
            return
        i = 0
        depth = 1
        while i < len(nodes):
            batch = nodes[i:i + depth]
            specs = [self.rearrange_dispatch(n, mintrav, maxtrav)
                     for n in batch]
            self._fetch_sides([side for spec in specs if spec
                               for side in spec['sides']])
            mispredicted = False
            for j, spec in enumerate(specs):
                i += 1
                if spec is None:
                    continue
                self.best_of_node = C.UNLIKELY
                self.rearrange_replay(spec)
                if on_node(batch[j]) and j < len(specs) - 1:
                    mispredicted = True
                    break
            depth = 1 if mispredicted else min(2 * depth, self.spec_depth)

    def test_insert_restore_big(self, p: Node, q: Node):
        tr = self.tr
        if self.thorough:
            if self.batch_thorough:
                # fused apply: insertBIG's three NR fits + localSmooth +
                # evaluate in ONE dispatch/fetch (the host path costs 4
                # separate syncs; searchAlgo.c:495-536 + :270)
                eng = self.eng
                B = eng.num_branches
                r = q.back
                s = p.back
                self.lzi = list(q.z)
                per, e1, e2, e3 = eng.apply_thorough(p, q)
                tr.hookup(p.next, q, [e1] * B)
                tr.hookup(p.next.next, r, [e2] * B)
                tr.hookup(p, s, [e3] * B)
                eng.newview(p)
                self.lzq = list(p.next.z)
                self.lzr = list(p.next.next.z)
                self.lzs = list(p.z)
                eng.per_partition_lh = np.asarray(per, np.float64)
                eng.likelihood = float(eng.per_partition_lh.sum())
                return
            self.insert_big(p, q)
            self.eng.evaluate(p.next.next)
        else:
            self.insert_restore_big(p, q)
            x = p.next.next
            y = p.back
            while ((not tr.is_tip(x.number) and not x.x)
                   or (not tr.is_tip(y.number) and not y.x)):
                if not tr.is_tip(x.number) and not x.x:
                    self.eng.newview(x)
                if not tr.is_tip(y.number) and not y.x:
                    self.eng.newview(y)
            self.eng.likelihood = self.end_lh

    def restore_tree_fast(self):
        if self.trace is not None:
            self.trace.write(f'A {self.remove_node.number} '
                             f'{self.insert_node.number}\n')
        self.remove_node_restore_big(self.remove_node)
        self.test_insert_restore_big(self.remove_node, self.insert_node)

    def restore_topology_only(self, bt: BestList):
        """Virtually apply the best insertion for this prune node, record
        the topology in bt, then revert (searchAlgo.c:618)."""
        tr = self.tr
        p = self.remove_node
        q = self.insert_node
        current_lh = self.eng.likelihood

        p1 = p.next.back
        p2 = p.next.next.back
        p1z = list(p1.z)
        p2z = list(p2.z)
        tr.hookup(p1, p2, self.current_zqr)
        p.next.back = p.next.next.back = None
        qz = list(q.z)
        pz = list(p.z)
        r = q.back
        s = p.back
        if self.thorough:
            tr.hookup(p.next, q, self.current_lzq)
            tr.hookup(p.next.next, r, self.current_lzr)
            tr.hookup(p, s, self.current_lzs)
        else:
            z = [min(max(math.sqrt(zi), C.ZMIN), C.ZMAX) for zi in q.z]
            tr.hookup(p.next, q, z)
            tr.hookup(p.next.next, r, z)

        bt.save(tr, self.best_of_node, keep_identical=True)
        if self.best_ml is not None:
            self.best_ml.save(tr, self.best_of_node, keep_identical=False)

        tr.hookup(q, r, qz)
        p.next.back = p.next.next.back = None
        if self.thorough:
            tr.hookup(p, s, pz)
        tr.hookup(p.next, p1, p1z)
        tr.hookup(p.next.next, p2, p2z)
        self.eng.likelihood = current_lh

    # ------------------------------------------------------------------
    # one SPR cycle over all nodes

    def tree_optimize_rapid(self, mintrav: int, maxtrav: int,
                            bt: BestList) -> float:
        tr = self.tr
        eng = self.eng
        node_rectifier(tr)
        maxtrav = min(maxtrav, tr.mxtips - 3)
        self.ilist.reset()
        bt.reset()
        self.start_lh = self.end_lh = eng.likelihood
        if self.trace is not None:
            self.trace.write(f'C {eng.likelihood:.9f} {maxtrav} '
                             f'{int(self.thorough)}\n')

        if self.do_cutoff:
            factor = 0.5 if self.big_cutoff else 1.0
            if self.it_count == 0:
                self.lh_cutoff = factor * (eng.likelihood / -1000.0)
            elif self.lh_dec == 0:
                # no candidate decreased the likelihood last cycle; the
                # reference's 0/0 yields NaN whose comparisons are false,
                # i.e. the cutoff never fires — +inf reproduces that
                self.lh_cutoff = math.inf
            else:
                self.lh_cutoff = factor * (self.lh_avg / self.lh_dec)
            self.it_count += 1
            self.lh_avg = 0.0
            self.lh_dec = 0

        def on_node(node):
            if self.thorough:
                if self.end_lh > self.start_lh:
                    self.restore_tree_fast()
                    self.start_lh = self.end_lh = eng.likelihood
                    bt.save(tr, eng.likelihood, keep_identical=True)
                    if self.best_ml is not None:
                        self.best_ml.save(tr, eng.likelihood,
                                          keep_identical=False)
                    return True
                elif self.best_of_node != C.UNLIKELY:
                    self.restore_topology_only(bt)
                return False
            self.ilist.insert(node, self.best_of_node)
            if self.end_lh > self.start_lh:
                self.restore_tree_fast()
                self.start_lh = self.end_lh = eng.likelihood
                return True
            return False

        self._spr_pass([tr.nodep[i] for i in range(1, 2 * tr.mxtips - 1)],
                       mintrav, maxtrav, on_node)

        if not self.thorough:
            self.thorough = True

            def on_best(node):
                if self.end_lh > self.start_lh:
                    self.restore_tree_fast()
                    self.start_lh = self.end_lh = eng.likelihood
                    bt.save(tr, eng.likelihood, keep_identical=True)
                    return True
                elif self.best_of_node != C.UNLIKELY:
                    self.restore_topology_only(bt)
                return False

            self._spr_pass(
                [n for n in self.ilist.nodes[:self.ilist.valid]
                 if n is not None],
                mintrav, maxtrav, on_best)
            self.thorough = False

        return self.start_lh

    # ------------------------------------------------------------------
    # rearrangement-radius auto-tuning (determineRearrangementSetting :1752)

    def determine_rearrangement_setting(self, best_t: BestList,
                                        bt: BestList,
                                        resume=None) -> int:
        tr = self.tr
        eng = self.eng
        MAX_FAST = 26
        maxtrav = 5
        best_trav = 5
        start_lh = eng.likelihood
        impr = True
        cutoff = self.do_cutoff
        if resume is not None:
            # re-enter the radius loop from a REARR_SETTING checkpoint
            # (searchAlgo.c:1769-1780)
            maxtrav = resume.get('maxtrav', maxtrav)
            best_trav = resume.get('best_trav', best_trav)
            start_lh = resume.get('start_lh', start_lh)
            impr = resume.get('impr', impr)
            cutoff = resume.get('cutoff', cutoff)
        self.do_cutoff = False
        bt.reset()
        assert not self.thorough

        while impr and maxtrav < MAX_FAST:
            self._recall(best_t, 1)
            self._write_checkpoint(
                'REARR_SETTING', maxtrav=maxtrav, best_trav=best_trav,
                start_lh=start_lh, impr=impr, cutoff=cutoff)
            node_rectifier(tr)
            maxtrav = min(maxtrav, tr.mxtips - 3)
            self.start_lh = self.end_lh = eng.likelihood

            def on_node(node):
                if self.end_lh > self.start_lh:
                    self.restore_tree_fast()
                    self.start_lh = self.end_lh = eng.likelihood
                    return True
                return False

            self._spr_pass(
                [tr.nodep[i] for i in range(1, 2 * tr.mxtips - 1)],
                1, maxtrav, on_node)

            eng.tree_evaluate(0.25)
            bt.save(tr, eng.likelihood, keep_identical=True)
            if self.best_ml is not None:
                self.best_ml.save(tr, eng.likelihood, keep_identical=False)

            if eng.likelihood > start_lh:
                start_lh = eng.likelihood
                self.log_fn(eng.likelihood)
                best_trav = maxtrav
                impr = True
            else:
                impr = False

            # dead branch kept for parity: the reference has the identical
            # `if(tr->doCutoff)` block right after setting doCutoff = FALSE
            # (searchAlgo.c:1783, 1884-1892) — it can never fire there either
            if self.do_cutoff:
                self.lh_cutoff = (self.lh_avg / self.lh_dec
                                  if self.lh_dec else math.inf)
                self.it_count += 1
                self.lh_avg = 0.0
                self.lh_dec = 0
            maxtrav += 5

        self._recall(bt, 1)
        self.do_cutoff = cutoff
        return best_trav

    def _recall(self, bl: BestList, rank: int):
        snap = bl.recall(rank, self.tr)
        if snap is not None:
            self.eng.evaluate(self.tr.start, full_traversal_=True)

    # ------------------------------------------------------------------
    # RF convergence bookkeeping

    def _bipartitions(self, tr=None):
        """Set of non-trivial bipartitions; native treekernel hashes when
        the library is available (bipartitionList.c convergenceCriterion
        :541 analogue, O(n) C instead of O(n^2) Python sets), else
        frozensets of tip numbers. Both forms support the symmetric
        difference the RF criterion needs."""
        tr = tr or self.tr
        from ..native import bipartition_hashes
        h = bipartition_hashes(tr)
        if h is not None:
            return frozenset(int(x) for x in h)
        bips = set()

        def rec(p: Node):
            if tr.is_tip(p.number):
                return frozenset((p.number,))
            below = rec(p.next.back) | rec(p.next.next.back)
            bips.add(below)
            return below

        root = tr.nodep[1].back
        rec(root)
        bips.discard(frozenset(range(1, tr.mxtips + 1)))
        # remove the trivial bipartition adjacent to the root tip
        full = frozenset(range(1, tr.mxtips + 1))
        bips.discard(full - frozenset((1,)))
        return bips

    def restore_rf_state(self, tree0: str, tree1: str):
        """Rebuild the two RF slots from checkpointed Newick strings."""
        from ..io.newick import parse_newick
        for slot, nwk in enumerate((tree0, tree1)):
            if not nwk:
                continue
            tmp = Tree(self.tr.taxon_names,
                       num_branches=self.tr.num_branches)
            parse_newick(nwk, tmp)
            self.rf_slots[slot] = self._bipartitions(tmp)
            self.rf_newicks[slot] = nwk

    def _rf_converged(self, iteration: int) -> bool:
        if not self.search_convergence:
            return False
        from ..io.newick import write_newick
        current = self._bipartitions()
        slot = iteration % 2
        prev = self.rf_slots[1 - slot]
        self.rf_slots[slot] = current
        self.rf_newicks[slot] = write_newick(self.tr)
        if iteration > 0 and prev is not None:
            rf = len(current.symmetric_difference(prev))
            rrf = rf / (2.0 * (self.tr.mxtips - 3))
            if rrf <= 0.01:
                return True
        return False

    # ------------------------------------------------------------------
    # the full hill-climbing search (computeBIGRAPID :1914)

    def _write_checkpoint(self, phase: str, **vars_):
        if self.checkpointer is None:
            return
        self.checkpointer(phase, self, vars_)

    def compute_big_rapid(self, mod_opt_fn=None, estimate_model: bool = True,
                          resume=None):
        """The full hill-climbing search; `resume` is an optional dict
        {'phase': 'FAST_SPRS'|'SLOW_SPRS', ...loop variables} saved by the
        checkpointer (the analogue of the reference's goto START_FAST_SPRS /
        START_SLOW_SPRS re-entry, searchAlgo.c:2066-2070)."""
        tr = self.tr
        eng = self.eng

        best_t = BestList(1)
        bt = BestList(20)
        self.ilist.reset()

        difference = 10.0
        epsilon = 0.01
        self.thorough = False

        fast_iterations = 0
        thorough_iterations = 0
        lh = previous_lh = C.UNLIKELY
        best_trav = self.initial_radius or 5
        impr = True

        if resume is None:
            if estimate_model:
                mod_opt_fn(10.0)
            else:
                eng.tree_evaluate(2.0)
            self.log_fn(eng.likelihood)

            best_t.save(tr, eng.likelihood, keep_identical=True)

            if self.initial_radius is not None:
                best_trav = self.initial_radius
            else:
                best_trav = self.determine_rearrangement_setting(best_t, bt)

            if estimate_model:
                mod_opt_fn(5.0)
            else:
                eng.tree_evaluate(1.0)

            best_t.save(tr, eng.likelihood, keep_identical=True)

            if self.do_cutoff:
                self.it_count = 0
        elif resume['phase'] == 'REARR_SETTING':
            # re-enter the radius auto-tune loop from its checkpoint
            # (restart dispatch searchAlgo.c:1726-1735 + 2019-2024): skip
            # the first modOpt (the checkpointed tree/model carry it), run
            # the remaining radius probes, then continue like a fresh run
            eng.evaluate(tr.start, full_traversal_=True)
            best_t.save(tr, eng.likelihood, keep_identical=True)
            best_trav = self.determine_rearrangement_setting(
                best_t, bt, resume=resume)
            if estimate_model:
                mod_opt_fn(5.0)
            else:
                eng.tree_evaluate(1.0)
            best_t.save(tr, eng.likelihood, keep_identical=True)
            if self.do_cutoff:
                self.it_count = 0
            resume = None
        else:
            # the checkpointed tree is already restored in `tr`
            eng.evaluate(tr.start, full_traversal_=True)
            best_t.save(tr, eng.likelihood, keep_identical=True)
            best_trav = resume.get('best_trav', best_trav)
            fast_iterations = resume.get('fast_iterations', 0)
            thorough_iterations = resume.get('thorough_iterations', 0)
            lh = previous_lh = resume.get('lh', eng.likelihood)
            impr = resume.get('impr', True)
            self.lh_cutoff = resume.get('lh_cutoff', 0.0)
            self.lh_avg = resume.get('lh_avg', 0.0)
            self.lh_dec = resume.get('lh_dec', 0)
            self.it_count = resume.get('it_count', 0)
            if self.search_convergence:
                self.restore_rf_state(resume.get('tree0', ''),
                                      resume.get('tree1', ''))

        if resume is None or resume['phase'] == 'FAST_SPRS':
            while impr:
                self._recall(best_t, 1)
                self._write_checkpoint(
                    'FAST_SPRS', impr=impr, best_trav=best_trav,
                    fast_iterations=fast_iterations, lh=lh,
                    lh_cutoff=self.lh_cutoff, lh_avg=self.lh_avg,
                    lh_dec=self.lh_dec, it_count=self.it_count)
                if self._rf_converged(fast_iterations):
                    break
                fast_iterations += 1
                eng.tree_evaluate(1.0)
                best_t.save(tr, eng.likelihood, keep_identical=True)
                self.log_fn(eng.likelihood)
                lh = previous_lh = eng.likelihood

                self.tree_optimize_rapid(1, best_trav, bt)

                impr, lh = self._scan_best_list(bt, previous_lh, lh,
                                                best_t, epsilon)

            # ------------- thorough (slow) SPR phase setup -------------
            self.rf_slots = [None, None]
            self.rf_newicks = ['', '']
            self.thorough = True
            impr = True
            self._recall(best_t, 1)
            eng.evaluate(tr.start, full_traversal_=True)
            if estimate_model:
                mod_opt_fn(1.0)
            else:
                eng.tree_evaluate(1.0)
            thorough_iterations = 0

        self.thorough = True
        rearrangements_min = 1
        rearrangements_max = self.step_width
        if resume is not None and resume['phase'] == 'SLOW_SPRS':
            rearrangements_min = resume.get('rearrangements_min', 1)
            rearrangements_max = resume.get('rearrangements_max',
                                            self.step_width)

        first = True
        while True:
            if not (first and resume is not None
                    and resume['phase'] == 'SLOW_SPRS'):
                self._recall(best_t, 1)
            first = False
            self._write_checkpoint(
                'SLOW_SPRS', impr=impr, best_trav=best_trav,
                fast_iterations=fast_iterations,
                thorough_iterations=thorough_iterations,
                rearrangements_min=rearrangements_min,
                rearrangements_max=rearrangements_max, lh=lh,
                lh_cutoff=self.lh_cutoff, lh_avg=self.lh_avg,
                lh_dec=self.lh_dec, it_count=self.it_count)
            if impr:
                rearrangements_min = 1
                rearrangements_max = self.step_width
                if self._rf_converged(thorough_iterations):
                    break
                thorough_iterations += 1
            else:
                rearrangements_max += self.step_width
                rearrangements_min += self.step_width
                if rearrangements_max > self.max_rearrange:
                    break

            eng.tree_evaluate(1.0)
            previous_lh = lh = eng.likelihood
            best_t.save(tr, eng.likelihood, keep_identical=True)
            self.log_fn(eng.likelihood)

            self.tree_optimize_rapid(rearrangements_min, rearrangements_max,
                                     bt)
            impr, lh = self._scan_best_list(bt, previous_lh, lh, best_t,
                                            epsilon)

        self._recall(best_t, 1)
        eng.evaluate(tr.start, full_traversal_=True)
        return eng.likelihood
