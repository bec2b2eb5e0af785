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
from ..traversal import (TIP_TIP, TIP_INNER, INNER_INNER, TraversalEntry,
                         full_traversal, partial_traversal)
from ..tree import Node, Tree
from .topologies import BestList, canonical_key

BAD_REAR = -1


class _WaveCtx:
    """Shared state of one speculative wave round: the virtual x-flag
    overlay, the CLV version map, and the scratch-row allocator span the
    whole batch, so a later prune node's recording reads an earlier
    node's in-flight scratch versions instead of main rows the earlier
    node has not committed yet."""

    def __init__(self, eng):
        self.vx = {}          # id(record) -> virtual x flag
        self.ver = {}         # node number -> (scratch row, entry gid)
        self.base = eng.scratch_base
        self.cap = eng.n_scratch
        self.nrows = 0
        self.gid = 0          # global recorded-entry counter


class _WaveRecorder:
    """Engine stand-in for phase A of the stale-exact batched SPR walk.

    The sequential walk's code (insert_big + the evaluate mirror,
    searchAlgo.c:484-777) runs unmodified against this object: the tree
    hookups happen for real, the x-flag evolution runs on a VIRTUAL
    overlay (the live flags change only when _commit_side applies the
    actually-tested candidates' orientations), and every CLV write is
    redirected to a fresh scratch-row *version* while reads resolve
    through the version map — falling back to the main row, i.e. the
    stale content the reference's partial traversals trust
    (newviewGenericSpecial.c:691-813). Nothing the recorder does touches
    main rows, so an entire speculated wave can be discarded for free.

    `reads` collects one token per CLV source consumed by the wave —
    (node, version gid or 'pre') — forming the fingerprint the
    speculative driver validates against the committed truth before
    trusting a speculated node's scores."""

    def __init__(self, spr, junction: int, sub_edge=None, ctx=None):
        eng = spr.eng
        self.spr = spr
        self.tr = eng.tree
        self.num_branches = eng.num_branches
        self.junction = junction       # node number whose CLV is never
        #                                read in-walk (elided; recomputed
        #                                for real by the side restore)
        self.sub_edge = sub_edge       # frozenset({a, b}): the pruned
        #                                junction edge whose z is a
        #                                device-substituted placeholder
        self.ctx = ctx if ctx is not None else _WaveCtx(eng)
        self.overflow = False
        self.cand = -1                 # candidate being recorded
        self.entries: List[TraversalEntry] = []
        self.entry_node: List[Optional[int]] = []   # original target node
        self.entry_writer: List[int] = []
        self.entry_gid: List[int] = []
        self.sub_flags: List[int] = []
        self.orient_log = []           # (record, candidate index)
        self.reads: List[tuple] = []   # (node, gid | 'pre') fingerprints
        # lazy scoring reads
        self.sc_p: List[int] = []
        self.sc_q: List[int] = []
        self.sc_z: List[list] = []
        # thorough wave arrays
        self.th_u: List[int] = []
        self.th_v: List[int] = []
        self.th_j: List[int] = []
        self.th_z0: List[list] = []    # per-candidate start z [B]

    # -- engine surface used by insert_big / the walk -------------------

    def newview(self, p: Node, masked: bool = False):
        if self.tr.is_tip(p.number):
            return
        self._record(p)

    def makenewz(self, p: Node, q: Node, z0, maxiter: int,
                 mask: bool = False):
        if not self._flag(p):
            self._record(p)
        if not self._flag(q):
            self._record(q)
        return list(z0)

    def local_smooth(self, p: Node, maxtimes: int):
        # one validation pass mirrors engine.local_smooth exactly: later
        # passes find every x-flag already oriented and record nothing
        # (the junction ring's own churn is elided), so the recorded set
        # is independent of the device-valued convergence pass count
        q = p
        while True:
            self.makenewz(q, q.back, list(q.back.z), C.NEWZPERCYCLE)
            q = q.next
            if q is p:
                break

    def score_lazy(self, e: Node):
        """engine.evaluate(e) of the lazy testInsertBIG: record the
        junction CLV op + any x-governed recomputes, and the (junction,
        proximal, z') scoring read."""
        r = e.back
        assert not self._flag(e)
        jrow = self._record(e, keep_top=True)
        if not self._flag(r):
            self._record(r)
        self.sc_p.append(jrow)
        self.sc_q.append(self._read(r.number))
        self.sc_z.append(list(r.z))

    def score_thorough(self, u: Node, r: Node, z0):
        """The thorough wave re-runs insertBIG's three NR fits +
        localSmooth + evaluate on-device from (s, distal, proximal) CLVs
        (engine.thorough_score_wave_lazy); the validations were already
        recorded by the makenewz/newview/local_smooth sims, and the
        sequential evaluate adds none (both endpoints' x-flags are set by
        then)."""
        self.th_u.append(self._read(u.number))
        self.th_v.append(self._read(r.number))
        self.th_j.append(self._alloc())
        self.th_z0.append(list(z0))

    # -- internals -------------------------------------------------------

    def _flag(self, rec: Node) -> bool:
        if self.tr.is_tip(rec.number):
            return True
        return self.ctx.vx.get(id(rec), bool(rec.x))

    def _orient(self, p: Node):
        self.orient_log.append((p, self.cand))
        vx = self.ctx.vx
        vx[id(p)] = True
        s = p.next
        while s is not p:
            vx[id(s)] = False
            s = s.next

    def _read(self, n: int) -> int:
        """Resolve a CLV read and log its content fingerprint."""
        v = self.ctx.ver.get(n)
        if v is None:
            self.reads.append((n, 'pre'))
            return n
        self.reads.append((n, v[1]))
        return v[0]

    def _alloc(self) -> int:
        ctx = self.ctx
        if ctx.nrows >= ctx.cap:
            self.overflow = True
            return ctx.base
        row = ctx.base + ctx.nrows
        ctx.nrows += 1
        return row

    def _record(self, top: Node, keep_top: bool = False):
        """The live compute_traversal logic (traversal.py:41, partial)
        against the virtual x overlay, redirecting writes to versioned
        scratch rows. Returns the top's row when keep_top (the scored
        junction CLV); junction-targeted entries are otherwise elided —
        their value is never read in-walk and the side restore recomputes
        the junction row for real."""
        tmp: List[TraversalEntry] = []
        self._sim_traversal(top, tmp)
        jrow = None
        for i, e in enumerate(tmp):
            if e.p_number == self.junction:
                if not (keep_top and i == len(tmp) - 1):
                    continue
            sub = 0
            if self.sub_edge is not None:
                if frozenset((e.q_number, e.p_number)) == self.sub_edge:
                    sub |= 2
                if frozenset((e.r_number, e.p_number)) == self.sub_edge:
                    sub |= 1
            q_row = self._read(e.q_number)
            r_row = self._read(e.r_number)
            row = self._alloc()
            gid = self.ctx.gid
            self.ctx.gid += 1
            if e.p_number == self.junction:
                jrow = row
                self.entry_node.append(None)
            else:
                self.ctx.ver[e.p_number] = (row, gid)
                self.entry_node.append(e.p_number)
            self.entries.append(TraversalEntry(e.tip_case, row, q_row,
                                               r_row, e.qz, e.rz))
            self.entry_writer.append(self.cand)
            self.entry_gid.append(gid)
            self.sub_flags.append(sub)
        return jrow

    def _sim_traversal(self, p: Node, entries: List[TraversalEntry]):
        """compute_traversal (traversal.py:41) with the x-flags read from
        and oriented into the virtual overlay."""
        tr = self.tr
        if tr.is_tip(p.number):
            return
        q = p.next.back
        r = p.next.next.back
        q_tip = tr.is_tip(q.number)
        r_tip = tr.is_tip(r.number)
        if q_tip and r_tip:
            if not self._flag(p):
                self._orient(p)
            tip_case = TIP_TIP
        elif q_tip or r_tip:
            if r_tip:
                q, r = r, q
            if not self._flag(r):
                self._sim_traversal(r, entries)
            if not self._flag(p):
                self._orient(p)
            tip_case = TIP_INNER
        else:
            if not self._flag(q):
                self._sim_traversal(q, entries)
            if not self._flag(r):
                self._sim_traversal(r, entries)
            if not self._flag(p):
                self._orient(p)
            tip_case = INNER_INNER
        entries.append(TraversalEntry(tip_case, p.number, q.number,
                                      r.number, list(q.z), list(r.z)))

    def fingerprint(self):
        """Decision fingerprint for speculation validation: everything
        that determines the wave's scores and commit effects, with row
        numbers abstracted away."""
        return (tuple(self.entry_node), tuple(self.reads),
                tuple(self.sub_flags),
                tuple(tuple(z) for z in self.sc_z),
                tuple(tuple(z) for z in self.th_z0))


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
        # vectorized NR program carries per-branch-class lanes ([N, B])
        # and PSR derivative/junction kernels, so every mode batches
        self.batch_thorough = engine.use_pallas
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
        self._wave_content = None       # batch content map (speculation)
        self.spec_depth = 16
        # Verdict prediction (round-trip reduction): a side whose cutoff
        # fires costs one fetch + re-dispatch round per unanticipated
        # effective cut. Instead of assuming no-cut beyond the verified
        # prefix, re-dispatch rounds are steered by a score-based
        # prediction (the cutoff state machine simulated over the
        # previous round's fetched scores) and first rounds by the side's
        # verdicts from the previous SPR cycle. Every prediction is
        # verified by the replay against the true sequential bookkeeping,
        # so a wrong guess costs a round — never trajectory exactness.
        self.predict_verdicts = True
        self._verdict_store: dict = {}   # side key -> {u.number: descend}
        self._pred_frozen = None         # batch-scoped snapshot (spec.)
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

    def insert_big(self, p: Node, q: Node, eng=None):
        """insertBIG (searchAlgo.c:484). eng defaults to the real engine;
        the stale-exact batched walk passes a _WaveRecorder instead so the
        identical tree/x-flag/traversal logic runs with deferred device
        work."""
        tr = self.tr
        eng = eng or self.eng
        B = eng.num_branches
        r = q.back
        s = p.back
        self.lzi = list(q.z)
        if self.thorough:
            qz = list(q.z)
            default = [C.DEFAULTZ] * B
            zqr = eng.makenewz(q, r, qz, C.ITERATIONS, mask=False)
            zqs = eng.makenewz(q, s, default, C.ITERATIONS, mask=False)
            zrs = eng.makenewz(r, s, default, C.ITERATIONS, mask=False)
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
        eng.newview(p)
        if self.thorough:
            eng.local_smooth(p, C.SMOOTHINGS)
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
    # Stale-exact batched SPR candidate scoring.
    #
    # The reference's lazy walk (addTraverseBIG/testInsertBIG,
    # searchAlgo.c:682-798) trusts x-flags: every insertBIG/evaluate
    # partial traversal recomputes only CLVs whose x-flag is not oriented
    # the needed way, knowingly reusing rows left behind by EARLIER prune
    # positions (whose junction has since been restored) — and the rows it
    # does recompute PERSIST for later prune positions AND for later
    # candidates within the same walk. Candidate scores therefore depend
    # on the whole walk history, including which candidates the cutoff
    # heuristic cut (a cut stops the DFS descent, so the skipped
    # candidates' CLV recomputes never happen and later candidates read
    # different rows — measured effect on testData/49: thousands of lnL
    # units through stale rows, tools/dbg_bogus.py).
    #
    # The batched form reproduces all of it exactly: phase A re-runs the
    # sequential walk's tree/x-flag/traversal logic with a recording
    # engine (_WaveRecorder) that redirects every CLV write to a
    # versioned scratch row; the recorded ops + batched scoring dispatch
    # as ONE device wave; the replay applies the reference's bookkeeping
    # in order and STOPS at the first cut verdict the dispatch did not
    # anticipate (the walk below that candidate must not have happened);
    # the side then RE-DISPATCHES from there with the verdict prefix
    # steering the walk — so a side costs (effective cuts + 1) waves,
    # and cycles whose cutoff never fires (the common mid-search case,
    # cutoff = inf after a decrease-free cycle) cost exactly one. The
    # accepted candidates' mutations are committed to the main rows
    # (device row copies + live x orientations) after each round,
    # leaving bit-identical persistent state to the sequential walk.

    def _dispatch_side(self, p: Node, p1: Node, p2: Node,
                       mintrav: int, maxtrav: int, zqr_dev=None,
                       ctx=None, record_only: bool = False,
                       sub_edge=None, verdicts=None, pred=None):
        """Phase A + dispatch for one pruned side, WITHOUT fetching.
        Returns a side spec for _fetch_sides/_replay_side/_commit_side,
        None when there are no candidates, or 'overflow' when the side
        exceeds the scratch pool (caller falls back to the sequential
        walk). zqr_dev is the device-resident junction NR result
        (descriptor slots crossing the junction edge carry placeholders
        substituted on device). ctx shares the version map / x overlay /
        scratch allocator across a speculative batch; record_only skips
        the device dispatch (speculation validation re-simulation).
        verdicts[k] is the known test outcome (True = descend) of the
        k-th tested candidate from earlier replay rounds; beyond the
        prefix the walk assumes no cut."""
        tr = self.tr
        eng = self.eng
        s = p.back
        if sub_edge is None and zqr_dev is not None:
            sub_edge = frozenset((p1.number, p2.number))
        if verdicts is None:
            verdicts = []
        key = (p.number, p1.number, p2.number, mintrav, maxtrav,
               self.thorough)
        if (pred is None and self.predict_verdicts and self.do_cutoff
                and math.isfinite(self.lh_cutoff)):
            # first round: seed from this side's previous-cycle verdicts
            # (frozen per speculative batch so record_only revalidation
            # re-derives the dispatch's exact walk)
            pred = self._verdict_store.get(key)
            if self._pred_frozen is not None:
                pred = self._pred_frozen.setdefault(key, pred)
        rec = _WaveRecorder(self, junction=p.number, sub_edge=sub_edge,
                            ctx=ctx)
        p_group = (self._subtree_group(s)
                   if self.constraint is not None else None)
        cands: List[dict] = []           # THIS round's tested candidates
        # Walk-global candidate numbering: the verdict prefix counts
        # candidates from earlier rounds of this side. Their CLV
        # mutations are already committed to the main rows and their
        # orientations to the live x-flags, so the walk SKIPS them (no
        # re-recording — rounds cost O(remainder), and a side larger
        # than the scratch pool can complete via segmented rounds).
        gci = [0]
        u_seq: List[int] = []            # insertion node per global cand
        ckpt = [(0, 0, 0, 0, 0, 0, 0, 0)]
        truncated = [False]
        fresh_ctx = ctx is None

        def mark():
            ckpt[0] = (len(rec.entries), len(rec.orient_log),
                       len(rec.reads), len(rec.sc_p), len(rec.th_u),
                       len(cands), gci[0], len(u_seq))

        def truncate():
            """Drop the partially recorded candidate and dispatch the
            completed prefix as a normal (segmented) round. Only safe on
            a fresh ctx: a shared (speculative-batch) ctx would leave
            dangling version-map entries for later nodes' reads."""
            ne, no, nr, ns, nt, nc, g, nu = ckpt[0]
            del rec.entries[ne:]
            del rec.entry_node[ne:]
            del rec.entry_writer[ne:]
            del rec.entry_gid[ne:]
            del rec.sub_flags[ne:]
            del rec.orient_log[no:]
            del rec.reads[nr:]
            del rec.sc_p[ns:]
            del rec.sc_q[ns:]
            del rec.sc_z[ns:]
            del rec.th_u[nt:]
            del rec.th_v[nt:]
            del rec.th_j[nt:]
            del rec.th_z0[nt:]
            del cands[nc:]
            gci[0] = g
            del u_seq[nu:]
            rec.overflow = False
            truncated[0] = True

        def sim_test(u, parent):
            r = u.back
            qz = list(u.z)
            pz = list(p.z)
            rec.cand = len(cands)
            self.insert_big(p, u, eng=rec)
            if self.thorough:
                rec.score_thorough(u, r, qz)
            else:
                rec.score_lazy(p.next.next)
            # un-insert (testInsertBIG restore, searchAlgo.c:753-761)
            tr.hookup(u, r, qz)
            p.next.back = p.next.next.back = None
            if self.thorough:
                tr.hookup(p, s, pz)
            cands.append(dict(u=u, parent=parent, z0=qz))
            return len(cands) - 1

        def walk(q, mintrav, maxtrav, parent):
            if rec.overflow or truncated[0]:
                return
            mintrav -= 1
            new_parent = parent
            if mintrav <= 0:
                skipped = False
                if self.constraint is not None:
                    # constraint-skipped insertions consume no verdict
                    # (testInsertBIG :690-715 returns without testing)
                    u_group = self._subtree_group(q)
                    r_group = self._subtree_group(q.back)
                    skipped = (p_group != u_group and p_group != r_group)
                if not skipped:
                    g = gci[0]
                    gci[0] += 1
                    u_seq.append(q.number)
                    if g < len(verdicts):
                        descend = verdicts[g]      # committed candidate
                    else:
                        ci = sim_test(q, parent)
                        if rec.overflow:
                            if fresh_ctx and len(cands) > ckpt[0][5]:
                                truncate()
                            return
                        new_parent = ci
                        if pred is not None:
                            descend = pred.get(q.number, True)
                        else:
                            descend = True
                        cands[ci]['pred'] = descend
                        cands[ci]['may_child'] = (
                            (not tr.is_tip(q.number)) and maxtrav - 1 > 0)
                        mark()
                    if not descend:
                        return           # the cut stopped this descent
            maxtrav -= 1
            if (not tr.is_tip(q.number)) and maxtrav > 0:
                walk(q.next.back, mintrav, maxtrav, new_parent)
                walk(q.next.next.back, mintrav, maxtrav, new_parent)

        for a, _b in ((p1, p2), (p2, p1)):
            if tr.is_tip(a.number):
                continue
            walk(a.next.back, mintrav, maxtrav, -1)
            walk(a.next.next.back, mintrav, maxtrav, -1)

        if rec.overflow:
            return 'overflow'
        if not cands and not truncated[0]:
            return None
        if not cands:
            return 'overflow'            # pool too small for 1 candidate
        side = dict(p=p, cands=cands, rec=rec, verdicts=verdicts, key=key,
                    truncated=truncated[0], u_seq=u_seq)
        if self.thorough:
            # thorough's shared s-row read belongs to the fingerprint too
            side['s_row'] = rec._read(s.number)
        if record_only:
            return side

        sub = rec.sub_flags if any(rec.sub_flags) else None
        if self.thorough:
            if rec.entries:
                eng._run_traversal(rec.entries, sub_mask=sub,
                                   zqr_sub=zqr_dev)
            handles = eng.thorough_score_wave_lazy(
                side['s_row'], rec.th_u, rec.th_v, rec.th_j, rec.th_z0)
            segs = [dict(idx=list(range(len(cands))), handles=handles,
                         n=len(cands))]
        else:
            handle = eng.traverse_and_score_lazy(
                rec.entries, rec.sc_p, rec.sc_q, np.asarray(rec.sc_z),
                sub_mask=sub, zqr_sub=zqr_dev)
            segs = [dict(idx=list(range(len(cands))), handle=handle,
                         n=len(cands))]
        side['segs'] = segs
        return side

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
        """Replay testInsertBIG bookkeeping in traversal order over the
        fetched scores. `cands` holds only THIS round's tested candidates
        (the verdict prefix was replayed by earlier rounds and skipped by
        the walk). Stops at the first candidate whose cut verdict
        invalidates the predicted walk below it (its recorded descendants
        must not have been tested — their scores AND their persistent CLV
        mutations are wrong for every later candidate) or whose predicted
        cut skipped a subtree the sequential walk descends into.
        Extends side['verdicts'] in place; marks side['accepted'] = one
        past the last candidate whose bookkeeping was applied (within the
        round). Returns True when the round fully replayed — the side
        itself is complete only if the round was not truncated."""
        p = side['p']
        cands = side['cands']
        verdicts = side['verdicts']
        scores = np.empty(len(cands))
        for seg in side['segs']:
            scores[seg['idx']] = seg['scores'][:seg['n']]
            if self.thorough:
                for jj, ci in enumerate(seg['idx']):
                    cands[ci]['lz'] = (
                        [float(v) for v in seg['e1'][jj]],
                        [float(v) for v in seg['e2'][jj]],
                        [float(v) for v in seg['e3'][jj]])
        has_child = [False] * len(cands)
        for c in cands:
            if c['parent'] >= 0:
                has_child[c['parent']] = True
        for i in range(len(cands)):
            c = cands[i]
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
                    self.current_lzq = list(e1)
                    self.current_lzr = list(e2)
                    self.current_lzs = list(e3)
                else:
                    self.current_lzr = list(self.lzr)
                    self.current_lzq = list(self.lzq)
                    self.current_lzs = list(self.lzs)
            if lh > self.end_lh:
                self.insert_node = c['u']
                self.remove_node = p
                self.current_zqr = list(self.zqr)
                self.end_lh = lh
            cut = False
            if self.do_cutoff and lh < start_lh:
                self.lh_avg += start_lh - lh
                self.lh_dec += 1
                cut = not ((start_lh - lh) < self.lh_cutoff)
            verdicts.append(not cut)
            if cut and has_child[i]:
                # the dispatch walked below this candidate; everything
                # after is contaminated by the skipped mutations
                side['accepted'] = i + 1
                side['pred_next'] = self._predict_rest(cands, scores, i,
                                                       skip_i=True)
                return False
            if (not cut) and (not c.get('pred', True)) \
                    and c.get('may_child', False):
                # the dispatch's predicted cut skipped a subtree the
                # sequential walk descends into: its candidates were
                # never recorded — re-dispatch from here
                side['accepted'] = i + 1
                side['pred_next'] = self._predict_rest(cands, scores, i,
                                                       skip_i=False)
                return False
        side['accepted'] = len(cands)
        skey = side.get('key')
        if (skey is not None and not side.get('truncated')
                and len(verdicts) == len(side.get('u_seq', ()))):
            # a fully replayed final round: the accumulated verdicts ARE
            # the sequential walk's; seed next cycle's first dispatch
            self._verdict_store[skey] = dict(zip(side['u_seq'], verdicts))
        return True

    def _predict_rest(self, cands, scores, i, skip_i):
        """Score-based verdict prediction for a side's re-dispatch round:
        continue the cutoff state machine over the stopped round's
        remaining fetched scores (approximate — stale-row semantics make
        post-divergence scores estimates only), skipping the subtree
        below the stop candidate. Keyed by insertion node number so the
        re-dispatch's differently-shaped walk can consume it; the next
        replay verifies every prediction, so a wrong guess costs one
        round, never exactness."""
        if not self.predict_verdicts:
            return None
        pred = {}
        skip = {i} if skip_i else set()
        est_end = self.end_lh
        for j in range(i + 1, len(cands)):
            c = cands[j]
            if c['parent'] in skip:
                skip.add(j)
                continue
            lh = float(scores[j])
            cut = False
            if lh < est_end:
                cut = not ((est_end - lh) < self.lh_cutoff)
            pred[c['u'].number] = not cut
            if cut:
                skip.add(j)
            elif lh > est_end:
                est_end = lh
        return pred

    def _commit_side(self, side):
        """Apply the accepted candidates' walk mutations of THIS round:
        x-flag orientations replayed in order on the live tree and the
        last accepted version of every recomputed CLV row copied from its
        scratch version to the main row in one device dispatch. Verdict-
        prefix candidates re-recorded by a later round contribute no new
        mutations (their recomputes find the committed rows already
        oriented), so committing [round start, accepted) is exact."""
        rec = side['rec']
        first = side.get('replayed_from', 0)
        accepted = side['accepted']
        for recd, ci in rec.orient_log:
            if first <= ci < accepted:
                Tree.orient(recd)
        commit = {}
        for i, node in enumerate(rec.entry_node):
            if node is None:             # junction score rows: never read
                continue
            ci = rec.entry_writer[i]
            if first <= ci < accepted:
                commit[node] = (rec.entries[i].p_number, rec.entry_gid[i])
        if commit:
            self.eng.copy_rows([v[0] for v in commit.values()],
                               list(commit.keys()))
            if self._wave_content is not None:
                for node, (_row, gid) in commit.items():
                    self._wave_content[node] = gid

    def _side_rounds(self, p, p1, p2, mintrav, maxtrav, verdicts=None,
                     pred=None):
        """The verdict-driven round loop for one pruned side: dispatch
        (prediction-steered beyond the known prefix), fetch, replay to
        the first unanticipated effective cut, commit the accepted range,
        re-dispatch the remainder — until the side completes. verdicts
        continues a side whose first round was replayed elsewhere (the
        speculative driver)."""
        import jax.numpy as jnp
        verdicts = list(verdicts) if verdicts else []
        while True:
            zdev = (jnp.asarray(self.zqr, jnp.float32)
                    if self.sub_capable else None)
            side = self._dispatch_side(p, p1, p2, mintrav, maxtrav,
                                       zqr_dev=zdev, verdicts=verdicts,
                                       pred=pred)
            if side == 'overflow':
                # Sequential fallback. With a verdict prefix (possible
                # when a predicted cut shrank an earlier round's walk
                # below the pool limit and a missed subtree re-grew it),
                # the prefix candidates' mutations are already committed
                # to the main rows and their bookkeeping replayed, so the
                # steered walk SKIPS them and only tests the remainder.
                count = [0]
                for a in (p1, p2):
                    if self.tr.is_tip(a.number):
                        continue
                    self._add_traverse_steered(p, a.next.back, mintrav,
                                               maxtrav, verdicts, count)
                    self._add_traverse_steered(p, a.next.next.back,
                                               mintrav, maxtrav,
                                               verdicts, count)
                return
            if side is None:
                return
            self._fetch_sides([side])
            done = self._replay_side(side)
            self._commit_side(side)
            verdicts = side['verdicts']
            pred = side.get('pred_next')
            if done and not side.get('truncated'):
                return
            # else: an unanticipated verdict stopped the round, or the
            # round was segmented at the scratch-pool boundary — the next
            # round continues after the committed prefix

    def _batched_rearrange_side(self, p: Node, p1: Node, p2: Node,
                                mintrav: int, maxtrav: int):
        """Synchronous batched side scoring. On the fused-program path
        the junction branch still flows through the device substitution
        (re-uploading the fetched zqr bit-exactly), so the speculative
        and synchronous drivers run the identical device computation."""
        self._side_rounds(p, p1, p2, mintrav, maxtrav)

    def _add_traverse_steered(self, p: Node, q: Node, mintrav: int,
                              maxtrav: int, verdicts, count):
        """add_traverse_big with a verdict prefix: the first len(verdicts)
        tested candidates (constraint-skipped ones consume no verdict,
        matching the recorder's walk) are NOT re-tested — their CLV
        mutations and bookkeeping were already committed by the batched
        rounds — and their verdicts steer the descent; beyond the prefix
        this is the plain sequential walk."""
        tr = self.tr
        mintrav -= 1
        descend = True
        if mintrav <= 0:
            skipped = False
            if self.constraint is not None:
                p_group = self._subtree_group(p.back)
                q_group = self._subtree_group(q)
                r_group = self._subtree_group(q.back)
                skipped = (p_group != q_group and p_group != r_group)
            if skipped:
                descend = True
            else:
                i = count[0]
                count[0] += 1
                if i < len(verdicts):
                    descend = verdicts[i]
                else:
                    descend = self.test_insert_big(p, q)
        maxtrav -= 1
        if descend and (not tr.is_tip(q.number)) and maxtrav > 0:
            self._add_traverse_steered(p, q.next.back, mintrav, maxtrav,
                                       verdicts, count)
            self._add_traverse_steered(p, q.next.next.back, mintrav,
                                       maxtrav, verdicts, count)

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

    def rearrange_dispatch(self, p: Node, mintrav: int, maxtrav: int,
                           ctx: _WaveCtx, record_only: bool = False):
        """rearrange_big's dispatch phase for the speculative driver:
        prune both positions, record + dispatch the candidate waves
        lazily (the junction NR runs on device reading the version-
        resolved endpoint CLVs; its result is substituted into the wave
        descriptors there), record the restore newviews, restore the
        tree. Every device write lands in scratch versions shared through
        ctx, so a speculated node costs nothing to discard. Returns a
        node spec for rearrange_replay, None when rearrange_big would
        return 0, or 'overflow' when the scratch pool ran out (the caller
        ends the batch and handles the node synchronously).

        record_only re-runs ONLY the decision simulation (no device
        work): the speculative replay uses it to re-derive the
        fingerprints against the committed truth and validate that the
        speculated wave's scores are exactly what the sequential walk
        would compute now."""
        tr = self.tr
        eng = self.eng
        if maxtrav < 1 or mintrav > maxtrav:
            return None
        q = p.back
        items = []          # ordered: ('aux', rec) | ('side', side dict)

        def aux(rec):
            if rec.entries and not record_only:
                eng._run_traversal(rec.entries, sub_mask=None)
            items.append(('aux', rec))

        def prune_one(prune, a1, a2, mt):
            """One pruned position: remove (NR on device), walk, restore.
            Returns False on scratch overflow."""
            c1 = prune.next.back
            c2 = prune.next.next.back
            zqr0 = [za * zb for za, zb in zip(c1.z, c2.z)]
            # removeNodeBIG's makenewz validations (searchAlgo.c:442-464),
            # recorded against the virtual overlay BEFORE the hookup —
            # exactly the sequential order
            rrem = _WaveRecorder(self, junction=-1, ctx=ctx)
            rrem.cand = -1
            rrem.makenewz(c1, c2, zqr0, C.ITERATIONS)
            if rrem.overflow:
                return False
            aux(rrem)
            p_row = rrem._read(c1.number)
            q_row = rrem._read(c2.number)
            zdev = None
            if not record_only:
                zdev = eng._makenewz_dispatch(
                    p_row, q_row, np.array(zqr0, dtype=np.float64),
                    C.ITERATIONS)
            tr.hookup(c1, c2, zqr0)
            prune.next.back = prune.next.next.back = None

            side = self._dispatch_side(
                prune, c1, c2, mt, maxtrav, zqr_dev=zdev, ctx=ctx,
                record_only=record_only,
                sub_edge=frozenset((c1.number, c2.number)))
            overflow = side == 'overflow'
            if side is not None and not overflow:
                side['zqr_handle'] = zdev
                side.update(prune=prune, c1=c1, c2=c2, mt=mt,
                            maxtrav=maxtrav, a1z=list(a1z_store[0]),
                            a2z=list(a2z_store[0]))
                items.append(('side', side))

            # restore + the junction recompute (the sequential driver's
            # eng.newview(prune)), recorded so its row version is
            # committed and readable by later speculated nodes
            tr.hookup(prune.next, c1, list(a1z_store[0]))
            tr.hookup(prune.next.next, c2, list(a2z_store[0]))
            rres = _WaveRecorder(self, junction=-1, ctx=ctx)
            rres.cand = -1
            rres.newview(prune)
            if rres.overflow:
                return False
            aux(rres)
            return not overflow

        a1z_store = [None]
        a2z_store = [None]

        if not tr.is_tip(p.number):
            p1 = p.next.back
            p2 = p.next.next.back
            if not tr.is_tip(p1.number) or not tr.is_tip(p2.number):
                a1z_store[0] = list(p1.z)
                a2z_store[0] = list(p2.z)
                if not prune_one(p, p1, p2, mintrav):
                    return 'overflow'

        if not tr.is_tip(q.number) and maxtrav > 0:
            q1 = q.next.back
            q2 = q.next.next.back
            if ((not tr.is_tip(q1.number)
                 and (not tr.is_tip(q1.next.back.number)
                      or not tr.is_tip(q1.next.next.back.number)))
                    or (not tr.is_tip(q2.number)
                        and (not tr.is_tip(q2.next.back.number)
                             or not tr.is_tip(q2.next.next.back.number)))):
                a1z_store[0] = list(q1.z)
                a2z_store[0] = list(q2.z)
                if not prune_one(q, q1, q2, max(mintrav, 2)):
                    return 'overflow'
        return dict(node=p, items=items,
                    sides=[it for k, it in items if k == 'side'])

    def _node_fingerprint(self, spec, content=None):
        """Canonical decision fingerprint of one dispatched node: for
        every recorder, the entry structure, the version-canonicalized
        read tokens, the substitution flags and the branch values. With
        content=None the tokens describe the DISPATCH-time resolution;
        with the batch content map they describe the committed truth, so
        equality certifies the speculated scores (see _WaveRecorder)."""
        recs = [it if k == 'aux' else it['rec'] for k, it in spec['items']]
        gid_local = {}
        for ri, rec in enumerate(recs):
            for ei, g in enumerate(rec.entry_gid):
                gid_local[g] = (ri, ei)
        out = []
        for rec in recs:
            reads = []
            for n, g in rec.reads:
                if g == 'pre':
                    tag = 'pre' if content is None else content.get(n, 'pre')
                elif g in gid_local:
                    tag = ('node',) + gid_local[g]
                else:
                    tag = g              # an earlier batch node's version
                reads.append((n, tag))
            out.append((tuple(rec.entry_node), tuple(reads),
                        tuple(rec.sub_flags),
                        tuple(tuple(z) for z in rec.sc_z),
                        tuple(tuple(z) for z in rec.th_z0)))
        # candidate walk structure per side (u, parent linkage)
        for kind, it in spec['items']:
            if kind == 'side':
                out.append(tuple((c['u'].number, c['parent'])
                                 for c in it['cands']))
        return out

    def _revalidate(self, spec, mintrav, maxtrav):
        """True when the speculated node's wave is still exact: re-run the
        decision simulation against the committed truth and compare
        fingerprints. Any divergence (a cut in an earlier node changed an
        x-flag or a row version this node's wave consumed) forces a
        re-dispatch."""
        truth = self.rearrange_dispatch(spec['node'], mintrav, maxtrav,
                                        _WaveCtx(self.eng),
                                        record_only=True)
        if truth in (None, 'overflow'):
            return False
        return (self._node_fingerprint(truth, self._wave_content)
                == self._node_fingerprint(spec))

    def rearrange_replay(self, spec):
        """Replay the bookkeeping of one dispatched node after its handles
        were fetched, committing effects in sequential order. When a
        side's replay stops at an unanticipated cut (the dispatched walk
        descended where the sequential walk would not), everything the
        node dispatched after that point is discarded — free: nothing
        touched main rows — and redone synchronously: the side's
        remaining rounds, a real restore newview, and any remaining prune
        position via the sync path."""
        items = spec['items']
        diverged_at = None
        for idx, (kind, it) in enumerate(items):
            if kind == 'aux':
                self._commit_node_aux(it)
                continue
            self.zqr = [float(v) for v in it['zqr']]
            it['replayed_from'] = 0
            done = self._replay_side(it)
            self._commit_side(it)
            if not done or it.get('truncated'):
                # an unanticipated cut — or a segmented (truncated)
                # round, which cannot happen on the shared-ctx
                # speculative dispatch but is handled for safety
                diverged_at = idx
                break
        if diverged_at is None:
            return
        side = items[diverged_at][1]
        tr = self.tr
        prune, c1, c2 = side['prune'], side['c1'], side['c2']
        # finish this side's rounds on the re-pruned tree, then restore
        # with a real junction recompute
        tr.hookup(c1, c2, self.zqr)
        prune.next.back = prune.next.next.back = None
        self._side_rounds(prune, c1, c2, side['mt'], side['maxtrav'],
                          verdicts=side['verdicts'],
                          pred=side.get('pred_next'))
        tr.hookup(prune.next, c1, side['a1z'])
        tr.hookup(prune.next.next, c2, side['a2z'])
        self.eng.newview(prune)
        # any remaining prune position: full synchronous path
        for kind, it in items[diverged_at + 1:]:
            if kind != 'side':
                continue
            p2_, c1_, c2_ = it['prune'], it['c1'], it['c2']
            a1z, a2z = list(c1_.z), list(c2_.z)
            self.remove_node_big(p2_)
            self._side_rounds(p2_, c1_, c2_, it['mt'], it['maxtrav'])
            tr.hookup(p2_.next, c1_, a1z)
            tr.hookup(p2_.next.next, c2_, a2z)
            self.eng.newview(p2_)

    def _commit_node_aux(self, rec):
        """Commit an always-run auxiliary recorder (the remove-NR
        validations / restore junction recompute of a speculated prune):
        replay its orientations on the live tree and copy its row
        versions to the main rows."""
        for recd, _ci in rec.orient_log:
            Tree.orient(recd)
        commit = {}
        for i, node in enumerate(rec.entry_node):
            if node is not None:
                commit[node] = (rec.entries[i].p_number, rec.entry_gid[i])
        if commit:
            self.eng.copy_rows([v[0] for v in commit.values()],
                               list(commit.keys()))
            if self._wave_content is not None:
                for node, (_row, gid) in commit.items():
                    self._wave_content[node] = gid

    def _spr_pass(self, nodes, mintrav: int, maxtrav: int, on_node):
        """Run the rearrangement loop over `nodes`, calling on_node(node)
        after each node's bookkeeping (on_node returns True when it
        APPLIED an improvement, i.e. changed the tree).

        On accelerators this speculates: the device programs of up to
        spec_depth consecutive prune nodes are dispatched without any
        host sync (the junction NR results flow into the wave programs by
        device-side branch substitution; every CLV write goes to a shared
        scratch-version pool), the whole batch is fetched in ONE round
        trip, and the sequential bookkeeping is replayed node by node —
        each speculated node first REVALIDATED against the committed
        truth (fingerprint comparison, see _WaveRecorder) so the
        trajectory stays bit-identical to the sequential walk. At the
        first applied improvement or failed validation the remaining
        speculated results are discarded (free: nothing touched main
        rows) and re-dispatched against the updated state."""
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
            ctx = _WaveCtx(self.eng)
            self._wave_content = {}
            self._pred_frozen = {}
            specs = []
            for n in batch:
                spec = self.rearrange_dispatch(n, mintrav, maxtrav, ctx)
                specs.append(spec)
                if spec == 'overflow':
                    break
            self._fetch_sides([side for spec in specs
                               if spec not in (None, 'overflow')
                               for side in spec['sides']])
            mispredicted = False
            for j, spec in enumerate(specs):
                node = batch[j]
                if spec == 'overflow':
                    # scratch pool exhausted mid-recording: everything
                    # dispatched for this node is discardable scratch
                    # state; run it synchronously (exact) instead
                    i += 1
                    self.best_of_node = C.UNLIKELY
                    if self.rearrange_big(node, mintrav, maxtrav):
                        on_node(node)
                    mispredicted = True
                    break
                if j > 0 and spec is not None:
                    if not self._revalidate(spec, mintrav, maxtrav):
                        # an earlier node's cuts changed state this wave
                        # consumed: re-dispatch from here
                        mispredicted = True
                        break
                i += 1
                if spec is None:
                    continue
                self.best_of_node = C.UNLIKELY
                self.rearrange_replay(spec)
                if on_node(node) and j < len(specs) - 1:
                    mispredicted = True
                    break
            self._wave_content = None
            self._pred_frozen = None
            depth = (max(1, depth // 2) if mispredicted
                     else min(2 * depth, self.spec_depth))

    def test_insert_restore_big(self, p: Node, q: Node):
        tr = self.tr
        if self.thorough:
            if self.batch_thorough:
                # fused apply: insertBIG's three NR fits + localSmooth +
                # evaluate in ONE dispatch/fetch (the host path costs 4
                # separate syncs; searchAlgo.c:495-536 + :270)
                eng = self.eng
                r = q.back
                s = p.back
                self.lzi = list(q.z)
                per, e1, e2, e3 = eng.apply_thorough(p, q)
                tr.hookup(p.next, q, list(e1))
                tr.hookup(p.next.next, r, list(e2))
                tr.hookup(p, s, list(e3))
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
