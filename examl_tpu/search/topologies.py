"""Ranked best-tree cache (bestlist) and light topology snapshots.

Python counterpart of the reference's topologies.c: saveBestTree keeps the
N best-scoring distinct topologies (optionally replacing an already-stored
identical topology to refresh its branch lengths), recallBestTree restores
rank k and re-evaluates. Topology identity uses the same canonical
"standard order" (minimum-tip-first sorted subtrees, topologies.c
saveTree/cmpTopol :481-552).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

from ..constants import UNLIKELY
from ..tree import Node, Tree


def canonical_key(tr: Tree) -> Tuple:
    """Canonical, branch-length-free topology key (standard order). Uses
    the native treekernel's 128-bit canonical hash when the library is
    available (O(n) iterative C, the 10^4+-taxon path — reference
    counterpart: topologies.c cmpTopol :481); falls back to the pure
    Python structural key."""
    from ..native import canonical_hash
    h = canonical_hash(tr)
    if h is not None:
        return h

    def rec(p: Node):
        # returns (min_tip, structure)
        if tr.is_tip(p.number):
            return (p.number, p.number)
        subs = []
        q = p.next
        while q is not p:
            subs.append(rec(q.back))
            q = q.next
        subs.sort(key=lambda s: s[0])
        return (subs[0][0], tuple(s[1] for s in subs))

    # root on the globally minimal tip (tip 1) for a unique representation
    start = tr.nodep[1]
    return (1, rec(start.back)[1])


@dataclasses.dataclass
class TopologySnapshot:
    likelihood: float
    start_number: int
    ntips: int
    nextnode: int
    # connections hold live Node references (like the reference's nodeptr
    # links) — restore re-hooks the very same ring records.
    connections: List[Tuple[Node, Node, List[float]]]
    key: Tuple = ()


def snapshot_tree(tr: Tree, likelihood: float) -> TopologySnapshot:
    conns = []
    seen = set()

    def rec(p: Node):
        if tr.is_tip(p.number):
            return
        q = p.next
        while q is not p:
            key = id(q)
            if key not in seen:
                seen.add(key)
                conns.append((q, q.back, list(q.z)))
                rec(q.back)
            q = q.next

    start = tr.start
    conns.append((start, start.back, list(start.z)))
    rec(start.back)
    return TopologySnapshot(likelihood=likelihood,
                            start_number=start.number, ntips=tr.ntips,
                            nextnode=tr.nextnode, connections=conns,
                            key=canonical_key(tr))


def restore_snapshot(tr: Tree, snap: TopologySnapshot) -> None:
    for i in range(1, 2 * tr.mxtips - 1):
        base = tr.nodep[i]
        if base is None:
            continue
        if tr.is_tip(i):
            base.back = None
        else:
            base.back = None
            base.next.back = None
            base.next.next.back = None
    for p, q, z in snap.connections:
        tr.hookup(p, q, z)
    tr.start = tr.nodep[snap.start_number]
    tr.ntips = snap.ntips
    tr.nextnode = snap.nextnode


class BestList:
    """Keep the n best-scoring distinct topologies (topologies.c bestlist)."""

    def __init__(self, nkeep: int):
        self.nkeep = nkeep
        self.entries: List[TopologySnapshot] = []   # sorted by score desc
        self.best = UNLIKELY
        self.worst = UNLIKELY
        self.improved = False
        self.start_likelihood = UNLIKELY

    @property
    def nvalid(self):
        return len(self.entries)

    def reset(self):
        self.entries = []
        self.best = UNLIKELY
        self.worst = UNLIKELY
        self.improved = False

    def save(self, tr: Tree, likelihood: float,
             keep_identical: bool = True) -> int:
        key = canonical_key(tr)
        existing = next((i for i, e in enumerate(self.entries)
                         if e.key == key), None)
        if existing is not None:
            if not keep_identical:
                return 0
            del self.entries[existing]
        else:
            if len(self.entries) >= self.nkeep and likelihood < self.worst:
                return 0
            if likelihood > self.start_likelihood:
                self.improved = True

        snap = snapshot_tree(tr, likelihood)
        pos = 0
        while (pos < len(self.entries)
               and self.entries[pos].likelihood >= likelihood):
            pos += 1
        self.entries.insert(pos, snap)
        del self.entries[self.nkeep:]

        self.best = self.entries[0].likelihood
        if len(self.entries) == self.nkeep:
            self.worst = self.entries[-1].likelihood
        return pos + 1

    def recall(self, rank: int, tr: Tree) -> Optional[TopologySnapshot]:
        """Restore the rank-th best topology (1-based); caller re-evaluates."""
        if not self.entries:
            return None
        rank = min(max(rank, 1), len(self.entries))
        snap = self.entries[rank - 1]
        restore_snapshot(tr, snap)
        return snap
