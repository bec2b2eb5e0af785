"""Unrooted binary tree topology, RAxML-style.

Tips are numbered 1..n; each inner node (n+1..2n-2) is a ring of three Node
records sharing a number, each with its own `back` edge (reference:
examl/axml.h node struct; same invariants). The `x` flag marks which of the
three ring records the node's CLV is oriented toward; exactly one record of
each inner ring has x == 1.

Branch lengths are stored as z = exp(-t / fracchange) per branch-length
class (numBranches classes; 1 unless per-partition branch lengths are on).
"""
from __future__ import annotations

from typing import List, Optional

from .constants import DEFAULTZ, ZMIN


class Node:
    __slots__ = ('number', 'back', 'next', 'z', 'x')

    def __init__(self, number: int, num_branches: int):
        self.number = number
        self.back: Optional['Node'] = None
        self.next: Optional['Node'] = None
        self.z = [DEFAULTZ] * num_branches
        self.x = 0

    def __repr__(self):
        return f'<Node {self.number}>'


class Tree:
    """Topology container: nodep[1..n] tips, nodep[n+1..2n-2] inner rings."""

    def __init__(self, taxon_names: List[str], num_branches: int = 1):
        self.taxon_names = list(taxon_names)   # index 0 -> taxon number 1
        self.mxtips = len(taxon_names)
        self.num_branches = num_branches
        self.name_to_number = {nm: i + 1 for i, nm in enumerate(taxon_names)}

        n = self.mxtips
        self.nodep: List[Optional[Node]] = [None] * (2 * n)
        for i in range(1, n + 1):
            tip = Node(i, num_branches)
            tip.x = 1
            self.nodep[i] = tip
        for i in range(n + 1, 2 * n):
            ring = [Node(i, num_branches) for _ in range(3)]
            ring[0].next = ring[1]
            ring[1].next = ring[2]
            ring[2].next = ring[0]
            ring[0].x = 1
            self.nodep[i] = ring[0]

        self.start: Optional[Node] = None
        self.ntips = 0
        self.nextnode = n + 1
        self.rooted = False

    # -- basic helpers -----------------------------------------------------

    def is_tip(self, number: int) -> bool:
        return 1 <= number <= self.mxtips

    def inner_nodes(self):
        """Iterate over one ring record per inner node."""
        for i in range(self.mxtips + 1, 2 * self.mxtips - 1):
            if self.nodep[i] is not None:
                yield self.nodep[i]

    @staticmethod
    def hookup(p: Node, q: Node, z) -> None:
        p.back = q
        q.back = p
        z = list(z)
        p.z = list(z)
        q.z = list(z)

    def hookup_default(self, p: Node, q: Node) -> None:
        self.hookup(p, q, [DEFAULTZ] * self.num_branches)

    # -- orientation bookkeeping ------------------------------------------

    @staticmethod
    def orient(p: Node) -> None:
        """Set p's ring x-flag so the CLV at this node points toward p."""
        s = p.next
        while s is not p:
            s.x = 0
            s = s.next
        p.x = 1

    def branches(self, root: Optional[Node] = None):
        """Yield one Node per branch (each edge reported once)."""
        seen = set()
        for i in range(1, 2 * self.mxtips - 1):
            base = self.nodep[i]
            if base is None:
                continue
            ring = [base] if self.is_tip(i) else [base, base.next, base.next.next]
            for p in ring:
                if p.back is None:
                    continue
                key = (min(id(p), id(p.back)), max(id(p), id(p.back)))
                if key not in seen:
                    seen.add(key)
                    yield p
