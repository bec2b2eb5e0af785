"""Induced-subtree CLV compaction — the TPU-native successor of the
reference's -S/SEV memory saving (examl/axml.c:874-876: 70 GB -> 19 GB on
a gappy multi-gene alignment; saveMem kernels newviewGenericSpecial.c:
135-160, avxLikelihood.c _GAPPED_SAVE).

The reference compacts per SITE with per-node gap bit-vectors — hostile
to lane-uniform TPU kernels (docs/SEV.md). The block-missing structure
that dominates real multi-gene data (whole taxa absent from whole
partitions) admits an exact, lane-friendly form instead: a partition's
likelihood is EXACTLY the likelihood of the tree induced on its present
taxa — an all-undetermined tip marginalizes out of Felsenstein pruning
(sum_j P_ij(z) = 1), and a degree-2 chain node contracts because
P(z1) @ P(z2) = P(z1 * z2) for one eigensystem. So partition p needs
2*present(p) CLV rows, not 2*mxtips: rows ~3.7x below dense on the
docs/SEV.md synthetic (73% missing), 7.5x with bf16.

This module is the host side: per-partition present sets and the
per-partition INDUCED traversal (local CLV rows, chain-contracted branch
lengths) built from the global tree. The engine stores each compacted
partition's CLVs in a per-partition row space and dispatches these
descriptors to the unmodified fused kernels.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from .datatypes import info_for
from .traversal import TIP_INNER, TIP_TIP, INNER_INNER, TraversalEntry


def present_tips(alignment, m: int) -> np.ndarray:
    """1-based tip numbers with any determined character in partition m
    (the block-missing model: a taxon is present or entirely absent; the
    reference's per-site gap granularity is out of scope, docs/SEV.md)."""
    codes = alignment.partition_codes(m)          # [n_taxa, w]
    und = info_for(alignment.partitions[m].data_type).undetermined
    present = (codes != und).any(axis=1)
    return np.nonzero(present)[0] + 1


@dataclasses.dataclass
class PartitionRoot:
    """Per-partition evaluation root on the induced tree."""
    p_row: int
    q_row: int
    z: List[float]                                 # [B] contracted


@dataclasses.dataclass
class InducedTraversal:
    entries: List[TraversalEntry]                  # local rows
    root: PartitionRoot


class CompactPlan:
    """Static (alignment-derived) part of the compaction: per-partition
    present-tip sets and the local row layout.

    Local row space of partition p (n = present count):
      row 0                     unused (tip kernel ignores row 0)
      rows 1..n                 present tips, ascending global tip number
      rows T1p..T1p+n-2         inner (junction) rows, traversal order
      row  T1p+n-1              dummy/pad sink row
    with T1p = the tip-code array height (1+n rounded up to 8 for the
    tip-materialization kernel's sublane blocking). Total rows =
    T1p + n ~ 2n + 8."""

    def __init__(self, alignment, num_branches: int = 1):
        self.aln = alignment
        self.num_branches = num_branches
        self.tips: List[np.ndarray] = []
        self.tip_lrow: List[Dict[int, int]] = []
        self.t1p: List[int] = []
        self.n_rows: List[int] = []
        for m in range(len(alignment.partitions)):
            tips = present_tips(alignment, m)
            if len(tips) < 2:
                raise ValueError(
                    f'partition {m} has {len(tips)} present taxa; '
                    f'induced-subtree compaction needs >= 2 (drop the '
                    f'partition or run without -S)')
            self.tips.append(tips)
            self.tip_lrow.append({int(t): i + 1
                                  for i, t in enumerate(tips)})
            t1p = ((len(tips) + 1 + 7) // 8) * 8
            self.t1p.append(t1p)
            self.n_rows.append(t1p + len(tips))

    def dummy_row(self, m: int) -> int:
        return self.n_rows[m] - 1

    def inner_base(self, m: int) -> int:
        return self.t1p[m]

    def n_inner(self, m: int) -> int:
        return len(self.tips[m]) - 1

    def saving(self, mxtips: int) -> float:
        """Row-count ratio vs the dense layout (per-partition rows /
        2*mxtips), the headline -S metric."""
        dense = 2 * mxtips * len(self.n_rows)
        return dense / sum(self.n_rows)

    # ------------------------------------------------------------------

    def build_full(self, tree, m: int) -> InducedTraversal:
        """Full induced traversal of partition m for the CURRENT global
        tree: entries in local rows with chain-contracted branch lengths,
        rooted at the partition's first present tip (every full evaluate
        of the induced tree gives the same L_p regardless of root)."""
        B = self.num_branches
        lrow = self.tip_lrow[m]
        present = np.zeros(tree.mxtips + 1, dtype=bool)
        present[self.tips[m]] = True

        memo: Dict[int, bool] = {}

        def has_present(rec) -> bool:
            """Any present tip in the subtree behind rec (away from the
            ring rec belongs to). Iterative DFS (deep trees overflow
            Python's stack, cf. traversal.py's iterative builder)."""
            r = memo.get(id(rec))
            if r is not None:
                return r
            stack = [(rec, False)]
            while stack:
                node, expanded = stack.pop()
                if id(node) in memo:
                    continue
                if tree.is_tip(node.number):
                    memo[id(node)] = bool(present[node.number])
                    continue
                c1 = node.next.back
                c2 = node.next.next.back
                if expanded:
                    memo[id(node)] = (memo[id(c1)] or memo[id(c2)])
                else:
                    stack.append((node, True))
                    stack.append((c1, False))
                    stack.append((c2, False))
            return memo[id(rec)]

        entries: List[TraversalEntry] = []
        next_inner = [self.inner_base(m)]

        def resolve(rec, z_in: List[float]) -> Tuple[int, List[float], bool]:
            """(local row, contracted z to that row, is_tip) of the
            induced-subtree top at/below rec. Iterative chain descent +
            explicit post-order for junctions."""
            # chain-descend first (no recursion needed)
            while True:
                if tree.is_tip(rec.number):
                    return lrow[rec.number], z_in, True
                c1 = rec.next.back
                c2 = rec.next.next.back
                h1 = has_present(c1)
                h2 = has_present(c2)
                if h1 and h2:
                    break
                child = c1 if h1 else c2
                z_in = [a * b for a, b in zip(z_in, child.z)]
                rec = child
            q_row, qz, q_tip = resolve(c1, list(c1.z))
            r_row, rz, r_tip = resolve(c2, list(c2.z))
            if q_tip and r_tip:
                tc = TIP_TIP
            elif q_tip or r_tip:
                if not q_tip:               # tip first (traversal.py:232)
                    q_row, r_row = r_row, q_row
                    qz, rz = rz, qz
                tc = TIP_INNER
            else:
                tc = INNER_INNER
            row = next_inner[0]
            next_inner[0] += 1
            entries.append(TraversalEntry(tc, row, q_row, r_row,
                                          list(qz), list(rz)))
            return row, z_in, False

        t0 = tree.nodep[int(self.tips[m][0])]
        q_row, qz, _tip = resolve(t0.back, list(t0.z))
        assert next_inner[0] <= self.inner_base(m) + self.n_inner(m)
        return InducedTraversal(
            entries=entries,
            root=PartitionRoot(p_row=lrow[t0.number], q_row=q_row,
                               z=[float(v) for v in qz]))


def pack_local(entries: List[TraversalEntry], slots: int, dummy_row: int,
               num_branches: int):
    """pack_traversal with an explicit dummy row (the per-partition local
    row space has its own pad sink; traversal.pack_traversal hard-codes
    the global 2*mxtips-1 row)."""
    n = len(entries)
    L = max(slots, 4)
    assert n <= L
    p_idx = np.full(L, dummy_row, dtype=np.int32)
    q_idx = np.full(L, dummy_row, dtype=np.int32)
    r_idx = np.full(L, dummy_row, dtype=np.int32)
    tip_tip = np.ones(L, dtype=bool)
    qz = np.full((L, num_branches), 0.9)
    rz = np.full((L, num_branches), 0.9)
    for i, e in enumerate(entries):
        p_idx[i] = e.p_number
        q_idx[i] = e.q_number
        r_idx[i] = e.r_number
        tip_tip[i] = e.tip_case == TIP_TIP
        qz[i] = e.qz
        rz[i] = e.rz
    return p_idx, q_idx, r_idx, tip_tip, qz, rz, n


def slot_bucket(n: int) -> int:
    """Power-of-two-ish descriptor buckets shared across partitions so
    the compact evaluate program compiles for few distinct shapes."""
    b = 32
    while b < n:
        b *= 4
    return b
