"""Traversal descriptors: the bridge between host-side tree topology and the
device compute wave.

compute_traversal mirrors the reference's computeTraversalInfo
(reference: examl/newviewGenericSpecial.c:691-813): it lists, bottom-up, the
inner nodes whose CLVs must be recomputed so that the CLV at node p is
oriented toward p, flipping children so a tip child is always the q (left)
child, and re-orienting x flags along the way. A partial traversal stops at
nodes whose CLV is already correctly oriented.

The descriptor is then packed into fixed-size numpy arrays (padded to a
small set of bucket lengths to bound jit recompilation); node numbers index
rows of the unified CLV buffer (row = node number; rows 1..mxtips are
materialized tip CLVs, row 2*mxtips-1 is a scratch row that padding entries
write to).
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from .constants import DEFAULTZ
from .tree import Node, Tree


@dataclasses.dataclass
class TraversalEntry:
    tip_case: int          # 0 = TIP_TIP, 1 = TIP_INNER, 2 = INNER_INNER
    p_number: int
    q_number: int
    r_number: int
    qz: List[float]
    rz: List[float]


TIP_TIP, TIP_INNER, INNER_INNER = 0, 1, 2


def compute_traversal(tr: Tree, p: Node, entries: List[TraversalEntry],
                      partial: bool) -> None:
    """Iterative post-order (the recursive form overflows Python's stack
    on 10^4-taxon caterpillar trees); entry order is identical to the
    recursive reference shape (computeTraversalInfo,
    newviewGenericSpecial.c:691-813)."""
    if tr.is_tip(p.number):
        return
    stack = [(p, 0)]
    while stack:
        node, phase = stack.pop()
        q = node.next.back
        r = node.next.next.back
        q_tip = tr.is_tip(q.number)
        r_tip = tr.is_tip(r.number)

        if q_tip and r_tip:
            tip_case = TIP_TIP
        elif q_tip or r_tip:
            if r_tip:
                q, r = r, q
            tip_case = TIP_INNER
            if phase == 0 and ((not r.x) or (not partial)):
                stack.append((node, 1))
                stack.append((r, 0))
                continue
        else:
            tip_case = INNER_INNER
            if phase == 0:
                kids = []
                if (not q.x) or (not partial):
                    kids.append(q)
                if (not r.x) or (not partial):
                    kids.append(r)
                if kids:
                    stack.append((node, 1))
                    for k in reversed(kids):
                        stack.append((k, 0))
                    continue

        if not node.x:
            tr.orient(node)
        entries.append(TraversalEntry(tip_case, node.number, q.number,
                                      r.number, list(q.z), list(r.z)))


@dataclasses.dataclass
class PackedTraversal:
    """Fixed-shape arrays for the device traversal wave."""
    count: int
    p_idx: np.ndarray      # [L] int32  destination CLV row
    q_idx: np.ndarray      # [L] int32  left child CLV row
    r_idx: np.ndarray      # [L] int32  right child CLV row
    tip_tip: np.ndarray    # [L] bool
    qz: np.ndarray         # [L, B] float
    rz: np.ndarray         # [L, B] float
    # leading descriptor slots that must execute (real work, incl. any
    # interleaved in-chunk padding); the bucketed tail beyond n_exec is
    # pure padding a kernel may skip. 0 means "execute everything".
    n_exec: int = 0
    # slot_of[i] = descriptor slot of original entry i (grouped packings
    # permute entries into independent blocks); None = identity
    slot_of: "np.ndarray | None" = None
    # chunk packings only: original entry index per slot (-1 = padding)
    src: "np.ndarray | None" = None

    def exec_count(self) -> int:
        return self.n_exec if self.n_exec else len(self.p_idx)


def _bucket(n: int) -> int:
    # doubling buckets up to 32, then 4x steps: few distinct shapes keeps
    # the number of compiled programs small (each new shape costs a full
    # remote compile on the accelerator)
    b = 4
    while b < min(n, 32):
        b *= 2
    while b < n:
        b *= 4
    return b


def pack_traversal(tr: Tree, entries: List[TraversalEntry],
                   slots: int = 0) -> PackedTraversal:
    """slots: fixed descriptor length overriding the default bucket — the
    fused whole-traversal kernel skips the padded tail dynamically
    (n_exec), so callers on that path canonicalize slots to a single
    shape and avoid per-length XLA recompiles."""
    n = len(entries)
    L = slots if slots else _bucket(n)
    assert n <= L
    dummy = 2 * tr.mxtips - 1
    B = tr.num_branches

    p_idx = np.full(L, dummy, dtype=np.int32)
    q_idx = np.full(L, dummy, dtype=np.int32)
    r_idx = np.full(L, dummy, dtype=np.int32)
    tip_tip = np.ones(L, dtype=bool)       # padding: no scaling work
    qz = np.full((L, B), DEFAULTZ)
    rz = np.full((L, B), DEFAULTZ)

    for i, e in enumerate(entries):
        p_idx[i] = e.p_number
        q_idx[i] = e.q_number
        r_idx[i] = e.r_number
        tip_tip[i] = e.tip_case == TIP_TIP
        qz[i] = e.qz
        rz[i] = e.rz

    return PackedTraversal(count=n, p_idx=p_idx, q_idx=q_idx, r_idx=r_idx,
                           tip_tip=tip_tip, qz=qz, rz=rz, n_exec=n)


def full_traversal(tr: Tree, p: Node) -> List[TraversalEntry]:
    entries: List[TraversalEntry] = []
    compute_traversal(tr, p, entries, partial=False)
    return entries


def partial_traversal(tr: Tree, p: Node) -> List[TraversalEntry]:
    entries: List[TraversalEntry] = []
    compute_traversal(tr, p, entries, partial=True)
    return entries


@dataclasses.dataclass
class LevelizedTraversal:
    """Traversal entries grouped into dependency levels: within one level
    every destination node's children are already available, so the whole
    level is one batched CLV update (the TPU-native shape of the reference's
    strictly sequential newviewIterative loop)."""
    levels: List[PackedTraversal]


def levelize(tr: Tree, entries: List[TraversalEntry],
             bucket: bool = False) -> LevelizedTraversal:
    depth = {}
    for i in range(1, tr.mxtips + 1):
        depth[i] = 0
    levels: List[List[TraversalEntry]] = []
    for e in entries:
        d = 1 + max(depth.get(e.q_number, 0), depth.get(e.r_number, 0))
        depth[e.p_number] = d
        while len(levels) < d:
            levels.append([])
        levels[d - 1].append(e)
    packed = []
    for lv in levels:
        if not lv:
            continue
        if bucket:
            packed.append(pack_traversal(tr, lv))
        else:
            packed.append(_pack_exact(tr, lv))
    return LevelizedTraversal(levels=packed)


def _pack_exact(tr: Tree, entries: List[TraversalEntry]) -> PackedTraversal:
    n = len(entries)
    B = tr.num_branches
    p_idx = np.empty(n, dtype=np.int32)
    q_idx = np.empty(n, dtype=np.int32)
    r_idx = np.empty(n, dtype=np.int32)
    tip_tip = np.empty(n, dtype=bool)
    qz = np.empty((n, B))
    rz = np.empty((n, B))
    for i, e in enumerate(entries):
        p_idx[i] = e.p_number
        q_idx[i] = e.q_number
        r_idx[i] = e.r_number
        tip_tip[i] = e.tip_case == TIP_TIP
        qz[i] = e.qz
        rz[i] = e.rz
    return PackedTraversal(count=n, p_idx=p_idx, q_idx=q_idx, r_idx=r_idx,
                           tip_tip=tip_tip, qz=qz, rz=rz)


def pack_grouped(tr: Tree, entries: List[TraversalEntry],
                 group: int = 8, pad_rows=None) -> PackedTraversal:
    """Pack a traversal as aligned blocks of `group` mutually independent
    ops (dependency-safe chunking, scratch-row padding): the grouped
    fused kernels run each block's child DMAs / matmuls concurrently.
    The block count is bucketed so one compiled kernel shape serves many
    traversal lengths. pad_rows: sink rows for padding slots — the HBM
    kernels execute padding unconditionally with all of a block's writes
    in flight at once, so each in-block padding slot needs a DISTINCT
    sink row (pass >= group rows); defaults to the single traversal
    scratch row (safe for sequential consumers)."""
    chunks = chunk_entries(tr, entries, group)
    # power-of-two buckets all the way up: the padded tail costs nothing
    # at run time (the kernel executes only `count` leading slots), only
    # descriptor bytes — so favour few compiled shapes over tight fit
    nb = 4
    while nb < len(chunks):
        nb *= 2
    dummy = 2 * tr.mxtips - 1
    if pad_rows is None:
        pad_rows = [dummy]
    B = tr.num_branches
    L = nb * group

    p_idx = np.empty(L, dtype=np.int32)
    for i in range(L):
        p_idx[i] = pad_rows[i % len(pad_rows)]
    q_idx = np.zeros(L, dtype=np.int32)
    r_idx = np.zeros(L, dtype=np.int32)
    tip_tip = np.ones(L, dtype=bool)
    qz = np.full((L, B), DEFAULTZ)
    rz = np.full((L, B), DEFAULTZ)
    slot_of = np.zeros(len(entries), dtype=np.int64)
    for c, ch in enumerate(chunks):
        s = c * group
        real = ch.src >= 0
        p_idx[s:s + group][real] = ch.p_idx[real]
        q_idx[s:s + group][real] = ch.q_idx[real]
        r_idx[s:s + group][real] = ch.r_idx[real]
        tip_tip[s:s + group] = ch.tip_tip
        qz[s:s + group] = ch.qz
        rz[s:s + group] = ch.rz
        for i, src in enumerate(ch.src[:ch.count]):
            slot_of[src] = s + i
    return PackedTraversal(count=len(entries), p_idx=p_idx, q_idx=q_idx,
                           r_idx=r_idx, tip_tip=tip_tip, qz=qz, rz=rz,
                           n_exec=len(chunks) * group, slot_of=slot_of)


def chunk_entries(tr: Tree, entries: List[TraversalEntry],
                  chunk: int) -> List[PackedTraversal]:
    """Pack traversal entries into fixed-size dependency-safe chunks: a
    chunk never contains a node together with one of its (transitive)
    same-chunk dependencies, so each chunk is one batched update. Fixed
    chunk size means a single compiled kernel shape serves every
    traversal. Chunks are padded with scratch-row dummy updates.

    Chunking is LEVELIZED (dependency depth, one linear pass): nodes of
    one level are mutually independent, so splitting each level into
    chunk-size blocks is safe. The earlier greedy packer rescanned the
    pending list per chunk — O(L^2/chunk), ~10 s of host time per
    10^4-taxon traversal; this is O(L)."""
    dummy = 2 * tr.mxtips - 1
    B = tr.num_branches
    depth = {}
    levels: List[List[tuple]] = []
    for idx, e in enumerate(entries):
        d = 1 + max(depth.get(e.q_number, 0), depth.get(e.r_number, 0))
        depth[e.p_number] = d
        while len(levels) < d:
            levels.append([])
        levels[d - 1].append((idx, e))

    batches: List[List[tuple]] = []
    for lv in levels:
        for s in range(0, len(lv), chunk):
            batches.append(lv[s:s + chunk])

    chunks: List[PackedTraversal] = []
    for batch in batches:
        n = len(batch)
        p_idx = np.full(chunk, dummy, dtype=np.int32)
        q_idx = np.zeros(chunk, dtype=np.int32)
        r_idx = np.zeros(chunk, dtype=np.int32)
        tip_tip = np.ones(chunk, dtype=bool)
        qz = np.full((chunk, B), DEFAULTZ)
        rz = np.full((chunk, B), DEFAULTZ)
        src = np.full(chunk, -1, dtype=np.int64)
        for i, (idx, e) in enumerate(batch):
            p_idx[i] = e.p_number
            q_idx[i] = e.q_number
            r_idx[i] = e.r_number
            tip_tip[i] = e.tip_case == TIP_TIP
            qz[i] = e.qz
            rz[i] = e.rz
            src[i] = idx
        chunks.append(PackedTraversal(count=n, p_idx=p_idx, q_idx=q_idx,
                                      r_idx=r_idx, tip_tip=tip_tip,
                                      qz=qz, rz=rz, src=src))
    return chunks
