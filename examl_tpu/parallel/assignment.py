"""Static load balancing of (partition, site-range) chunks onto devices.

Python port of the reference's "Kassian algorithm"
(reference: examl/partitionAssignment.c assignThesePartitions :156,
assign :398): per data type (2/4/20 states), sort partitions by width,
hand out whole partitions round-robin under a per-device site cap of
ceil(total/P) (decremented to floor once enough devices are full), then
stick-break the remaining partitions so every device ends with cap or
cap-1 sites while the number of partitions split across devices stays
minimal.

The resulting Assignment list is the device-mesh layout used to build the
sharded site arrays (the analogue of readMyData's per-rank slice reads,
examl/byteFile.c:278).
"""
from __future__ import annotations

import dataclasses
import math
from typing import List

from ..io.bytefile import Alignment


@dataclasses.dataclass
class Assignment:
    partition_id: int
    proc_id: int
    offset: int     # offset within the partition
    width: int


def assign_partitions(alignment: Alignment, n_procs: int) -> List[Assignment]:
    out: List[Assignment] = []
    types = sorted({p.states for p in alignment.partitions})
    for states in types:
        parts = [(i, p.width) for i, p in enumerate(alignment.partitions)
                 if p.states == states]
        out.extend(_assign_type(parts, n_procs))
    return out


def _assign_type(parts, n_procs) -> List[Assignment]:
    # sort by width, largest first (phase 1)
    parts = sorted(parts, key=lambda t: -t[1])
    total = sum(w for _, w in parts)
    cap = math.ceil(total / n_procs)
    remainder = cap * n_procs - total     # this many procs get cap-1

    size_assigned = [0] * n_procs
    out: List[Assignment] = []
    n_full = 0

    def bump_full():
        nonlocal n_full, cap
        n_full += 1
        if n_full == n_procs - remainder:
            cap -= 1

    # phase 2: whole partitions round-robin while they fit under the cap
    it = 0
    while True:
        advanced = False
        for proc in range(n_procs):
            if it >= len(parts):
                break
            pid, width = parts[it]
            if size_assigned[proc] + width <= cap:
                out.append(Assignment(pid, proc, 0, width))
                size_assigned[proc] += width
                if size_assigned[proc] == cap:
                    bump_full()
                it += 1
                advanced = True
            else:
                advanced = False
                break
        else:
            if advanced:
                continue
        break

    # phase 4: stick-break the remaining partitions into the open devices
    open_procs = [p for p in range(n_procs) if size_assigned[p] < cap]
    consumed = 0   # consumed prefix of the current partition
    while it < len(parts):
        pid, width = parts[it]
        left = width - consumed
        if not open_procs:
            raise AssertionError('no open device but sites remain')
        proc = open_procs[0]
        room = cap - size_assigned[proc]
        take = min(room, left)
        out.append(Assignment(pid, proc, consumed, take))
        size_assigned[proc] += take
        consumed += take
        if size_assigned[proc] >= cap:
            bump_full()
            open_procs.pop(0)
            # the cap may have dropped; re-check remaining procs
            open_procs = [p for p in open_procs if size_assigned[p] < cap]
        if consumed == width:
            it += 1
            consumed = 0

    return out


def assignment_summary(assignments: List[Assignment], n_procs: int):
    """Per-device (sites, partitions) table — the reference's startup
    load-balance printout (partitionAssignment.c printAssignments :461)."""
    sites = [0] * n_procs
    nparts = [0] * n_procs
    for a in assignments:
        sites[a.proc_id] += a.width
        nparts[a.proc_id] += 1
    return list(zip(sites, nparts))
