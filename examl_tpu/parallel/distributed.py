"""Multi-process (multi-host) runtime support.

The reference runs SPMD over MPI ranks (examl/communication.c,
partitionAssignment.c); the TPU-native equivalent is jax.distributed: every
process runs the identical host program, arrays are globally sharded over
the mesh spanning all processes' devices, the two hot reductions (root lnL,
NR derivatives) lower to psum over ICI, and the only host-level collectives
left are the PSR per-site gathers and checkpoint writes, which use
process_allgather over DCN (replacing MPI Gatherv + the master-side
reordering of communication.c:120-182 — allgather(tiled=True) already
returns global site order).

Device-level layout note: on an XLA SPMD mesh every partition's site axis
is sharded uniformly across all devices (engine._put), NOT Kassian-chunked.
Kassian's algorithm (parallel/assignment.py) balances *rank-local serial
kernel loops* — a concept with no analogue under SPMD, where every device
executes every partition's kernel on its uniform site slice (perfect
per-partition balance by construction). The assignment module remains the
process-level model: it drives the startup load-balance table
(partitionAssignment.c printAssignments :461-502) and byte-file slice
ownership for out-of-core multi-host ingestion.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-process runtime (the MPI_Init analogue). Arguments
    default to the standard jax env vars / cluster autodetection; no-op if
    already initialized or single-process."""
    import jax
    if num_processes is None:
        num_processes = int(os.environ.get('EXAML_TPU_NUM_PROCESSES', '0')) \
            or None
    if process_id is None:
        pid = os.environ.get('EXAML_TPU_PROCESS_ID')
        process_id = int(pid) if pid is not None else None
    if coordinator_address is None:
        coordinator_address = os.environ.get('EXAML_TPU_COORDINATOR')
    if num_processes is None and coordinator_address is None:
        return          # single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_multiprocess() -> bool:
    import jax
    return jax.process_count() > 1


def host_gather(arr) -> np.ndarray:
    """Materialize a (possibly multi-process sharded) jax array on every
    host in global order. Single-process arrays pass through."""
    import jax
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
    return np.asarray(arr)


def put_global(np_arr, sharding):
    """Build a globally-sharded array when the mesh spans processes (each
    process materializes only its addressable shards — np_arr may be a
    lazy provider like io.bytefile.LazyTipCodes, in which case only the
    local shards' bytes are ever produced); plain device_put otherwise."""
    import jax
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            np_arr.shape, sharding, lambda idx: np.asarray(np_arr[idx]))
    return jax.device_put(np_arr, sharding)


def load_balance_table(alignment, n_procs: int) -> str:
    """The startup data-distribution table (the analogue of
    printAssignments/printLoad, partitionAssignment.c:461-502), computed
    from the Kassian assignment at process granularity."""
    from .assignment import assign_partitions, assignment_summary
    assignments = assign_partitions(alignment, n_procs)
    summary = assignment_summary(assignments, n_procs)
    lines = ['Process/device load balance (Kassian assignment, '
             'partitionAssignment.c:398-450):\n']
    for proc, (sites, nparts) in enumerate(summary):
        lines.append(f'  Process {proc}: {nparts} partition(s), '
                     f'{sites} site(s)\n')
    split = {}
    for a in assignments:
        split.setdefault(a.partition_id, []).append(a)
    n_split = sum(1 for v in split.values() if len(v) > 1)
    lines.append(f'  {n_split} partition(s) split across processes\n')
    return ''.join(lines)
