"""Native host-side runtime pieces (C, loaded via ctypes).

The compute path is JAX/XLA/Pallas on the accelerator; these are the
host-side hot loops of the search runtime (canonical topology hashing for
the best-tree cache, bipartition hashing / RF for the convergence
criterion) that turn into the host bottleneck at 10^4+ taxa. A Python
fallback is used when the shared library has not been built.

Build: `make -C examl_tpu/native` (or `python -m examl_tpu.native.build`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), 'libtreekernel.so')


def build(verbose: bool = False) -> bool:
    """Compile the shared library in place; returns success."""
    src = os.path.join(os.path.dirname(__file__), 'treekernel.c')
    out = _lib_path()
    cmd = ['cc', '-O2', '-shared', '-fPIC', '-o', out, src]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True)
        if verbose and res.returncode != 0:
            print(res.stderr)
        return res.returncode == 0
    except FileNotFoundError:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    csrc = os.path.join(os.path.dirname(__file__), 'treekernel.c')
    stale = (os.path.exists(path)
             and os.path.getmtime(path) < os.path.getmtime(csrc))
    if not os.path.exists(path) or stale:
        if not build() and not os.path.exists(path):
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    for sym in ('canonical_topology_hash', 'bipartition_hashes',
                'rf_distance_hashes', 'sort_columns'):
        if not hasattr(lib, sym):
            # library predates this source version and the rebuild
            # failed: fall back to the Python paths rather than crash
            return None
    lib.canonical_topology_hash.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.bipartition_hashes.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.bipartition_hashes.restype = ctypes.c_int
    lib.rf_distance_hashes.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int]
    lib.rf_distance_hashes.restype = ctypes.c_int
    lib.sort_columns.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    _LIB = lib
    return lib


def tree_back_array(tr) -> np.ndarray:
    """Flatten a Tree's ring-record back pointers into int64[6*mxtips]."""
    n = tr.mxtips
    back = np.full(3 * 2 * n, -1, dtype=np.int64)

    def rec_index(p):
        if tr.is_tip(p.number):
            return 3 * p.number
        base = tr.nodep[p.number]
        if p is base:
            return 3 * p.number
        if p is base.next:
            return 3 * p.number + 1
        return 3 * p.number + 2

    for i in range(1, 2 * n - 1):
        base = tr.nodep[i]
        if base is None:
            continue
        ring = [base] if tr.is_tip(i) else [base, base.next, base.next.next]
        for p in ring:
            if p.back is not None:
                back[rec_index(p)] = rec_index(p.back)
    return back


def canonical_hash(tr) -> Optional[Tuple[int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    back = tree_back_array(tr)
    out = np.zeros(2, dtype=np.uint64)
    lib.canonical_topology_hash(
        back.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), tr.mxtips,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return int(out[0]), int(out[1])


def bipartition_hashes(tr) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    back = tree_back_array(tr)
    out = np.zeros(2 * tr.mxtips, dtype=np.uint64)
    n = lib.bipartition_hashes(
        back.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), tr.mxtips,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out[:n]


def rf_distance(tr_a, tr_b) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    ha = bipartition_hashes(tr_a)
    hb = bipartition_hashes(tr_b)
    return lib.rf_distance_hashes(
        ha.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(ha),
        hb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(hb))


def sort_columns(keys: np.ndarray) -> Optional[np.ndarray]:
    """Stable lexicographic (memcmp) argsort of alignment column keys
    [n_cols, key_len] uint8; None when the native library is absent."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint8)
    n, klen = keys.shape
    order = np.empty(n, dtype=np.int64)
    lib.sort_columns(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int64(klen),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return order
