"""Reader/writer for the compact binary alignment ("byte file") format.

Layout (reference: parser/axml.c:2752-2856 writer, examl/byteFile.c:94-382
reader): header {sizeof(size_t) int, version int, magic 6517718 int}, then
numTax int, numPatterns size_t, numPartitions int, gappyness double, the
per-pattern weight array int[numPatterns], taxon names (len-prefixed,
NUL-terminated), per-partition metadata, and finally the alignment codes
stored partition-major, taxon-by-taxon within each partition.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import List

import numpy as np

from ..datatypes import DataType, ProtModel

MAGIC_NUMBER = 6517718
VERSION = 3022      # programVersionInt (reference versionHeader/version.h:3);
                    # examl/byteFile.c:119 rejects byte files whose stamp differs


@dataclasses.dataclass
class PartitionMeta:
    name: str
    states: int
    max_tip_states: int
    lower: int               # global pattern range [lower, upper)
    upper: int
    data_type: DataType
    prot_model: ProtModel    # NONE for non-AA
    prot_freqs: bool         # use the empirical matrix's own frequencies
    non_gtr: bool
    optimize_base_frequencies: bool
    frequencies: np.ndarray  # empirical stationary frequencies [states]

    @property
    def width(self) -> int:
        return self.upper - self.lower


@dataclasses.dataclass
class Alignment:
    n_taxa: int
    n_patterns: int
    gappyness: float
    weights: np.ndarray          # [n_patterns] int
    taxon_names: List[str]
    partitions: List[PartitionMeta]
    # codes[t, p]: tip code of taxon t at global pattern column p.
    # None in mmap mode: the per-partition views below are the storage
    codes: np.ndarray            # [n_taxa, n_patterns] uint8 (or None)
    # mmap mode: per-partition [n_taxa, width] views backed by the byte
    # file on disk — a host touches only the pages its slices read (the
    # reference's per-rank slice ingestion, examl/byteFile.c readMyData
    # :278-382, where a rank seeks to and reads only its assigned
    # chunks)
    codes_mm: "List[np.ndarray] | None" = None

    def partition_codes(self, m: int) -> np.ndarray:
        """[n_taxa, width] tip codes of partition m, without
        materializing other partitions in mmap mode."""
        if self.codes_mm is not None:
            return self.codes_mm[m]
        p = self.partitions[m]
        return self.codes[:, p.lower:p.upper]


class LazyTipCodes:
    """Lazy [T1p, W] int32 tip-code matrix for one partition: row 0 and
    all padding default to `undetermined`; rows 1..n_taxa map to the
    partition's (possibly memmap-backed) byte-file codes. Only the
    requested slice is materialized, so a multi-process engine that
    builds its site shard via jax.make_array_from_callback touches only
    its own columns (readMyData semantics, examl/byteFile.c:278-382).
    `materialized` counts produced bytes (the multihost slice-ingestion
    test's O(1/P) assertion)."""

    def __init__(self, pcodes, t1p: int, W: int, undetermined: int,
                 n_taxa: int):
        self._pcodes = pcodes
        self._undet = undetermined
        self._n_taxa = n_taxa
        self.shape = (t1p, W)
        self.dtype = np.int32
        self.ndim = 2
        self.materialized = 0

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx, slice(None))
        rs, cs = idx
        if not isinstance(rs, slice):
            rs = slice(rs, rs + 1)
        if not isinstance(cs, slice):
            cs = slice(cs, cs + 1)
        r0, r1, rstep = rs.indices(self.shape[0])
        c0, c1, cstep = cs.indices(self.shape[1])
        assert rstep == 1 and cstep == 1
        out = np.full((r1 - r0, c1 - c0), self._undet, dtype=np.int32)
        w = self._pcodes.shape[1]
        rr0 = max(r0, 1)
        rr1 = min(r1, self._n_taxa + 1)
        cc1 = min(c1, w)
        if rr1 > rr0 and cc1 > c0:
            out[rr0 - r0:rr1 - r0, :cc1 - c0] = \
                self._pcodes[rr0 - 1:rr1 - 1, c0:cc1]
        self.materialized += out.nbytes
        return out

    def __array__(self, dtype=None, copy=None):
        full = self[:, :]
        return full if dtype is None else full.astype(dtype)


def read_bytefile(path: str, mmap: bool = False) -> Alignment:
    """Read a byte file. mmap=True keeps the alignment characters on
    disk (np.memmap views per partition): a multi-host process that
    builds only its site shard faults in only those pages — host RSS
    stays O(local slice), matching readMyData's per-rank reads."""
    if mmap:
        data = np.memmap(path, dtype=np.uint8, mode='r')
    else:
        with open(path, 'rb') as fh:
            data = fh.read()
    off = 0

    def take(fmt):
        nonlocal off
        vals = struct.unpack_from('<' + fmt, data, off)
        off += struct.calcsize('<' + fmt)
        return vals if len(vals) > 1 else vals[0]

    sizeof_size_t = take('i')
    assert sizeof_size_t == 8, 'only 64-bit byte files supported'
    version = take('i')
    magic = take('i')
    if magic != MAGIC_NUMBER:
        raise ValueError(f'{path}: not a byte file (bad magic {magic})')

    n_taxa = take('i')
    n_patterns = take('q')
    n_partitions = take('i')
    gappyness = take('d')

    weights = np.frombuffer(data, dtype=np.int32, count=n_patterns, offset=off).copy()
    off += 4 * n_patterns

    taxon_names = []
    for _ in range(n_taxa):
        ln = take('i')
        taxon_names.append(bytes(data[off:off + ln - 1]).decode())
        off += ln

    partitions = []
    for _ in range(n_partitions):
        states = take('i')
        max_tip_states = take('i')
        lower = take('q')
        upper = take('q')
        _width = take('q')
        data_type = take('i')
        prot_model = take('i')
        prot_freqs = take('i')
        non_gtr = take('i')
        optimize_bf = take('i')
        ln = take('i')
        name = bytes(data[off:off + ln - 1]).decode()
        off += ln
        freqs = np.frombuffer(data, dtype=np.float64, count=states, offset=off).copy()
        off += 8 * states
        partitions.append(PartitionMeta(
            name=name, states=states, max_tip_states=max_tip_states,
            lower=lower, upper=upper, data_type=DataType(data_type),
            prot_model=ProtModel(prot_model), prot_freqs=bool(prot_freqs),
            non_gtr=bool(non_gtr),
            optimize_base_frequencies=bool(optimize_bf), frequencies=freqs))

    if mmap:
        codes_mm = []
        for part in partitions:
            w = part.width
            codes_mm.append(data[off:off + n_taxa * w].reshape(n_taxa, w))
            off += n_taxa * w
        return Alignment(n_taxa=n_taxa, n_patterns=n_patterns,
                         gappyness=gappyness, weights=weights,
                         taxon_names=taxon_names, partitions=partitions,
                         codes=None, codes_mm=codes_mm)

    codes = np.empty((n_taxa, n_patterns), dtype=np.uint8)
    for part in partitions:
        w = part.width
        for t in range(n_taxa):
            codes[t, part.lower:part.upper] = np.frombuffer(
                data, dtype=np.uint8, count=w, offset=off)
            off += w

    return Alignment(n_taxa=n_taxa, n_patterns=n_patterns, gappyness=gappyness,
                     weights=weights, taxon_names=taxon_names,
                     partitions=partitions, codes=codes)


def write_bytefile(path: str, aln: Alignment) -> None:
    """Write an Alignment in the reference byte-file layout."""
    with open(path, 'wb') as fh:
        fh.write(struct.pack('<iii', 8, VERSION, MAGIC_NUMBER))
        fh.write(struct.pack('<iqid', aln.n_taxa, aln.n_patterns,
                             len(aln.partitions), aln.gappyness))
        fh.write(np.asarray(aln.weights, dtype=np.int32).tobytes())
        for name in aln.taxon_names:
            raw = name.encode() + b'\0'
            fh.write(struct.pack('<i', len(raw)))
            fh.write(raw)
        for p in aln.partitions:
            # protFreqs stays at the reference's -1 initializer for
            # non-AA partitions (parse-examl only ever assigns it for
            # protein models; examl reads it back verbatim)
            pf = (int(p.prot_freqs) if p.data_type == DataType.AA
                  else -1)
            fh.write(struct.pack('<iiqqqiiiii', p.states, p.max_tip_states,
                                 p.lower, p.upper, p.width, int(p.data_type),
                                 int(p.prot_model), pf,
                                 int(p.non_gtr),
                                 int(p.optimize_base_frequencies)))
            raw = p.name.encode() + b'\0'
            fh.write(struct.pack('<i', len(raw)))
            fh.write(raw)
            fh.write(np.asarray(p.frequencies, dtype=np.float64).tobytes())
        for p in aln.partitions:
            for t in range(aln.n_taxa):
                fh.write(aln.codes[t, p.lower:p.upper].tobytes())
