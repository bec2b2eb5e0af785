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
    # codes[t, p]: tip code of taxon t at global pattern column p
    codes: np.ndarray            # [n_taxa, n_patterns] uint8


def read_bytefile(path: str) -> Alignment:
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
        taxon_names.append(data[off:off + ln - 1].decode())
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
        name = data[off:off + ln - 1].decode()
        off += ln
        freqs = np.frombuffer(data, dtype=np.float64, count=states, offset=off).copy()
        off += 8 * states
        partitions.append(PartitionMeta(
            name=name, states=states, max_tip_states=max_tip_states,
            lower=lower, upper=upper, data_type=DataType(data_type),
            prot_model=ProtModel(prot_model), prot_freqs=bool(prot_freqs),
            non_gtr=bool(non_gtr),
            optimize_base_frequencies=bool(optimize_bf), frequencies=freqs))

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
