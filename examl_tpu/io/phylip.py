"""Alignment "compiler": PHYLIP + partition file -> compressed Alignment.

The standalone equivalent of the reference's parse-examl (reference:
parser/axml.c getinput :760, makeweights/sitesort/sitecombcrunch
:1421-1683, makevalues :1690, baseFrequenciesGTR :2617,
parser/parsePartitions.c :100-460):

1. read relaxed PHYLIP (sequential or interleaved), encode tip codes;
2. assign partition models from the partition file (DNA/BIN/MULTI/CODON or
   an AA matrix name, with F = empirical model frequencies and X = optimize
   frequencies suffixes), ranges "a-b", "a-b\\m" (stride), single columns;
3. sort columns by (partition, content) and collapse identical columns into
   weighted patterns, dropping all-undetermined columns;
4. lay patterns out partition-major and compute per-partition empirical
   frequencies with an 8-step EM over ambiguity codes (AA frequencies
   smoothed up to FREQ_MIN).
"""
from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

from ..constants import FREQ_MIN
from ..datatypes import (DataType, ProtModel, encode_lut,
                         encode_sequence, info_for)
from .bytefile import Alignment, PartitionMeta

PROT_MODEL_NAMES = [
    'DAYHOFF', 'DCMUT', 'JTT', 'MTREV', 'WAG', 'RTREV', 'CPREV', 'VT',
    'BLOSUM62', 'MTMAM', 'LG', 'MTART', 'MTZOA', 'PMB', 'HIVB', 'HIVW',
    'JTTDCMUT', 'FLU', 'STMTREV', 'AUTO', 'LG4M', 'LG4X', 'GTR',
]


def read_phylip_matrix(path: str):
    """(taxon_names, bytes matrix [n_taxa, n_sites] uint8) — the fast
    reader for the common one-line-per-taxon sequential layout (whole
    file read once, per-line numpy views, no Python string churn; a
    10 GB alignment costs ~2x its size in RAM). Falls back to the
    generic relaxed reader (interleaved / wrapped lines) otherwise."""
    with open(path, 'rb') as fh:
        data = fh.read()
    nl = data.find(b'\n')
    header = data[:nl].split()
    n_taxa, n_sites = int(header[0]), int(header[1])
    lines = [ln for ln in data[nl + 1:].split(b'\n') if ln.strip()]
    if len(lines) == n_taxa:
        names = []
        mat = np.empty((n_taxa, n_sites), dtype=np.uint8)
        for t, ln in enumerate(lines):
            parts = ln.split(None, 1)
            if len(parts) != 2:
                break
            seq = parts[1].translate(None, b' \t\r')
            if len(seq) < n_sites:
                break
            names.append(parts[0].decode())
            mat[t] = np.frombuffer(seq[:n_sites], dtype=np.uint8)
        else:
            return names, mat
    names, sequences = read_phylip(path)
    mat = np.empty((len(sequences), n_sites), dtype=np.uint8)
    for t, s in enumerate(sequences):
        mat[t] = np.frombuffer(s.encode('ascii'), dtype=np.uint8)
    return names, mat


def read_phylip(path: str) -> Tuple[List[str], List[str]]:
    """Return (taxon_names, sequences) from a relaxed PHYLIP file
    (sequential or interleaved)."""
    with open(path) as fh:
        header = fh.readline().split()
        n_taxa, n_sites = int(header[0]), int(header[1])
        names: List[str] = []
        seqs: List[List[str]] = [[] for _ in range(n_taxa)]
        lengths = [0] * n_taxa
        idx = 0
        first_pass = True
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if first_pass:
                parts = line.split(None, 1)
                names.append(parts[0])
                chunk = parts[1].replace(' ', '').replace('\t', '') \
                    if len(parts) > 1 else ''
            else:
                chunk = line.replace(' ', '').replace('\t', '')
            seqs[idx].append(chunk)
            lengths[idx] += len(chunk)
            idx += 1
            if idx == n_taxa:
                idx = 0
                first_pass = False
            if all(l >= n_sites for l in lengths):
                break
    sequences = [''.join(s)[:n_sites] for s in seqs]
    for i, s in enumerate(sequences):
        if len(s) != n_sites:
            raise ValueError(f'taxon {names[i]}: {len(s)} != {n_sites} sites')
    return names, sequences


class PartitionSpec:
    def __init__(self, name, data_type, prot_model, prot_freqs,
                 optimize_bf, ranges):
        self.name = name
        self.data_type = data_type
        self.prot_model = prot_model
        self.prot_freqs = prot_freqs
        self.optimize_bf = optimize_bf
        self.ranges = ranges  # list of (lower0, upper0_exclusive, stride)


def parse_partition_file(path: str, n_sites: int) -> List[PartitionSpec]:
    specs = []
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            left, right = line.split('=', 1)
            left = left.replace(' ', '').replace('\t', '')
            model, name = left.split(',', 1)
            mu = model.upper()

            prot_model = ProtModel.NONE
            prot_freqs = False
            optimize_bf = False
            if mu in ('DNA', 'DNAX'):
                data_type = DataType.DNA
                optimize_bf = mu.endswith('X')
            elif mu in ('BIN', 'BINX'):
                data_type = DataType.BINARY
                optimize_bf = mu.endswith('X')
            elif mu == 'MULTI':
                data_type = DataType.GENERIC_32
            else:
                data_type = DataType.AA
                base, suffix = mu, ''
                if mu not in PROT_MODEL_NAMES and mu[-1] in 'FX':
                    base, suffix = mu[:-1], mu[-1]
                if base not in PROT_MODEL_NAMES:
                    raise ValueError(f'unknown partition model {model!r}')
                prot_model = ProtModel[base]
                if suffix == 'F':
                    if prot_model in (ProtModel.AUTO, ProtModel.LG4M,
                                      ProtModel.LG4X):
                        raise ValueError(f'{mu}: F suffix deprecated here')
                    prot_freqs = True
                elif suffix == 'X':
                    if prot_model in (ProtModel.AUTO, ProtModel.LG4M,
                                      ProtModel.LG4X):
                        raise ValueError(f'{mu}: X suffix deprecated here')
                    optimize_bf = True

            ranges = []
            for token in right.replace(' ', '').replace('\t', '').split(','):
                if not token:
                    continue
                m = re.fullmatch(r'(\d+)(?:-(\d+))?(?:\\(\d+))?', token)
                if not m:
                    raise ValueError(f'bad range {token!r}')
                lo = int(m.group(1))
                hi = int(m.group(2)) if m.group(2) else lo
                stride = int(m.group(3)) if m.group(3) else 1
                if not (1 <= lo <= hi <= n_sites):
                    raise ValueError(f'range {token!r} outside 1-{n_sites}')
                ranges.append((lo - 1, hi, stride))
            specs.append(PartitionSpec(name, data_type, prot_model,
                                       prot_freqs, optimize_bf, ranges))
    return specs


def _empirical_frequencies(codes: np.ndarray, states: int, bit_vectors,
                           weights: np.ndarray, smooth: bool) -> np.ndarray:
    """8-step EM over ambiguity codes (parser/axml.c
    genericBaseFrequencies :2420).

    Large partitions group the (taxon, column) cells by ambiguity code
    first (the EM update depends on a cell only through its code), which
    turns each EM step into an O(n_codes * states) update instead of an
    O(taxa * width * states) tensor — the masks tensor alone would be
    taxa * width * states * 8 bytes (12.8 GB for a 2000 x 200k x 4
    alignment). Small partitions keep the original cell-order summation:
    its float64 rounding reproduces the shipped parse-examl byte files
    bit-for-bit (tests/test_parser.py)."""
    w = weights.astype(np.float64)
    bits_tbl = np.asarray(bit_vectors).astype(np.uint64)
    shifts = np.arange(states, dtype=np.uint64)

    if codes.size > 2_000_000:
        n_codes = bits_tbl.shape[0]
        cnt = np.zeros(n_codes, dtype=np.float64)
        for t in range(codes.shape[0]):
            cnt += np.bincount(codes[t], weights=w, minlength=n_codes)
        masks = ((bits_tbl[:, None] >> shifts[None, :])
                 & np.uint64(1)).astype(np.float64)  # [n_codes, states]
        pfreqs = np.full(states, 1.0 / states)
        for _ in range(8):
            temp = masks * pfreqs[None, :]
            acc = temp.sum(axis=1)                   # [n_codes]
            with np.errstate(divide='ignore', invalid='ignore'):
                wj = np.where(cnt > 0, cnt / acc, 0.0)
            sumf = (temp * wj[:, None]).sum(axis=0)
            pfreqs = sumf / sumf.sum()
        return _smooth_freqs(pfreqs, smooth)

    bits = bits_tbl[codes]                           # [taxa, width]
    masks = ((bits[:, :, None] >> shifts[None, None, :]) & np.uint64(1)
             ).astype(np.float64)                    # [taxa, width, states]

    pfreqs = np.full(states, 1.0 / states)
    for _ in range(8):
        temp = masks * pfreqs[None, None, :]
        acc = temp.sum(axis=2)                       # [taxa, width]
        wj = w[None, :] / acc
        sumf = (temp * wj[:, :, None]).sum(axis=(0, 1))
        pfreqs = sumf / sumf.sum()
    return _smooth_freqs(pfreqs, smooth)


def _smooth_freqs(pfreqs: np.ndarray, smooth: bool) -> np.ndarray:

    if smooth:
        # push tiny frequencies up to FREQ_MIN (parser smoothFreqs :2331)
        pfreqs = np.asarray(pfreqs)
        guard = 0
        while np.any(pfreqs < FREQ_MIN):
            correction = 0.0
            factor = 1.0
            for v in pfreqs:
                if v == 0.0:
                    correction += FREQ_MIN
                elif v < FREQ_MIN:
                    correction += FREQ_MIN - v
                    factor -= FREQ_MIN - v
            pfreqs = np.where(pfreqs >= FREQ_MIN,
                              pfreqs - pfreqs * correction * factor,
                              FREQ_MIN)
            guard += 1
            assert guard < 100
    else:
        if np.any(pfreqs == 0.0):
            raise ValueError('empirical base frequency of zero; fix data')
    return pfreqs


def build_alignment(names: List[str], sequences,
                    specs: List[PartitionSpec],
                    compress: bool = True) -> Alignment:
    """sequences: list of per-taxon strings, or a uint8 byte matrix
    [n_taxa, n_sites] from read_phylip_matrix."""
    n_taxa = len(names)
    if isinstance(sequences, np.ndarray):
        n_sites = sequences.shape[1]
    else:
        n_sites = len(sequences[0])

    # per-site partition assignment
    site_model = np.full(n_sites, -1, dtype=np.int64)
    for mi, spec in enumerate(specs):
        for lo, hi, stride in spec.ranges:
            cols = np.arange(lo, hi, stride)
            if np.any(site_model[cols] != -1):
                bad = cols[site_model[cols] != -1][0]
                raise ValueError(f'column {bad + 1} assigned twice')
            site_model[cols] = mi
    if np.any(site_model == -1):
        bad = int(np.argmax(site_model == -1))
        raise ValueError(f'column {bad + 1} not assigned to any partition')

    # encode all taxa with the per-column data type: one byte matrix, one
    # 256-entry LUT gather per partition (parse-examl encodes cell by
    # cell, parser/axml.c getyspace/getinput; the LUT gather is the
    # vectorized equivalent)
    if isinstance(sequences, np.ndarray):
        bytes_mat = sequences
    else:
        bytes_mat = np.empty((n_taxa, n_sites), dtype=np.uint8)
        for t in range(n_taxa):
            bytes_mat[t] = np.frombuffer(sequences[t].encode('ascii'),
                                         dtype=np.uint8)
    raw = np.zeros((n_taxa, n_sites), dtype=np.uint8)
    for mi, spec in enumerate(specs):
        cols = site_model == mi
        lut = encode_lut(spec.data_type)
        enc = lut[bytes_mat[:, cols]]
        if np.any(enc == 255):
            inf = info_for(spec.data_type)
            bad = chr(bytes_mat[:, cols][enc == 255][0])
            raise ValueError(
                f"illegal {inf.data_type.name} character {bad!r}")
        raw[:, cols] = enc

    gaps = 0
    total = 0
    for mi, spec in enumerate(specs):
        und = info_for(spec.data_type).undetermined
        cols = site_model == mi
        gaps += int((raw[:, cols] == und).sum())
        total += int(cols.sum()) * n_taxa
    gappyness = gaps / total

    # drop all-undetermined columns
    undet = np.zeros(n_sites, dtype=bool)
    for mi, spec in enumerate(specs):
        und = info_for(spec.data_type).undetermined
        cols = np.flatnonzero(site_model == mi)
        undet[cols] = np.all(raw[:, cols] == und, axis=0)
    keep = ~undet
    raw = raw[:, keep]
    site_model = site_model[keep]

    # sort by (partition, column content) and collapse duplicates
    # (sitesort/sitecombcrunch, parser/axml.c:1421-1683). The sort key is
    # (site_model, taxon-0 code, taxon-1 code, ...), one contiguous byte
    # row per column; the native memcmp qsort (treekernel.c sort_columns)
    # does one stable pass. Fallback without the native library: pack the
    # key bytes big-endian into uint64 chunks — 8 taxa per lexsort key
    # instead of one — with identical ordering.
    from .. import native as _native
    n_cols = raw.shape[1]
    key = np.empty((n_cols, 2 + n_taxa), dtype=np.uint8)
    key[:, 0] = (site_model >> 8).astype(np.uint8)
    key[:, 1] = (site_model & 0xFF).astype(np.uint8)
    key[:, 2:] = raw.T
    order = _native.sort_columns(key)
    if order is None:
        padk = np.pad(key, ((0, 0), (0, (-key.shape[1]) % 8)))
        vals = padk.reshape(n_cols, -1, 8)[:, :, ::-1]
        vals = np.ascontiguousarray(vals).view('<u8')[:, :, 0]
        order = np.lexsort(tuple(vals[:, c]
                                 for c in range(vals.shape[1] - 1, -1,
                                                -1)))
    raw = raw[:, order]
    site_model = site_model[order]
    if compress:
        key = key[order]
        change = np.ones(n_cols, dtype=bool)
        if n_cols > 1:
            change[1:] = np.any(key[1:] != key[:-1], axis=1)
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n_cols))
        patterns = raw[:, starts]
        pat_model = site_model[starts]
        weights = counts.astype(np.int32)
    else:
        patterns = raw
        pat_model = site_model
        weights = np.ones(raw.shape[1], dtype=np.int32)

    # partition-major layout with per-partition [lower, upper)
    partitions = []
    codes_list = []
    wgt_list = []
    lower = 0
    for mi, spec in enumerate(specs):
        sel = pat_model == mi
        width = int(sel.sum())
        part_codes = patterns[:, sel]
        part_w = weights[sel]
        inf = info_for(spec.data_type)
        freqs = _empirical_frequencies(
            part_codes, inf.states, inf.bit_vectors, part_w,
            smooth=(spec.data_type == DataType.AA))
        partitions.append(PartitionMeta(
            name=spec.name, states=inf.states,
            max_tip_states=inf.max_tip_states,
            lower=lower, upper=lower + width,
            data_type=spec.data_type, prot_model=spec.prot_model,
            prot_freqs=spec.prot_freqs, non_gtr=False,
            optimize_base_frequencies=spec.optimize_bf,
            frequencies=freqs))
        codes_list.append(part_codes)
        wgt_list.append(part_w)
        lower += width

    codes = np.concatenate(codes_list, axis=1)
    all_weights = np.concatenate(wgt_list)
    return Alignment(n_taxa=n_taxa, n_patterns=codes.shape[1],
                     gappyness=gappyness, weights=all_weights,
                     taxon_names=names, partitions=partitions, codes=codes)


def parse_phylip(alignment_path: str, partition_path: str,
                 compress: bool = True) -> Alignment:
    names, mat = read_phylip_matrix(alignment_path)
    specs = parse_partition_file(partition_path, mat.shape[1])
    return build_alignment(names, mat, specs, compress=compress)
