"""Data-type geometry: states, ambiguity bit codes, tip-state alphabets.

Equivalent information to the reference's pLengths table and character
meaning tables (reference: examl/globalVariables.h:95-171,
parser/axml.c:599-705), organized as Python dataclasses.

A tip symbol is stored as a small integer code; its *bit vector* has bit b
set iff the symbol is compatible with state b. Code 0 (no state) is invalid;
the all-ones code is the fully undetermined symbol ('-', '?', 'N'/'X').
"""
from __future__ import annotations

import dataclasses
from enum import IntEnum

import numpy as np


class DataType(IntEnum):
    """Partition data type; integer values match the reference byte-file
    encoding (examl/axml.h:306-315)."""
    BINARY = 0
    DNA = 1
    AA = 2
    SECONDARY = 3
    SECONDARY_6 = 4
    SECONDARY_7 = 5
    GENERIC_32 = 6
    GENERIC_64 = 7


class ProtModel(IntEnum):
    """Protein substitution model ids (examl/axml.h:242-264)."""
    DAYHOFF = 0
    DCMUT = 1
    JTT = 2
    MTREV = 3
    WAG = 4
    RTREV = 5
    CPREV = 6
    VT = 7
    BLOSUM62 = 8
    MTMAM = 9
    LG = 10
    MTART = 11
    MTZOA = 12
    PMB = 13
    HIVB = 14
    HIVW = 15
    JTTDCMUT = 16
    FLU = 17
    STMTREV = 18
    AUTO = 19
    LG4M = 20
    LG4X = 21
    GTR = 22
    NONE = -1


@dataclasses.dataclass(frozen=True)
class DataTypeInfo:
    data_type: DataType
    states: int
    max_tip_states: int          # number of tip codes (= undetermined + 1)
    undetermined: int            # code of the fully-ambiguous symbol
    bit_vectors: np.ndarray      # [max_tip_states] uint32, code -> state bits
    char_to_code: dict           # uppercase char -> code
    inverse_meaning: str         # code -> representative char (for output)


def _dna_info() -> DataTypeInfo:
    # DNA codes are themselves the 4-bit vectors A=1 C=2 G=4 T=8
    # (parser/axml.c:668-691).
    chars = {
        'A': 1, 'B': 14, 'C': 2, 'D': 13, 'G': 4, 'H': 11, 'K': 12, 'M': 3,
        'R': 5, 'S': 6, 'T': 8, 'U': 8, 'V': 7, 'W': 9, 'Y': 10,
        'N': 15, 'O': 15, 'X': 15, '-': 15, '?': 15,
    }
    bit_vectors = np.arange(16, dtype=np.uint32)  # identity: code == bits
    return DataTypeInfo(DataType.DNA, 4, 16, 15, bit_vectors, chars,
                        '_ACMGRSVTWYHKDBN')


def _aa_info() -> DataTypeInfo:
    # 20 canonical AAs (codes 0-19), B = N|D (20), Z = Q|E (21),
    # X/?/*/- fully undetermined (22) (parser/axml.c:639-667,
    # globalVariables.h bitVectorAA).
    order = 'ARNDCQEGHILKMFPSTWYV'
    chars = {c: i for i, c in enumerate(order)}
    chars.update({'B': 20, 'Z': 21, 'X': 22, '?': 22, '*': 22, '-': 22})
    bit_vectors = np.zeros(23, dtype=np.uint32)
    bit_vectors[:20] = np.uint32(1) << np.arange(20, dtype=np.uint32)
    bit_vectors[20] = (1 << 2) | (1 << 3)   # N | D
    bit_vectors[21] = (1 << 5) | (1 << 6)   # Q | E
    bit_vectors[22] = (1 << 20) - 1         # all 20 states
    return DataTypeInfo(DataType.AA, 20, 23, 22, bit_vectors, chars,
                        order + 'BZ-')


def _binary_info() -> DataTypeInfo:
    chars = {'0': 1, '1': 2, '-': 3, '?': 3}
    bit_vectors = np.arange(4, dtype=np.uint32)
    return DataTypeInfo(DataType.BINARY, 2, 4, 3, bit_vectors, chars, '_01-')


def _generic32_info() -> DataTypeInfo:
    # 32-state data, one character per state 0-9A-V, '-'/'?' undetermined
    # (parser/axml.c genericChars32 :609, globalVariables.h bitVector32)
    chars32 = '0123456789ABCDEFGHIJKLMNOPQRSTUV'
    chars = {c: i for i, c in enumerate(chars32)}
    chars.update({'-': 32, '?': 32})
    bit_vectors = np.zeros(33, dtype=np.uint64)
    bit_vectors[:32] = np.uint64(1) << np.arange(32, dtype=np.uint64)
    bit_vectors[32] = np.uint64(2 ** 32 - 1)
    return DataTypeInfo(DataType.GENERIC_32, 32, 33, 32, bit_vectors, chars,
                        chars32 + '-')


DATA_TYPE_INFO = {
    DataType.DNA: _dna_info(),
    DataType.AA: _aa_info(),
    DataType.BINARY: _binary_info(),
    DataType.GENERIC_32: _generic32_info(),
}


def info_for(data_type) -> DataTypeInfo:
    dt = DataType(int(data_type))
    if dt not in DATA_TYPE_INFO:
        raise NotImplementedError(f"data type {dt!r} not supported")
    return DATA_TYPE_INFO[dt]


def encode_lut(data_type: DataType) -> np.ndarray:
    """256-entry char -> tip-code table (255 = illegal character)."""
    inf = info_for(data_type)
    lut = np.full(256, 255, dtype=np.uint8)
    for ch, code in inf.char_to_code.items():
        lut[ord(ch)] = code
        lut[ord(ch.lower())] = code
    return lut


def encode_sequence(seq: str, data_type: DataType) -> np.ndarray:
    """Encode a character sequence into tip codes (uint8)."""
    inf = info_for(data_type)
    lut = encode_lut(data_type)
    raw = np.frombuffer(seq.encode('ascii'), dtype=np.uint8)
    codes = lut[raw]
    if np.any(codes == 255):
        bad = chr(raw[codes == 255][0])
        raise ValueError(f"illegal {inf.data_type.name} character {bad!r}")
    return codes
