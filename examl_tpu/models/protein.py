"""Empirical amino-acid substitution models.

Loads the 19 classic empirical matrices plus the LG4M/LG4X quadruples from
the bundled npz (published scientific data; same values the reference engine
hard-codes in examl/models.c:225-3060). Rates are the 190 upper-triangle
exchangeabilities, frequencies the matrices' companion stationary
distributions.
"""
from __future__ import annotations

import functools
import importlib.resources as resources

import numpy as np

from ..datatypes import ProtModel

_SINGLE = [
    'DAYHOFF', 'DCMUT', 'JTT', 'MTREV', 'WAG', 'RTREV', 'CPREV', 'VT',
    'BLOSUM62', 'MTMAM', 'LG', 'MTART', 'MTZOA', 'PMB', 'HIVB', 'HIVW',
    'JTTDCMUT', 'FLU', 'STMTREV',
]

# Models eligible for AUTO selection (reference optimizeModel.c:2669 loops
# over 0..AUTO-1 i.e. the 19 single matrices).
AUTO_CANDIDATES = [ProtModel[name] for name in _SINGLE]


@functools.lru_cache(maxsize=1)
def _load():
    ref = resources.files('examl_tpu.models').joinpath('data/prot_matrices.npz')
    with ref.open('rb') as fh:
        return dict(np.load(fh))


def prot_rates_freqs(model: ProtModel, lg4_index: int = 0):
    """Return (rates[190], freqs[20]) for an empirical protein model."""
    data = _load()
    model = ProtModel(model)
    if model in (ProtModel.LG4M, ProtModel.LG4X):
        key = f'{model.name}_{lg4_index}'
    else:
        key = model.name
    return data[f'{key}_rates'].copy(), data[f'{key}_freqs'].copy()


def wag_rates():
    """WAG exchangeabilities — the initializer for AA-GTR mode
    (reference models.c putWAG :81)."""
    rates, _ = prot_rates_freqs(ProtModel.WAG)
    return rates
