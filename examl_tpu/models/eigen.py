"""Reversible substitution-model eigensystem.

Builds, from exchangeability rates r_ij and stationary frequencies f, the
quantities consumed by the likelihood kernels:

  EIGN      [S]  negated eigenvalues of Q, normalized by fracchange so branch
                 lengths are in expected-substitutions units; EIGN[0] == 0
  EV        [S,S] EV[s, m] = component s of eigenvector m (the "modes" basis);
                 mode 0's eigenvector is the stationary distribution f
  EI        [S,S] EI[s, m] = EV[s, m] / f_s for m >= 1, EI[s, 0] = 1
  tip_vector [ncodes, S] mode-basis lookup rows for every ambiguity code,
                 entries clamped at MAX_TIP_EV

CLVs live in the "mode" basis: propagating a child CLV x̂ through a branch of
length t is (x̂ ∘ exp(EIGN·r·log z)) @ EIᵀ, combining two children is an
elementwise product, and the projection back to modes is @ EV.

Semantics match the reference's initGeneric/initReversibleGTR
(reference: examl/models.c:3234-3587): symmetrize Q with sqrt(f), take the
symmetric eigendecomposition, swap the zero eigenvalue to slot 0 and
normalize its eigenvector to sum 1 (giving f exactly), and divide eigenvalues
by fracchange = Σ f_i r_ij f_j.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import MAX_TIP_EV


@dataclasses.dataclass
class EigenSystem:
    states: int
    fracchange: float
    EIGN: np.ndarray         # [S]
    EV: np.ndarray           # [S, S]
    EI: np.ndarray           # [S, S]
    tip_vector: np.ndarray   # [ncodes, S]
    frequencies: np.ndarray  # [S]


def expand_rates(rates_upper: np.ndarray, states: int) -> np.ndarray:
    """Upper-triangle rate list (row-major, i<j) -> full symmetric matrix."""
    r = np.zeros((states, states))
    iu = np.triu_indices(states, k=1)
    r[iu] = rates_upper
    return r + r.T


def make_eigen(rates_upper, frequencies, bit_vectors) -> EigenSystem:
    """Build the eigensystem for one GTR-style reversible model."""
    f = np.asarray(frequencies, dtype=np.float64)
    states = f.shape[0]
    r = expand_rates(np.asarray(rates_upper, dtype=np.float64), states)

    fracchange = float(f @ r @ f)

    # Symmetrized generator: a[i,j] = r_ij sqrt(f_i f_j), diagonal balances rows.
    sq = np.sqrt(f)
    a = r * np.outer(sq, sq)
    np.fill_diagonal(a, -(r * f[None, :]).sum(axis=1))

    d, vecs = np.linalg.eigh(a)          # ascending eigenvalues; columns = vecs

    # Rows of `evr` are eigenvectors in the unsymmetrized (left) basis.
    evr = vecs.T * sq[None, :]

    # Move the (unique) zero eigenvalue to slot 0 and normalize its
    # eigenvector to sum 1 — this is exactly the stationary distribution.
    zero = int(np.argmax(d))             # eigh: the ~0 eigenvalue is the max
    assert d[zero] > -1e-8
    order = [zero] + [i for i in range(states) if i != zero]
    d = d[order]
    evr = evr[order]
    evr[0] /= evr[0].sum()

    EIGN = np.zeros(states)
    EIGN[1:] = -d[1:] / fracchange
    assert np.all(EIGN[1:] > 0.0), "non-positive eigenvalue in reversible model"

    EV = evr.T.copy()                    # EV[s, m]
    inv_freq = 1.0 / EV[:, 0]
    EI = EV * inv_freq[:, None]
    EI[:, 0] = 1.0

    # Mode-basis tip rows: sum eigenvector rows over the states allowed by
    # each ambiguity code, clamped (models.c:3410-3436).
    ncodes = len(bit_vectors)
    tip_vector = np.zeros((ncodes, states))
    for code in range(ncodes):
        value = int(bit_vectors[code])
        for s in range(states):
            if (value >> s) & 1:
                tip_vector[code] += evr[:, s]
    np.minimum(tip_vector, MAX_TIP_EV, out=tip_vector)

    return EigenSystem(states=states, fracchange=fracchange, EIGN=EIGN,
                       EV=EV, EI=EI, tip_vector=tip_vector, frequencies=f.copy())
