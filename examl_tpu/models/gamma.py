"""Discrete Γ rate-heterogeneity categories.

Computes the K-category discretization of the Γ(α, α) distribution, either
by category means (default) or medians, matching the reference's
makeGammaCats (reference: examl/models.c:3795-3849). The reference uses the
classic AS91/AS32 special-function routines; we use scipy's higher-precision
implementations of the same quantities (gamma quantile and regularized lower
incomplete gamma).
"""
from __future__ import annotations

import numpy as np
from scipy import special
from scipy import stats

from ..constants import ALPHA_MIN


def make_gamma_cats(alpha: float, k: int = 4, use_median: bool = False) -> np.ndarray:
    """Return the K discrete Γ rates for shape alpha (mean normalized to 1)."""
    assert alpha >= ALPHA_MIN
    factor = float(k)
    if use_median:
        middle = 1.0 / (2.0 * k)
        rates = stats.gamma.ppf((2 * np.arange(k) + 1) * middle, a=alpha,
                                scale=1.0 / alpha)
        rates *= factor / rates.sum()
        return rates
    # Mean-per-category discretization: category boundaries are the (i+1)/K
    # quantiles; the mean of Γ(α,β) restricted to [q_i, q_{i+1}] follows from
    # the incomplete-gamma identity I(x; α+1).
    cuts = stats.gamma.ppf((np.arange(k - 1) + 1.0) / k, a=alpha, scale=1.0 / alpha)
    probs = special.gammainc(alpha + 1.0, cuts * alpha)
    rates = np.empty(k)
    rates[0] = probs[0] * factor
    rates[k - 1] = (1.0 - probs[k - 2]) * factor
    for i in range(1, k - 1):
        rates[i] = (probs[i] - probs[i - 1]) * factor
    return rates
