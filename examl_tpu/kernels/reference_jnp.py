"""Reference jax.numpy likelihood kernels (single partition).

These are the semantically-exact counterparts of the engine's generic
kernels (reference: examl/newviewGenericSpecial.c newviewGAMMA_FLEX :430,
evaluateGenericSpecial.c evaluateGAMMA_FLEX :154 / calcDiagptable :80,
makenewzGenericSpecial.c sumGAMMA/coreGAMMA_FLEX :169-619), re-expressed as
batched einsums over the site dimension. They define the numerics that the
Pallas kernels must reproduce and serve as the f64 parity path.

Conventions:
  CLVs are mode-basis arrays [C, W, S] (C rate categories, W padded sites,
  S states). P-matrices are [C, S, S] with P[c, l, k] = the contribution of
  mode k to state row l: P = EI * exp(EIGN * r_c * lz) (column 0 exactly 1).
  Combining children: x3 = ((x1 @ P_lᵀ) ∘ (x2 @ P_rᵀ)) @ EV.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import ZMIN


def make_p(lz, gamma_rates, EIGN, EI):
    """P(z) for each rate category; lz = log(z) (scalar).

    Returns [C, S, S]. Entry [c, l, k] = exp(EIGN[k] r_c lz) EI[l, k].
    EIGN[0] == 0 and EI[:, 0] == 1, so column 0 is exactly 1 as in the
    reference (newviewGenericSpecial.c:123-131)."""
    d = jnp.exp(EIGN[None, :] * gamma_rates[:, None] * lz)      # [C, S]
    return d[:, None, :] * EI[None, :, :]


def log_z(z):
    """Branch length to log-space with the reference's lower clamp
    (newviewGenericSpecial.c:982-983)."""
    return jnp.log(jnp.maximum(z, ZMIN))


def newview_kernel(x1, x2, p_left, p_right, EV, wgt, tip_tip,
                   min_scale, inv_min_scale):
    """One CLV update: children x1, x2 [C, W, S] -> (x3, scale_increment).

    Scaling: when every |entry| across the C*S span of a site is below
    min_scale, multiply the site by 1/min_scale and count wgt; TIP_TIP
    updates never scale (newviewGAMMA_FLEX :600-616 and the TIP_TIP branch
    which has no scaling check)."""
    a = jnp.einsum('cws,cls->cwl', x1, p_left)
    b = jnp.einsum('cws,cls->cwl', x2, p_right)
    x3 = jnp.einsum('cwl,lk->cwk', a * b, EV)

    site_max = jnp.max(jnp.abs(x3), axis=(0, 2))                # [W]
    do_scale = jnp.logical_and(site_max < min_scale,
                               jnp.logical_not(tip_tip))        # [W]
    x3 = jnp.where(do_scale[None, :, None], x3 * inv_min_scale, x3)
    increment = jnp.sum(jnp.where(do_scale, wgt, 0).astype(jnp.int64))
    return x3, increment


def evaluate_kernel(x1, x2, diag, rate_weights, wgt, scaler_sum, log_min_scale):
    """Per-partition log likelihood at the root branch.

    diag [C, S] = exp(EIGN r_c log z); rate_weights [C] are the category
    weights *inside* the log (0.25 each for plain GAMMA; fitted weights for
    LG4X) (evaluateGenericSpecial.c:195-200, :1164). scaler_sum is the
    cumulative weighted scale count of both root-branch endpoints."""
    per_cat = jnp.einsum('cws,cs->cw', x1 * x2, diag)           # [C, W]
    term = jnp.einsum('c,cw->w', rate_weights, per_cat)         # [W]
    site_log = jnp.log(jnp.abs(term))
    lh = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))
    return lh + scaler_sum * log_min_scale


def sumtable_kernel(x1, x2):
    """Precompute x1 ∘ x2 for Newton-Raphson (sumGAMMA_FLEX semantics)."""
    return x1 * x2


def nr_core_kernel(sumtable, lz, gamma_rates, EIGN, wgt):
    """First/second derivative of the partition log-likelihood wrt lz
    (coreGAMMA_FLEX :522-619). Returns (dlnLdlz, d2lnLdlz2) scalars."""
    lam = EIGN[None, :] * gamma_rates[:, None]                  # [C, S]
    d = jnp.exp(lam * lz)                                       # [C, S]
    tmp = d[:, None, :] * sumtable                              # [C, W, S]
    inv_li = jnp.sum(tmp, axis=(0, 2))                          # [W]
    dln = jnp.einsum('cws,cs->w', tmp, lam)
    d2ln = jnp.einsum('cws,cs->w', tmp, lam * lam)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    dlnLdlz = jnp.sum(jnp.where(live, w * dln, 0.0))
    d2lnLdlz2 = jnp.sum(jnp.where(live, w * (d2ln - dln * dln), 0.0))
    return dlnLdlz, d2lnLdlz2
