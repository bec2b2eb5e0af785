"""Reference jax.numpy likelihood kernels (single partition).

These are the semantically-exact counterparts of the engine's generic
kernels (reference: examl/newviewGenericSpecial.c newviewGAMMA_FLEX :430,
evaluateGenericSpecial.c evaluateGAMMA_FLEX :154 / calcDiagptable :80,
makenewzGenericSpecial.c sumGAMMA/coreGAMMA_FLEX :169-619), re-expressed as
batched einsums over the site dimension. They define the numerics that the
Pallas kernels must reproduce and serve as the f64 parity path.

Conventions:
  CLVs are mode-basis arrays [C, S, W] — sites LAST so that the site axis
  maps onto TPU vector lanes (C rate categories, S states, W padded
  sites). P-matrices are [C, S, S] with P[c, l, k] = the contribution of
  mode k to state row l: P = EI * exp(EIGN * r_c * lz) (column 0 exactly
  1). Combining children per category: x3 = EVᵀ @ ((P_l @ x1) ∘ (P_r @ x2)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import ZMIN


def make_p(lz, gamma_rates, EIGN, EI):
    """P(z) for each rate category; lz = log(z) (scalar).

    EIGN [C, S] and EI [C, S, S] carry one eigensystem per category: all
    four rows identical for ordinary models, distinct for LG4M/LG4X
    (reference makeP :78 / makeP_FlexLG4 :170). Returns [C, S, S] with
    entry [c, l, k] = exp(EIGN[c, k] r_c lz) EI[c, l, k]; EIGN[:, 0] == 0
    and EI[:, :, 0] == 1, so column 0 is exactly 1."""
    d = jnp.exp(EIGN * gamma_rates[:, None] * lz)               # [C, S]
    return d[:, None, :] * EI


def log_z(z):
    """Branch length to log-space with the reference's lower clamp
    (newviewGenericSpecial.c:982-983)."""
    return jnp.log(jnp.maximum(z, ZMIN))


def newview_kernel(x1, x2, s1, s2, p_left, p_right, EV, tip_tip,
                   min_scale, inv_min_scale):
    """One CLV update: children x1, x2 [C, W, S] with cumulative scale
    counters s1, s2 [C, W] -> (x3, s3).

    Scaling is per (site, rate-category): when every |entry| of a
    category's state vector falls below min_scale, that block is multiplied
    by 1/min_scale and its counter incremented. This refines the
    reference's joint C*S-span check (newviewGAMMA_FLEX :600-616) — joint
    scaling is fine in f64 but under f32 the spread between slow and fast
    Γ categories exceeds the exponent range; per-category counters keep
    every block in range at identical cost (power-of-two multiplies are
    exact, so f64 results agree to rounding). TIP_TIP updates never scale,
    like the reference's TIP_TIP branches."""
    a = jnp.einsum('cls,csw->clw', p_left, x1)
    b = jnp.einsum('cls,csw->clw', p_right, x2)
    x3 = jnp.einsum('clk,clw->ckw', EV, a * b)

    cat_max = jnp.max(jnp.abs(x3), axis=1)                      # [C, W]
    do_scale = jnp.logical_and(cat_max < min_scale,
                               jnp.logical_not(tip_tip))        # [C, W]
    x3 = jnp.where(do_scale[:, None, :], x3 * inv_min_scale, x3)
    s3 = s1 + s2 + do_scale.astype(s1.dtype)
    return x3, s3


def evaluate_kernel(x1, x2, s1, s2, diag, rate_weights, wgt, log_min_scale):
    """Per-partition log likelihood at the root branch.

    diag [C, S] = exp(EIGN r_c log z); rate_weights [C] are the category
    weights *inside* the log (0.25 each for plain GAMMA; fitted weights for
    LG4X) (evaluateGenericSpecial.c:195-200, :1164). s1, s2 [C, W] are the
    endpoints' cumulative scale counters; each count means the stored block
    is min_scale^-1 times the true value, undone here per category before
    the cross-category sum (log-sum with the per-site minimum count pulled
    out of the log)."""
    per_cat = jnp.einsum('csw,cs->cw', x1 * x2, diag)           # [C, W]
    s = s1 + s2                                                 # [C, W]
    smin = jnp.min(s, axis=0)                                   # [W]
    rel = (s - smin[None, :]).astype(per_cat.dtype)
    per_cat = per_cat * jnp.exp(rel * log_min_scale)
    term = jnp.einsum('c,cw->w', rate_weights, per_cat)         # [W]
    site_log = (jnp.log(jnp.abs(term))
                + smin.astype(per_cat.dtype) * log_min_scale)
    lh = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))
    return lh


def sumtable_kernel(x1, x2):
    """Precompute x1 ∘ x2 for Newton-Raphson (sumGAMMA_FLEX semantics)."""
    return x1 * x2


def nr_core_kernel(sumtable, srel, lz, gamma_rates, EIGN, wgt,
                   rate_weights=None):
    """First/second derivative of the partition log-likelihood wrt lz
    (coreGAMMA_FLEX :522-619). srel [C, W] is the branch endpoints'
    combined scale count relative to the per-site minimum (the common
    factor cancels in the derivative ratios). rate_weights [C] are the
    category mixture weights — they cancel in the ratios when uniform
    (plain GAMMA), but must be applied for LG4X's fitted weights
    (coreGTRGAMMAPROT_LG4's `weights` argument). Returns scalars
    (dlnLdlz, d2lnLdlz2). EIGN is per-category [C, S]."""
    lam = EIGN * gamma_rates[:, None]                           # [C, S]
    d = jnp.exp(lam * lz)                                       # [C, S]
    if rate_weights is not None:
        d = d * rate_weights[:, None]
    tmp = d[:, :, None] * sumtable                              # [C, S, W]
    tmp = tmp * srel[:, None, :]
    inv_li = jnp.sum(tmp, axis=(0, 1))                          # [W]
    dln = jnp.einsum('csw,cs->w', tmp, lam)
    d2ln = jnp.einsum('csw,cs->w', tmp, lam * lam)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    dlnLdlz = jnp.sum(jnp.where(live, w * dln, 0.0))
    d2lnLdlz2 = jnp.sum(jnp.where(live, w * (d2ln - dln * dln), 0.0))
    return dlnLdlz, d2lnLdlz2


# ---------------------------------------------------------------------------
# PSR/CAT (per-site rate) kernels: every site carries its own rate category,
# so P matrices and diagonals are gathered per site (reference:
# newviewCAT_FLEX :217, evaluateCAT_FLEX :233, coreCAT_FLEX :368-520).
# CLVs are [1, S, W] (a single storage category); scale counters [1, W].

def make_p_cat(lz, rates, EIGN, EI):
    """P(z) for all (padded) per-site rate categories -> [K, S, S]."""
    d = jnp.exp(EIGN[None, :] * rates[:, None] * lz)
    return d[:, None, :] * EI[None, :, :]


def newview_kernel_cat(x1, x2, s1, s2, p_left, p_right, cat_idx, EV, tip_tip,
                       min_scale, inv_min_scale):
    """CLV update with per-site category P gather; x1/x2 [1, S, W],
    p_left/p_right [K, S, S], cat_idx [W]."""
    pl = p_left[cat_idx]                            # [W, S, S]
    pr = p_right[cat_idx]
    a = jnp.einsum('sw,wls->lw', x1[0], pl)
    b = jnp.einsum('sw,wls->lw', x2[0], pr)
    x3 = jnp.einsum('lw,lk->kw', a * b, EV)[None]   # [1, S, W]

    cat_max = jnp.max(jnp.abs(x3), axis=1)          # [1, W]
    do_scale = jnp.logical_and(cat_max < min_scale,
                               jnp.logical_not(tip_tip))
    x3 = jnp.where(do_scale[:, None, :], x3 * inv_min_scale, x3)
    s3 = s1 + s2 + do_scale.astype(s1.dtype)
    return x3, s3


def evaluate_kernel_cat(x1, x2, s1, s2, site_rates, EIGN, lz, wgt,
                        log_min_scale):
    """Root log likelihood under PSR; site_rates [W] are the concrete
    per-site rates (perSiteRates[rateCategory[i]])."""
    diag = jnp.exp(EIGN[:, None] * site_rates[None, :] * lz)   # [S, W]
    term = jnp.einsum('sw,sw->w', x1[0] * x2[0], diag)
    s = (s1 + s2)[0]
    site_log = jnp.log(jnp.abs(term)) + s.astype(term.dtype) * log_min_scale
    return jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


def nr_core_kernel_cat(sumtable, site_rates, lz, EIGN, wgt):
    """NR derivatives under PSR (coreCAT_FLEX :368-520): the per-site rate
    multiplies the eigenvalues. sumtable [1, W, S]. No scale-relative
    factor is needed: with one category per site the counts cancel in the
    per-site ratio."""
    lam = EIGN[:, None] * site_rates[None, :]                  # [S, W]
    d = jnp.exp(lam * lz)
    tmp = d * sumtable[0]                                      # [S, W]
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam, axis=0)
    d2ln = jnp.sum(tmp * lam * lam, axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    dlnLdlz = jnp.sum(jnp.where(live, w * dln, 0.0))
    d2lnLdlz2 = jnp.sum(jnp.where(live, w * (d2ln - dln * dln), 0.0))
    return dlnLdlz, d2lnLdlz2


def per_site_lnl_kernel(x1, x2, s1, s2, site_rates, EIGN, lz,
                        log_min_scale):
    """Per-site (pattern) log likelihoods at arbitrary per-site rates —
    the vectorized replacement for evaluatePartialGeneric
    (evaluatePartialGenericSpecial.c :190): one traversal evaluates every
    site's rate proposal simultaneously. x1/x2 [1, S, W] (the engine's
    sites-last layout), site_rates [W]."""
    diag = jnp.exp(EIGN[:, None] * site_rates[None, :] * lz)    # [S, W]
    term = jnp.einsum('sw,sw->w', x1[0] * x2[0], diag)
    s = (s1 + s2)[0]
    return jnp.log(jnp.abs(term)) + s.astype(term.dtype) * log_min_scale


def newview_kernel_persite(x1, x2, s1, s2, rates, lzq, lzr, EIGN, EI, EV,
                           tip_tip, min_scale, inv_min_scale):
    """CLV update where every site has its own continuous rate (used by the
    vectorized per-site rate hill climb, replacing evaluatePartialGeneric's
    one-site-at-a-time traversals). x1/x2 [1, S, W] (the engine's
    sites-last layout), rates [W]."""
    dq = jnp.exp(EIGN[:, None] * (rates * lzq)[None, :])   # [S, W]
    dr = jnp.exp(EIGN[:, None] * (rates * lzr)[None, :])
    a = jnp.einsum('kw,lk->lw', x1[0] * dq, EI)
    b = jnp.einsum('kw,lk->lw', x2[0] * dr, EI)
    x3 = jnp.einsum('lw,lk->kw', a * b, EV)[None]          # [1, S, W]

    cat_max = jnp.max(jnp.abs(x3), axis=1)                 # [1, W]
    do_scale = jnp.logical_and(cat_max < min_scale,
                               jnp.logical_not(tip_tip))
    x3 = jnp.where(do_scale[:, None, :], x3 * inv_min_scale, x3)
    s3 = s1 + s2 + do_scale.astype(s1.dtype)
    return x3, s3
