"""Device-side (jnp) model-tensor construction for the on-device model
optimizer: discrete-Γ rates from alpha and the reversible-model
eigensystem from exchangeabilities + frequencies, mirroring the host
implementations in models/gamma.py and models/eigen.py (reference:
examl/models.c:3795-3849 makeGammaCats, models.c:3234-3587
initReversibleGTR). These run INSIDE jitted optimization programs so a
Brent probe never has to visit the host.

Numerical notes: the Γ quantile is a guarded Newton iteration on the
regularized incomplete gamma (jax.scipy.special.gammainc) from a
Wilson–Hilferty start — the same quantity the reference's AS91 PointChi2
computes; the eigensystem uses jnp.linalg.eigh of the sqrt(f)-symmetrized
generator with the zero eigenvalue rolled to slot 0 (eigh sorts
ascending, so the ~0 eigenvalue of a proper generator is last)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from ..constants import MAX_TIP_EV


def _gamma_quantile(p, a, iters: int = 60):
    """x with P(a, x) = p (regularized lower incomplete gamma inverse).

    Newton in log space: small shapes put quantiles tens of decades below
    1 (a=0.02, p=0.25 -> ~1e-31), where linear-space steps cannot travel;
    u = ln x makes d/du gammainc(a, e^u) = exp(a·u - e^u - lnΓ(a)), which
    never under/overflows in the relevant range. Steps are capped at ±3
    log units, so 60 iterations cover any start-point error."""
    # Wilson–Hilferty chi-squared start (AS91's own initialization)
    z = jsp.ndtri(p)
    t = 1.0 - 1.0 / (9.0 * a) + z * jnp.sqrt(1.0 / (9.0 * a))
    x = jnp.maximum(a * t ** 3, 1e-10)
    u = jnp.log(x)
    lg = jsp.gammaln(a)

    def body(_, u):
        x = jnp.exp(u)
        f = jsp.gammainc(a, x) - p
        dfdu = jnp.exp(a * u - x - lg)
        step = f / jnp.maximum(dfdu, 1e-300)
        return u - jnp.clip(step, -3.0, 3.0)

    return jnp.exp(jax.lax.fori_loop(0, iters, body, u))


def gamma_cats_dev(alpha, k: int = 4, use_median: bool = False):
    """jnp twin of models.gamma.make_gamma_cats: K discrete Γ(α, α) rates
    with mean 1."""
    factor = float(k)
    if use_median:
        p = (2.0 * jnp.arange(k) + 1.0) / (2.0 * k)
        rates = _gamma_quantile(p, alpha) / alpha
        return rates * (factor / jnp.sum(rates))
    p = (jnp.arange(k - 1) + 1.0) / k
    cuts = _gamma_quantile(p, alpha)              # quantiles of Γ(α, 1)
    probs = jsp.gammainc(alpha + 1.0, cuts)
    lo = jnp.concatenate([jnp.zeros(1, probs.dtype), probs])
    hi = jnp.concatenate([probs, jnp.ones(1, probs.dtype)])
    return (hi - lo) * factor


def expand_rates_dev(rates_upper, states: int):
    """Upper-triangle rate list -> full symmetric matrix (jnp)."""
    iu = np.triu_indices(states, k=1)
    r = jnp.zeros((states, states),
                  dtype=rates_upper.dtype).at[iu].set(rates_upper)
    return r + r.T


def make_eigen_dev(rates_upper, frequencies, bits):
    """jnp twin of models.eigen.make_eigen.

    rates_upper [R], frequencies [S], bits: static [ncodes, S] 0/1 matrix
    of the ambiguity codes. Returns (EIGN [S], EV [S,S], EI [S,S],
    tip_vector [ncodes, S]); EIGN[0] == 0, eigenvalues normalized by
    fracchange. EV column signs may differ from the host's LAPACK call —
    the likelihood is invariant (EV/EI/tip_vector flip together)."""
    f = frequencies
    S = f.shape[0]
    r = expand_rates_dev(rates_upper, S)
    fracchange = f @ r @ f
    sq = jnp.sqrt(f)
    a = r * jnp.outer(sq, sq)
    a = a - jnp.diag(jnp.diag(a)) - jnp.diag((r * f[None, :]).sum(axis=1))

    d, vecs = jnp.linalg.eigh(a)                  # ascending; zero is last
    evr = vecs.T * sq[None, :]
    d = jnp.roll(d, 1)
    evr = jnp.roll(evr, 1, axis=0)
    evr = evr.at[0].divide(evr[0].sum())

    EIGN = jnp.concatenate([jnp.zeros(1, d.dtype), -d[1:] / fracchange])
    EV = evr.T
    EI = EV / EV[:, :1]
    EI = EI.at[:, 0].set(1.0)
    tip_vector = jnp.minimum(bits @ evr.T, MAX_TIP_EV)
    return EIGN, EV, EI, tip_vector
