"""Pure-functional single-dispatch likelihood steps.

These are standalone jittable functions over plain arrays (no engine
object), used by __graft_entry__ for compile checks, by the multi-chip
dry-run, and by bench.py. One "step" = CLV traversal wave (lax.scan over
the packed descriptor) + root evaluation + one Newton-Raphson derivative
pass — i.e. everything the SPR search dispatches per move, fused.

Sharding: all site-indexed arrays carry the sites axis last
(CLV [rows, C, S, W], wgt [W], scaler [rows, C, W]); pjit over a
1-D 'sites' mesh axis shards W, and the final jnp.sum reductions become
psums over ICI — the analogue of the reference's per-evaluation
MPI_Allreduce (evaluateGenericSpecial.c:966-973).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from . import constants as C
from .kernels import reference_jnp as K


def traversal_wave(clv, scaler, eign, ei, ev, gamma,
                   p_idx, q_idx, r_idx, tip_tip, qz, rz,
                   min_scale, inv_min_scale):
    """Run a packed traversal descriptor over a single partition's CLV
    buffer [rows, C, W, S]. Returns updated (clv, scaler)."""

    def step(carry, op):
        cl, sc = carry
        pi, qi, ri, tt, z1, z2 = op
        pl = K.make_p(K.log_z(z1), gamma, eign, ei)
        pr = K.make_p(K.log_z(z2), gamma, eign, ei)
        x3, s3 = K.newview_kernel(cl[qi], cl[ri], sc[qi], sc[ri],
                                  pl, pr, ev, tt, min_scale, inv_min_scale)
        return (cl.at[pi].set(x3), sc.at[pi].set(s3)), None

    (clv, scaler), _ = jax.lax.scan(
        step, (clv, scaler), (p_idx, q_idx, r_idx, tip_tip, qz, rz))
    return clv, scaler


def root_log_likelihood(clv, scaler, eign, gamma, rate_weights, wgt,
                        p_row, q_row, qz, log_min_scale):
    lz = jnp.log(jnp.maximum(qz, C.ZMIN))
    diag = jnp.exp(eign * gamma[:, None] * lz)      # eign [C, S]
    return K.evaluate_kernel(clv[q_row], clv[p_row],
                             scaler[q_row], scaler[p_row], diag,
                             rate_weights, wgt, log_min_scale)


def nr_derivatives(clv, scaler, eign, gamma, wgt, p_row, q_row, lz,
                   log_min_scale):
    sumtable = clv[p_row] * clv[q_row]
    s = scaler[p_row] + scaler[q_row]
    smin = jnp.min(s, axis=0)
    srel = jnp.exp((s - smin[None, :]).astype(sumtable.dtype) * log_min_scale)
    return K.nr_core_kernel(sumtable, srel, lz, gamma, eign, wgt)


def full_step(clv, scaler, eign, ei, ev, gamma, rate_weights, wgt,
              p_idx, q_idx, r_idx, tip_tip, qz, rz,
              root_p, root_q, root_z,
              min_scale, inv_min_scale, log_min_scale):
    """Traversal + evaluation + NR derivative pass for one partition.
    Returns (clv, scaler, lnL, dlnLdlz, d2lnLdlz2)."""
    clv, scaler = traversal_wave(clv, scaler, eign, ei, ev, gamma,
                                 p_idx, q_idx, r_idx, tip_tip, qz, rz,
                                 min_scale, inv_min_scale)
    lnl = root_log_likelihood(clv, scaler, eign, gamma, rate_weights, wgt,
                              root_p, root_q, root_z, log_min_scale)
    lz = jnp.log(jnp.maximum(root_z, C.ZMIN))
    d1, d2 = nr_derivatives(clv, scaler, eign, gamma, wgt, root_p, root_q,
                            lz, log_min_scale)
    return clv, scaler, lnl, d1, d2


def level_wave(clv, scaler, eign, ei, ev, gamma, level_args,
               min_scale, inv_min_scale):
    """Level-batched traversal: a static Python loop over dependency
    levels, each level one batched (vmapped) newview over all its nodes.
    No lax.scan / dynamic control flow — the whole wave is straight-line
    gather/compute/scatter, which XLA compiles and schedules well.

    level_args: list of (p_idx, q_idx, r_idx, tip_tip, qz, rz) per level
    (each a fixed-shape array batch)."""
    def batch_newview(x1, x2, s1, s2, z1, z2, tt):
        pl = K.make_p(K.log_z(z1), gamma, eign, ei)
        pr = K.make_p(K.log_z(z2), gamma, eign, ei)
        return K.newview_kernel(x1, x2, s1, s2, pl, pr, ev, tt,
                                min_scale, inv_min_scale)

    vb = jax.vmap(batch_newview)
    for (p_idx, q_idx, r_idx, tip_tip, qz, rz) in level_args:
        x3, s3 = vb(clv[q_idx], clv[r_idx], scaler[q_idx], scaler[r_idx],
                    qz, rz, tip_tip)
        clv = clv.at[p_idx].set(x3)
        scaler = scaler.at[p_idx].set(s3)
    return clv, scaler
