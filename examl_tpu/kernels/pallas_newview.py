"""Fused Pallas TPU kernel for batched CLV updates (newview).

One pallas_call processes a whole dependency level: grid = (node,
site-block). The kernel DMAs the two child CLV rows (and their scale
counters) from the resident HBM buffer into VMEM scratch itself, using
scalar-prefetched row indices — a gather with no batched copies — and the
result block is scattered to the destination row of the same buffer
(input/output aliased). Rows written by a level are never read by the same
level (children belong to earlier levels), and the TPU grid runs
sequentially, so the in-place update is race-free. The per-(site,
category) power-of-two underflow scaling is fused into the same pass.

This is the TPU counterpart of the reference's AVX/MIC newview kernels
(reference: examl/avxLikelihood.c newviewGTRGAMMA_AVX :64,
examl/mic_native_dna.c) on the sites-last [rows, C, S, W] layout: per
category, the S×S mode contractions are matmuls with the site axis on
the vector lanes.

P matrices (per node, per category) are precomputed outside the kernel by
a tiny einsum — O(nodes * C * S^2) floats, negligible next to the
site-dimension work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _newview_kernel(p_idx, q_idx, r_idx, tip_tip,       # scalar prefetch
                    clv_hbm, scaler_hbm,                # full buffers (ANY)
                    pl_ref, pr_ref, ev_ref,             # per-node/model mats
                    x3_ref, s3_ref,                     # output blocks
                    x1_s, x2_s, s1_s, s2_s, sems,       # scratch
                    *, n_cats, n_states, bw, min_scale, inv_min_scale):
    n = pl.program_id(0)
    wb = pl.program_id(1)
    q = q_idx[n]
    r = r_idx[n]
    col = wb * bw

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[r, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[r, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    pls = pl_ref[0]         # [C, S, S]
    prs = pr_ref[0]
    ev = ev_ref[...]        # [C, S, S]
    is_tip_tip = tip_tip[n] != 0

    outs = []
    scs = []
    for c in range(n_cats):
        a = jnp.dot(pls[c], x1_s[c], preferred_element_type=jnp.float32)
        b = jnp.dot(prs[c], x2_s[c], preferred_element_type=jnp.float32)
        ab = a * b                                       # [S, BW]
        x3c = jnp.dot(ev[c].T, ab, preferred_element_type=jnp.float32)
        m = jnp.max(jnp.abs(x3c), axis=0)                # [BW]
        scale = jnp.logical_and(m < min_scale,
                                jnp.logical_not(is_tip_tip))
        x3c = jnp.where(scale[None, :], x3c * inv_min_scale, x3c)
        outs.append(x3c)
        scs.append(s1_s[c] + s2_s[c] + scale.astype(jnp.int32))

    x3_ref[0] = jnp.stack(outs)
    s3_ref[0] = jnp.stack(scs)


def newview_level_pallas(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                         pls, prs, ev, *, block_w=2048,
                         min_scale=2.0 ** -30, inv_min_scale=2.0 ** 30,
                         interpret=False):
    """Run one level of newview updates in place.

    clv [rows, C, S, W] f32 (donated), scaler [rows, C, W] int32 (donated),
    p/q/r_idx [N] int32, tip_tip [N] int32, pls/prs [N, C, S, S],
    ev [C, S, S]. Returns the updated (clv, scaler)."""
    rows, n_cats, n_states, W = clv.shape
    N = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(
        _newview_kernel, n_cats=n_cats, n_states=n_states, bw=bw,
        min_scale=min_scale, inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),       # scaler
            pl.BlockSpec((1, n_cats, n_states, n_states),
                         lambda n, w, p, q, r, t: (n, 0, 0, 0)),
            pl.BlockSpec((1, n_cats, n_states, n_states),
                         lambda n, w, p, q, r, t: (n, 0, 0, 0)),
            pl.BlockSpec((n_cats, n_states, n_states),
                         lambda n, w, p, q, r, t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_cats, n_states, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, 0, w)),
            pl.BlockSpec((1, n_cats, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, w)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    clv_out, scaler_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv.shape, clv.dtype),
            jax.ShapeDtypeStruct(scaler.shape, scaler.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},   # clv/scaler updated in place
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, clv, scaler, pls, prs, ev)
    return clv_out, scaler_out


def make_p_batch(qz, rz, gamma, eign, ei):
    """Per-node left/right P matrices for a level: qz/rz [N] ->
    [N, C, S, S] each (the host-side tiny einsum feeding the kernel)."""
    from .reference_jnp import log_z
    lzq = log_z(qz)[:, None, None]                  # [N, 1, 1]
    lzr = log_z(rz)[:, None, None]
    lam = eign * gamma[:, None]                     # [C, S]
    dq = jnp.exp(lam[None] * lzq)                   # [N, C, S]
    dr = jnp.exp(lam[None] * lzr)
    pls = dq[:, :, None, :] * ei[None]              # [N, C, S, S]
    prs = dr[:, :, None, :] * ei[None]
    return pls, prs
