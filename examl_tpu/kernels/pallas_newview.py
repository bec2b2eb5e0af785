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
    # Precision.HIGHEST: the MXU multiplies bf16 natively; the default
    # single-pass truncation costs ~1e-3 relative error per contraction,
    # which compounds over tree depth into whole log-likelihood units.
    # The 3-pass f32 mode keeps the kernel bit-comparable to f32 math.
    hi = jax.lax.Precision.HIGHEST
    for c in range(n_cats):
        a = jnp.dot(pls[c], x1_s[c], preferred_element_type=jnp.float32,
                    precision=hi)
        b = jnp.dot(prs[c], x2_s[c], preferred_element_type=jnp.float32,
                    precision=hi)
        ab = a * b                                       # [S, BW]
        x3c = jnp.dot(ev[c].T, ab, preferred_element_type=jnp.float32,
                      precision=hi)
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


def _traversal_fused_kernel(p_idx, q_idx, r_idx, tip_tip, lzq, lzr,
                            clv_hbm, scaler_hbm, lam_ref, ei_ref, ev_ref,
                            out_clv, out_scaler,
                            sems,
                            *, n_ops, n_rows, n_cats, n_states, bw,
                            min_scale, inv_min_scale):
    """Whole-traversal CLV wave, one kernel instance per site block: the
    CLV column block of every (used) row lives in VMEM while every
    traversal op runs, so HBM sees one read + one write per row instead of
    one round trip per level (the reference's newviewIterative loop,
    newviewGenericSpecial.c :917, pays DRAM per node; the level-batched
    kernel pays HBM per level). P matrices are built on the fly from the
    per-op log branch lengths and the shared eigensystem (makeP,
    newviewGenericSpecial.c:78), so the op list costs only scalars. Ops
    execute in descriptor order — dependency-safe by construction,
    identical to the jnp scan semantics."""
    wb = pl.program_id(0)
    col = wb * bw

    # bring the used CLV rows' column block into VMEM (the output block is
    # the working buffer; input_output_aliases make this in-place)
    cp_in = pltpu.make_async_copy(
        clv_hbm.at[pl.ds(0, n_rows), :, :, pl.ds(col, bw)], out_clv,
        sems.at[0])
    cp_in2 = pltpu.make_async_copy(
        scaler_hbm.at[pl.ds(0, n_rows), :, pl.ds(col, bw)], out_scaler,
        sems.at[1])
    cp_in.start()
    cp_in2.start()
    cp_in.wait()
    cp_in2.wait()

    lam = lam_ref[...]                         # [C, S] = EIGN * r_c
    ei = ei_ref[...]                           # [C, S, S]
    ev = ev_ref[...]                           # [C, S, S]
    hi = jax.lax.Precision.HIGHEST

    def body(n, _):
        q = q_idx[n]
        r = r_idx[n]
        p = p_idx[n]
        x1 = out_clv[q]                        # [C, S, BW]
        x2 = out_clv[r]
        dq = jnp.exp(lam * lzq[n])             # [C, S]
        dr = jnp.exp(lam * lzr[n])
        is_tt = tip_tip[n] != 0
        outs = []
        scs = []
        for c in range(n_cats):
            pls = dq[c][None, :] * ei[c]       # [S, S] = makeP row
            prs = dr[c][None, :] * ei[c]
            a = jnp.dot(pls, x1[c], preferred_element_type=jnp.float32,
                        precision=hi)
            b = jnp.dot(prs, x2[c], preferred_element_type=jnp.float32,
                        precision=hi)
            x3c = jnp.dot(ev[c].T, a * b,
                          preferred_element_type=jnp.float32, precision=hi)
            m = jnp.max(jnp.abs(x3c), axis=0)
            scale = jnp.logical_and(m < min_scale, jnp.logical_not(is_tt))
            x3c = jnp.where(scale[None, :], x3c * inv_min_scale, x3c)
            outs.append(x3c)
            scs.append(out_scaler[q, c] + out_scaler[r, c]
                       + scale.astype(jnp.int32))
        out_clv[p] = jnp.stack(outs)
        out_scaler[p] = jnp.stack(scs)
        return 0

    jax.lax.fori_loop(0, n_ops, body, 0)


def traversal_fused_pallas(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                           lzq, lzr, lam, ei, ev, *, n_rows=None,
                           block_w=512, min_scale=2.0 ** -30,
                           inv_min_scale=2.0 ** 30, interpret=False):
    """Run a whole packed traversal in ONE pallas_call. clv [rows, C, S, W]
    (donated); lzq/lzr [L] f32 log branch lengths per op; lam [C, S] =
    EIGN * gamma_rate; n_rows bounds the VMEM-resident row range (ops must
    only touch rows < n_rows). Use when the column working set fits VMEM
    (see the engine's fallback to the level kernels)."""
    rows, n_cats, n_states, W = clv.shape
    L = p_idx.shape[0]
    n_rows = rows if n_rows is None else n_rows
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(
        _traversal_fused_kernel, n_ops=L, n_rows=n_rows, n_cats=n_cats,
        n_states=n_states, bw=bw, min_scale=min_scale,
        inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(W // bw,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),       # scaler
            pl.BlockSpec((n_cats, n_states),
                         lambda w, *_: (0, 0)),
            pl.BlockSpec((n_cats, n_states, n_states),
                         lambda w, *_: (0, 0, 0)),
            pl.BlockSpec((n_cats, n_states, n_states),
                         lambda w, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((n_rows, n_cats, n_states, bw),
                         lambda w, *_: (0, 0, 0, w)),
            pl.BlockSpec((n_rows, n_cats, bw),
                         lambda w, *_: (0, 0, w)),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # out_shape matches the full buffer and aliases it; the kernel only
    # ever writes the first n_rows rows' blocks — the scratch-row tail
    # keeps its previous contents (in-place update semantics)
    clv_out, scaler_out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv.shape, clv.dtype),
            jax.ShapeDtypeStruct(scaler.shape, scaler.dtype),
        ],
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, lzq, lzr, clv, scaler, lam, ei, ev)
    return clv_out, scaler_out


def _tip_kernel(codes_ref, tipvec_ref, clv_in, out_clv,
                *, n_cats, n_states, n_codes, bw, n_tips):
    """Materialize tip CLV rows on device: out[t,c,:,w] =
    tipvec[c, codes[t,w], :]. The gather is a one-hot matmul so the site
    axis stays on the lanes (replacing round 1's host-side numpy gather,
    whose per-model-change re-upload cost ~4 MB per partition through the
    device tunnel on every optimizer probe). Blocks cover 8 rows (sublane
    tile); row 0 and any non-tip rows inside the last block keep their
    previous contents."""
    t = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_codes, bw), 0)
    hi = jax.lax.Precision.HIGHEST
    for i in range(8):
        row = t * 8 + i
        codes = codes_ref[i]                   # [BW] int32
        onehot = (codes[None, :] == iota).astype(jnp.float32)
        outs = []
        for c in range(n_cats):
            tv = tipvec_ref[c]                 # [n_codes, S]
            outs.append(jnp.dot(tv.T, onehot,
                                preferred_element_type=jnp.float32,
                                precision=hi))     # [S, BW]
        tip_block = jnp.stack(outs)
        is_tip = jnp.logical_and(row >= 1, row <= n_tips)
        out_clv[i] = jnp.where(is_tip, tip_block, clv_in[i])


def tip_rows_pallas(clv, codes, tipvec, n_tips, *, block_w=8192,
                    interpret=False):
    """Fill rows 1..n_tips of the CLV buffer with materialized tip
    vectors. codes [T1p, W] int32 with T1p a multiple of 8 (row 0 + tail
    padding ignored), tipvec [C, n_codes, S]."""
    rows, n_cats, n_states, W = clv.shape
    T1p = codes.shape[0]
    assert T1p % 8 == 0 and T1p <= rows
    n_codes = tipvec.shape[1]
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(_tip_kernel, n_cats=n_cats,
                               n_states=n_states, n_codes=n_codes, bw=bw,
                               n_tips=n_tips)
    out = pl.pallas_call(
        kernel,
        grid=(T1p // 8, W // bw),
        in_specs=[
            pl.BlockSpec((8, bw), lambda t, w: (t, w)),
            pl.BlockSpec((n_cats, n_codes, n_states),
                         lambda t, w: (0, 0, 0)),
            pl.BlockSpec((8, n_cats, n_states, bw),
                         lambda t, w: (t, 0, 0, w)),
        ],
        out_specs=pl.BlockSpec((8, n_cats, n_states, bw),
                               lambda t, w: (t, 0, 0, w)),
        out_shape=jax.ShapeDtypeStruct(clv.shape, clv.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(codes, tipvec, clv)
    return out


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


# ---------------------------------------------------------------------------
# Root log-likelihood and Newton-Raphson derivative kernels. On this stack
# XLA programs that touch the big CLV buffers compile pathologically slowly
# through the remote-compile path, while Mosaic kernels compile in seconds —
# so the whole per-move hot path (newview/evaluate/derivatives) is Pallas.

def _evaluate_kernel(p_row, q_row,                       # scalar prefetch
                     clv_hbm, scaler_hbm, diag_ref, rw_ref, wgt_ref,
                     out_ref,
                     x1_s, x2_s, s1_s, s2_s, sems,
                     *, n_cats, n_states, bw, log_min_scale):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    diag = diag_ref[...]                       # [C, S]
    rw = rw_ref[...]                           # [C]
    s = s1_s[...] + s2_s[...]                  # [C, BW]
    smin = jnp.min(s, axis=0)                  # [BW]
    rel = (s - smin[None, :]).astype(jnp.float32)

    term = jnp.zeros((bw,), jnp.float32)
    for c in range(n_cats):
        pc = jnp.zeros((bw,), jnp.float32)
        for k in range(n_states):
            pc = pc + x1_s[c, k] * x2_s[c, k] * diag[c, k]
        term = term + rw[c] * pc * jnp.exp(rel[c] * log_min_scale)

    wgt = wgt_ref[...]
    site_log = (jnp.log(jnp.abs(term))
                + smin.astype(jnp.float32) * log_min_scale)
    out_ref[0, 0] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


def evaluate_pallas(clv, scaler, p_row, q_row, diag, rate_weights, wgt,
                    *, block_w=8192, log_min_scale=float(np.log(2.0 ** -30)),
                    interpret=False):
    """Per-partition root log likelihood (GAMMA/LG4). Returns a scalar."""
    rows, n_cats, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw

    kernel = functools.partial(_evaluate_kernel, n_cats=n_cats,
                               n_states=n_states, bw=bw,
                               log_min_scale=log_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_cats, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((n_cats,), lambda w, p, q: (0,)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda w, p, q: (w, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, diag, rate_weights, wgt)
    return jnp.sum(partials)


def _evaluate_batch_kernel(p_rows, q_rows,                # scalar prefetch
                           clv_hbm, scaler_hbm, diag_ref, rw_ref, wgt_ref,
                           out_ref,
                           x1_s, x2_s, s1_s, s2_s, sems,
                           *, n_cats, n_states, bw, log_min_scale):
    """Batched root-likelihood kernel: grid (candidate, site-block); each
    candidate evaluates the branch between buffer rows p_rows[n] and
    q_rows[n] with its own diagonal table diag_ref[n] (the SPR candidate
    wave replacing one evaluateGeneric dispatch per insertion,
    searchAlgo.c:682-777)."""
    n = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    diag = diag_ref[0]                         # [C, S]
    rw = rw_ref[...]                           # [C]
    s = s1_s[...] + s2_s[...]                  # [C, BW]
    smin = jnp.min(s, axis=0)
    rel = (s - smin[None, :]).astype(jnp.float32)

    term = jnp.zeros((bw,), jnp.float32)
    for c in range(n_cats):
        pc = jnp.zeros((bw,), jnp.float32)
        for k in range(n_states):
            pc = pc + x1_s[c, k] * x2_s[c, k] * diag[c, k]
        term = term + rw[c] * pc * jnp.exp(rel[c] * log_min_scale)

    wgt = wgt_ref[...]
    site_log = (jnp.log(jnp.abs(term))
                + smin.astype(jnp.float32) * log_min_scale)
    # whole-array SMEM output (TPU requires full-shape scalar blocks);
    # each sequential grid step writes its own cell
    out_ref[n, wb] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


def evaluate_batch_pallas(clv, scaler, p_rows, q_rows, diags, rate_weights,
                          wgt, *, block_w=8192,
                          log_min_scale=float(np.log(2.0 ** -30)),
                          interpret=False):
    """Batched per-partition root log likelihoods -> [N]."""
    rows, n_cats, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw

    kernel = functools.partial(_evaluate_batch_kernel, n_cats=n_cats,
                               n_states=n_states, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_cats, n_states),
                         lambda n, w, p, q: (n, 0, 0)),
            pl.BlockSpec((n_cats,), lambda n, w, p, q: (0,)),
            pl.BlockSpec((bw,), lambda n, w, p, q: (w,)),
        ],
        out_specs=pl.BlockSpec((N, nb), lambda n, w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, nb), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, diags, rate_weights, wgt)
    return jnp.sum(partials, axis=1)


def evaluate_batch_gamma(clv, scaler, p_rows, q_rows, lzs, eign, gamma,
                         rate_weights, wgt, *, block_w=8192,
                         log_min_scale=float(np.log(2.0 ** -30)),
                         interpret=False):
    """GAMMA batched evaluate: builds per-candidate diagonals on device
    (diag[n] = exp(EIGN r_c lzs[n])) then runs the batched kernel."""
    diags = jnp.exp(eign[None] * gamma[None, :, None]
                    * lzs[:, None, None]).astype(jnp.float32)
    return evaluate_batch_pallas(clv, scaler, p_rows, q_rows, diags,
                                 rate_weights, wgt, block_w=block_w,
                                 log_min_scale=log_min_scale,
                                 interpret=interpret)


def _evaluate_batch_psr_kernel(p_rows, q_rows,
                               clv_hbm, scaler_hbm, lam_ref, wgt_ref,
                               rates_ref,
                               out_ref,
                               x1_s, x2_s, s1_s, s2_s, sems,
                               *, n_states, bw, log_min_scale):
    n = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0]                           # [S] = EIGN * lz of cand n
    rates = rates_ref[...]                     # [BW]
    term = jnp.zeros((bw,), jnp.float32)
    for k in range(n_states):
        term = term + x1_s[0, k] * x2_s[0, k] * jnp.exp(lam[k] * rates)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[...]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[n, wb] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


def evaluate_batch_psr(clv, scaler, p_rows, q_rows, lzs, eign, wgt,
                       site_rates, *, block_w=8192,
                       log_min_scale=float(np.log(2.0 ** -30)),
                       interpret=False):
    """PSR batched evaluate -> [N]; eign [S], lzs [N]."""
    rows, one, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    nb = W // bw
    lams = (eign[None, :] * lzs[:, None]).astype(jnp.float32)   # [N, S]
    kernel = functools.partial(_evaluate_batch_psr_kernel,
                               n_states=n_states, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_states), lambda n, w, p, q: (n, 0)),
            pl.BlockSpec((bw,), lambda n, w, p, q: (w,)),
            pl.BlockSpec((bw,), lambda n, w, p, q: (w,)),
        ],
        out_specs=pl.BlockSpec((N, nb), lambda n, w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, nb), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, lams, wgt, site_rates)
    return jnp.sum(partials, axis=1)


def _nr_batch_kernel(p_rows, q_rows,                     # scalar prefetch
                     clv_hbm, scaler_hbm, lam_ref, rw_ref, wgt_ref,
                     lzs_ref,
                     out_ref,
                     x1_s, x2_s, s1_s, s2_s, sems,
                     *, n_cats, n_states, bw, log_min_scale):
    """Batched NR derivatives: candidate n evaluates d lnL/d lz at its own
    branch length lzs[n] between rows p_rows[n]/q_rows[n] — the kernel
    behind the vectorized thorough-insertion smoother (each candidate of
    an SPR wave optimizes its three junction branches simultaneously;
    the reference runs one makenewzIterative per candidate,
    searchAlgo.c:484-566)."""
    n = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[...]                         # [C, S] = EIGN * r_c
    rw = rw_ref[...]                           # [C]
    lz = lzs_ref[n]
    s = s1_s[...] + s2_s[...]
    smin = jnp.min(s, axis=0)
    rel = (s - smin[None, :]).astype(jnp.float32)

    inv_li = jnp.zeros((bw,), jnp.float32)
    dln = jnp.zeros((bw,), jnp.float32)
    d2ln = jnp.zeros((bw,), jnp.float32)
    for c in range(n_cats):
        srel = jnp.exp(rel[c] * log_min_scale)
        for k in range(n_states):
            d_ck = rw[c] * jnp.exp(lam[c, k] * lz)
            tmp = d_ck * x1_s[c, k] * x2_s[c, k] * srel
            inv_li = inv_li + tmp
            dln = dln + tmp * lam[c, k]
            d2ln = d2ln + tmp * (lam[c, k] * lam[c, k])

    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[...]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[n, wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[n, wb, 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


def nr_derivatives_batch_pallas(clv, scaler, p_rows, q_rows, lam,
                                rate_weights, wgt, lzs, *, block_w=8192,
                                log_min_scale=float(np.log(2.0 ** -30)),
                                interpret=False):
    """(d1[N], d2[N]) for N branches with per-candidate lengths lzs[N];
    lam [C, S] = EIGN * r_c (shared)."""
    rows, n_cats, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    kernel = functools.partial(_nr_batch_kernel, n_cats=n_cats,
                               n_states=n_states, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_cats, n_states), lambda n, w, p, q: (0, 0)),
            pl.BlockSpec((n_cats,), lambda n, w, p, q: (0,)),
            pl.BlockSpec((bw,), lambda n, w, p, q: (w,)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [N]
        ],
        out_specs=pl.BlockSpec((N, nb, 2), lambda n, w, p, q: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, nb, 2), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, lam, rate_weights, wgt, lzs)
    sums = jnp.sum(partials, axis=1)
    return sums[:, 0], sums[:, 1]


def _nr_kernel(p_row, q_row,
               clv_hbm, scaler_hbm, lam_ref, d_ref, wgt_ref,
               out_ref,
               x1_s, x2_s, s1_s, s2_s, sems,
               *, n_cats, n_states, bw, log_min_scale):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[...]                         # [C, S] = EIGN * r_c
    d = d_ref[...]                             # [C, S] = w_c * exp(lam lz)
    s = s1_s[...] + s2_s[...]
    smin = jnp.min(s, axis=0)
    rel = (s - smin[None, :]).astype(jnp.float32)

    inv_li = jnp.zeros((bw,), jnp.float32)
    dln = jnp.zeros((bw,), jnp.float32)
    d2ln = jnp.zeros((bw,), jnp.float32)
    for c in range(n_cats):
        srel = jnp.exp(rel[c] * log_min_scale)
        for k in range(n_states):
            tmp = d[c, k] * x1_s[c, k] * x2_s[c, k] * srel
            inv_li = inv_li + tmp
            dln = dln + tmp * lam[c, k]
            d2ln = d2ln + tmp * (lam[c, k] * lam[c, k])

    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[...]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[0, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[0, 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


def nr_derivatives_pallas(clv, scaler, p_row, q_row, lam, d, wgt,
                          *, block_w=8192,
                          log_min_scale=float(np.log(2.0 ** -30)),
                          interpret=False):
    """(dlnLdlz, d2lnLdlz2) for the branch between rows p and q.
    lam [C, S] = EIGN*r_c; d [C, S] = rate_weight_c * exp(lam * lz)."""
    rows, n_cats, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw

    kernel = functools.partial(_nr_kernel, n_cats=n_cats,
                               n_states=n_states, bw=bw,
                               log_min_scale=log_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_cats, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((n_cats, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda w, p, q: (w, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, n_states, bw), jnp.float32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.VMEM((n_cats, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 2), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, lam, d, wgt)
    sums = jnp.sum(partials, axis=0)
    return sums[0], sums[1]


# ---------------------------------------------------------------------------
# PSR (per-site rate) kernels. Instead of gathering per-site P matrices
# (the reference's cptr lookup, newviewCAT_FLEX :217), the per-site rates
# enter the exponent directly: d[s, w] = exp(EIGN[s] * r_w * lz), an
# elementwise VPU computation with the site axis on the lanes — the
# natural TPU shape of the CAT model. CLVs are [1, S, W].

def _newview_psr_kernel(p_idx, q_idx, r_idx, tip_tip,
                        clv_hbm, scaler_hbm, lamq_ref, lamr_ref, ei_ref,
                        ev_ref, rates_ref,
                        x3_ref, s3_ref,
                        x1_s, x2_s, s1_s, s2_s, sems,
                        *, n_states, bw, min_scale, inv_min_scale):
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

    rates = rates_ref[...]                     # [BW]
    lamq = lamq_ref[0]                         # [S] = EIGN * lzq of node n
    lamr = lamr_ref[0]
    dq = jnp.exp(lamq[:, None] * rates[None, :])    # [S, BW]
    dr = jnp.exp(lamr[:, None] * rates[None, :])
    ei = ei_ref[...]                           # [S, S]
    ev = ev_ref[...]
    hi = jax.lax.Precision.HIGHEST

    a = jnp.dot(ei, x1_s[0] * dq, preferred_element_type=jnp.float32,
                precision=hi)
    b = jnp.dot(ei, x2_s[0] * dr, preferred_element_type=jnp.float32,
                precision=hi)
    ab = a * b
    x3 = jnp.dot(ev.T, ab, preferred_element_type=jnp.float32, precision=hi)

    m = jnp.max(jnp.abs(x3), axis=0)
    is_tip_tip = tip_tip[n] != 0
    scale = jnp.logical_and(m < min_scale, jnp.logical_not(is_tip_tip))
    x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
    x3_ref[0, 0] = x3
    s3_ref[0, 0] = s1_s[0] + s2_s[0] + scale.astype(jnp.int32)


def newview_level_pallas_psr(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                             lamq, lamr, ei, ev, site_rates, *,
                             block_w=8192, min_scale=2.0 ** -30,
                             inv_min_scale=2.0 ** 30, interpret=False):
    """One level of PSR newview updates in place. clv [rows, 1, S, W];
    lamq/lamr [N, S] = EIGN * log(z) per node; site_rates [W] = the
    concrete per-site rates (perSiteRates[rateCategory])."""
    rows, one, n_states, W = clv.shape
    assert one == 1
    N = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(_newview_psr_kernel, n_states=n_states,
                               bw=bw, min_scale=min_scale,
                               inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_states), lambda n, w, p, q, r, t: (n, 0)),
            pl.BlockSpec((1, n_states), lambda n, w, p, q, r, t: (n, 0)),
            pl.BlockSpec((n_states, n_states),
                         lambda n, w, p, q, r, t: (0, 0)),
            pl.BlockSpec((n_states, n_states),
                         lambda n, w, p, q, r, t: (0, 0)),
            pl.BlockSpec((bw,), lambda n, w, p, q, r, t: (w,)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n_states, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, 0, w)),
            pl.BlockSpec((1, 1, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, w)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    clv_out, scaler_out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv.shape, clv.dtype),
            jax.ShapeDtypeStruct(scaler.shape, scaler.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, clv, scaler, lamq, lamr, ei, ev,
      site_rates)
    return clv_out, scaler_out


def _evaluate_psr_kernel(p_row, q_row,
                         clv_hbm, scaler_hbm, lam_ref, wgt_ref, rates_ref,
                         out_ref,
                         x1_s, x2_s, s1_s, s2_s, sems,
                         *, n_states, bw, log_min_scale):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[...]                         # [1, S] = EIGN * lz
    rates = rates_ref[...]                     # [BW]
    term = jnp.zeros((bw,), jnp.float32)
    for k in range(n_states):
        d = jnp.exp(lam[0, k] * rates)
        term = term + x1_s[0, k] * x2_s[0, k] * d
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[...]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[0, 0] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


def evaluate_pallas_psr(clv, scaler, p_row, q_row, lam, wgt, site_rates,
                        *, block_w=8192,
                        log_min_scale=float(np.log(2.0 ** -30)),
                        interpret=False):
    """PSR root log likelihood; lam [1, S] = EIGN * log(z)."""
    rows, one, n_states, W = clv.shape
    bw = min(block_w, W)
    nb = W // bw
    kernel = functools.partial(_evaluate_psr_kernel, n_states=n_states,
                               bw=bw, log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda w, p, q: (w, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, lam, wgt, site_rates)
    return jnp.sum(partials)


def _nr_psr_kernel(p_row, q_row,
                   clv_hbm, scaler_hbm, eign_ref, wgt_ref, rates_ref,
                   lz_ref,
                   out_ref,
                   x1_s, x2_s, s1_s, s2_s, sems,
                   *, n_states, bw):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    eign = eign_ref[...]                       # [1, S]
    rates = rates_ref[...]                     # [BW]
    lz = lz_ref[0]
    inv_li = jnp.zeros((bw,), jnp.float32)
    dln = jnp.zeros((bw,), jnp.float32)
    d2ln = jnp.zeros((bw,), jnp.float32)
    for k in range(n_states):
        lamk = eign[0, k] * rates               # [BW]
        tmp = x1_s[0, k] * x2_s[0, k] * jnp.exp(lamk * lz)
        inv_li = inv_li + tmp
        dln = dln + tmp * lamk
        d2ln = d2ln + tmp * lamk * lamk
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[...]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[0, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[0, 1] = jnp.sum(w * jnp.where(live, d2ln - dln * dln, 0.0))


def nr_derivatives_pallas_psr(clv, scaler, p_row, q_row, eign, wgt,
                              site_rates, lz, *, block_w=8192,
                              interpret=False):
    """PSR NR derivatives; eign [1, S]; lz scalar array [1]."""
    rows, one, n_states, W = clv.shape
    bw = min(block_w, W)
    nb = W // bw
    kernel = functools.partial(_nr_psr_kernel, n_states=n_states, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
            pl.BlockSpec((1,), lambda w, p, q: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda w, p, q: (w, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 2), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, eign, wgt, site_rates, lz)
    sums = jnp.sum(partials, axis=0)
    return sums[0], sums[1]


def _per_site_lnl_kernel(p_row, q_row,
                         clv_hbm, scaler_hbm, eign_ref, rates_ref, lz_ref,
                         out_ref,
                         x1_s, x2_s, s1_s, s2_s, sems,
                         *, n_states, bw, log_min_scale):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    eign = eign_ref[...]                       # [1, S]
    rates = rates_ref[...]                     # [BW]
    lz = lz_ref[0]
    term = jnp.zeros((bw,), jnp.float32)
    for k in range(n_states):
        term = term + (x1_s[0, k] * x2_s[0, k]
                       * jnp.exp(eign[0, k] * rates * lz))
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    out_ref[...] = jnp.log(jnp.abs(term)) + s * log_min_scale


def per_site_lnl_pallas(clv, scaler, p_row, q_row, eign, site_rates, lz,
                        *, block_w=8192,
                        log_min_scale=float(np.log(2.0 ** -30)),
                        interpret=False):
    """Per-site pattern log likelihoods under PSR -> [W]."""
    rows, one, n_states, W = clv.shape
    bw = min(block_w, W)
    nb = W // bw
    kernel = functools.partial(_per_site_lnl_kernel, n_states=n_states,
                               bw=bw, log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((bw,), lambda w, p, q: (w,)),
            pl.BlockSpec((1,), lambda w, p, q: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bw,), lambda w, p, q: (w,)),
        scratch_shapes=[
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W,), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, eign, site_rates, lz)
