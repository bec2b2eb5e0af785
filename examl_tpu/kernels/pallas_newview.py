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
import inspect

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Positional arguments sharded on their LAST axis (the site dimension).
# Everything else (descriptors, branch lengths, eigen tensors) is
# replicated — the reference's rank model exactly: every rank holds the
# whole tree and model, only site data differ (examl/partitionAssignment.c).
_SITE_ARGS = frozenset({'clv', 'scaler', 'wgt', 'site_rates', 'codes'})
_MESH_AXIS = 'sites'


def _is_operand(x):
    return x is not None and (isinstance(x, (jax.Array, np.ndarray))
                              or hasattr(x, 'aval'))


def shardable(*outs, member_axes=None):
    """Make a kernel wrapper SPMD over a `jax.sharding.Mesh` site axis.

    The decorated function gains a `mesh=None` kwarg. With a mesh, the
    call runs inside `jax.shard_map`: site-axis operands (names in
    _SITE_ARGS) are split on their last axis, everything else is
    replicated, and each device runs the unmodified single-device kernel
    on its local site block — pallas_call has no SPMD partitioning rule,
    so this manual region is what lets the fast path execute on a mesh
    at all (the reference's rank-local kernel wave,
    examl/newviewGenericSpecial.c:917-1515).

    `outs` declares the output structure: each entry is either the name
    of an input argument whose sharding the output mirrors (CLV/scaler
    updates, per-site vectors), or 'sum' for a site-dimension reduction,
    which is `lax.psum`ed over the mesh (the reference's MPI_Allreduce,
    examl/evaluateGenericSpecial.c:966-973).

    Stacked kernels may also declare `member_axes` (arg name -> axis of
    the partition/member dimension) and then support `shard_member=True`:
    the mesh axis splits the MEMBER dimension instead of sites — whole
    partitions per device, the TPU form of the reference's
    whole-partition assignment (Kassian's algorithm,
    examl/partitionAssignment.c:156-390, rationale axml.h:906-927),
    which avoids padding every narrow partition to a lane multiple of
    the device count. 'sum' outputs are then per-member values computed
    wholly on their owner, so they concatenate (out spec on the member
    axis) instead of psum."""
    def deco(fn):
        names = [p.name for p in
                 inspect.signature(fn).parameters.values()
                 if p.kind in (p.POSITIONAL_ONLY,
                               p.POSITIONAL_OR_KEYWORD)]

        @functools.wraps(fn)
        def wrapper(*args, mesh=None, shard_member=False, **kwargs):
            if mesh is None:
                return fn(*args, **kwargs)
            from jax.sharding import PartitionSpec as P
            assert not (shard_member and member_axes is None), \
                'kernel has no member-axis table'

            def spec(x, name):
                if shard_member:
                    ax = (member_axes or {}).get(name)
                    if ax is None:
                        return P(*([None] * x.ndim))
                    return P(*([None] * ax), _MESH_AXIS)
                if name not in _SITE_ARGS:
                    return P(*([None] * x.ndim))
                return P(*([None] * (x.ndim - 1)), _MESH_AXIS)

            # operands pass through shard_map; python scalars / None are
            # static and stay bound in the closure. Array-valued KWARGS
            # (e.g. a traced n_exec) must be operands too — shard_map
            # rejects closed-over tracers.
            op_pos = [i for i, a in enumerate(args) if _is_operand(a)]
            op_kw = [k for k, v in kwargs.items() if _is_operand(v)]
            operands = ([args[i] for i in op_pos]
                        + [kwargs[k] for k in op_kw])
            in_specs = tuple(
                [spec(args[i], names[i]) for i in op_pos]
                + [spec(kwargs[k], '') for k in op_kw])
            bound = dict(zip(names, args))
            single = len(outs) == 1
            if shard_member:
                # per-member results live wholly on their owner device
                out_specs = tuple(P(_MESH_AXIS) if o == 'sum'
                                  else spec(bound[o], o) for o in outs)
            else:
                out_specs = tuple(P() if o == 'sum' else spec(bound[o], o)
                                  for o in outs)

            def body(*ops):
                a = list(args)
                kw = dict(kwargs)
                n_pos = len(op_pos)
                for j, i in enumerate(op_pos):
                    a[i] = ops[j]
                for j, k in enumerate(op_kw):
                    kw[k] = ops[n_pos + j]
                res = fn(*a, **kw)
                if single:
                    res = (res,)
                if not shard_member:
                    res = tuple(jax.lax.psum(r, _MESH_AXIS) if o == 'sum'
                                else r for r, o in zip(res, outs))
                return res[0] if single else res

            f = jax.shard_map(
                body, mesh=mesh, in_specs=in_specs,
                out_specs=out_specs[0] if single else out_specs,
                check_vma=False)
            return f(*operands)

        # functools.wraps sets __wrapped__, which inspect.signature (and
        # hence jax.jit's static_argnames validation) follows — hiding
        # the wrapper's mesh/shard_member kwargs. Drop it.
        wrapper.__dict__.pop('__wrapped__', None)
        wrapper._shardable = True
        return wrapper
    return deco


def _newview_kernel(p_idx, q_idx, r_idx, tip_tip,       # scalar prefetch
                    clv_hbm, scaler_hbm,                # full buffers (ANY)
                    pl_ref, pr_ref, ev_ref,             # per-node/model mats
                    x3_ref, s3_ref,                     # output blocks
                    x1_s, x2_s, s1_s, s2_s, sems,       # scratch
                    *, k_dim, bw, min_scale, inv_min_scale):
    n = pl.program_id(0)
    wb = pl.program_id(1)
    q = q_idx[n]
    r = r_idx[n]
    col = wb * bw

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[r, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[r, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    is_tip_tip = tip_tip[n] != 0

    # One block-diagonal [K, K] x [K, BW] matmul per child replaces the
    # per-category [S, S] x [S, BW] loop: K = C*S rows occupy the MXU at
    # 4x the rate, the sublane tile is fully used (S=4 alone wastes half
    # of every (8, 128) f32 tile in HBM traffic), and VPU work is
    # whole-array. Precision.HIGHEST: the default single-pass bf16
    # truncation costs ~1e-3 relative error per contraction, which
    # compounds over tree depth into whole log-likelihood units.
    hi = jax.lax.Precision.HIGHEST
    a = jnp.dot(pl_ref[0], x1_s[...].astype(jnp.float32),
                preferred_element_type=jnp.float32, precision=hi)
    b = jnp.dot(pr_ref[0], x2_s[...].astype(jnp.float32),
                preferred_element_type=jnp.float32, precision=hi)
    x3 = jnp.dot(ev_ref[...].T, a * b,
                 preferred_element_type=jnp.float32, precision=hi)
    # joint per-site scaling over all categories (the reference's own
    # scheme: one ex_L counter per site, newviewGenericSpecial.c:1140-1168)
    m = jnp.max(jnp.abs(x3), axis=0)                     # [BW]
    scale = jnp.logical_and(m < min_scale, jnp.logical_not(is_tip_tip))
    x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
    x3_ref[0] = x3.astype(x3_ref.dtype)
    s3_ref[0, 0] = s1_s[0] + s2_s[0] + scale.astype(jnp.int32)


@shardable('clv', 'scaler')
def newview_level_pallas(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                         pls, prs, ev, *, block_w=2048,
                         min_scale=2.0 ** -30, inv_min_scale=2.0 ** 30,
                         interpret=False):
    """Run one level of newview updates in place.

    clv [rows, K, W] (donated) with K = n_cats * padded_states, scaler
    [rows, W] int32 (donated), p/q/r_idx [N] int32, tip_tip [N] int32,
    pls/prs [N, K, K] block-diagonal, ev [K, K] block-diagonal. Returns
    the updated (clv, scaler)."""
    rows, k_dim, W = clv.shape
    N = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(
        _newview_kernel, k_dim=k_dim, bw=bw,
        min_scale=min_scale, inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # scaler
            pl.BlockSpec((1, k_dim, k_dim),
                         lambda n, w, p, q, r, t: (n, 0, 0)),
            pl.BlockSpec((1, k_dim, k_dim),
                         lambda n, w, p, q, r, t: (n, 0, 0)),
            pl.BlockSpec((k_dim, k_dim),
                         lambda n, w, p, q, r, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k_dim, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, w)),
            pl.BlockSpec((1, 1, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, w)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
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


def blockdiag(mats):
    """[C, S, S] -> [C*S, C*S] block-diagonal (host/XLA-side, tiny)."""
    C_, S, _ = mats.shape
    K = C_ * S
    out = jnp.zeros((K, K), dtype=mats.dtype)
    for c in range(C_):
        out = out.at[c * S:(c + 1) * S, c * S:(c + 1) * S].set(mats[c])
    return out


def blockdiag_tile(mat, g):
    """[K, K] -> [g*K, g*K] block-diagonal of g copies (for the grouped
    fused traversal kernel's weight-stationary MXU matmuls)."""
    if g == 1:
        return mat
    K = mat.shape[0]
    out = jnp.zeros((g * K, g * K), dtype=mat.dtype)
    for i in range(g):
        out = out.at[i * K:(i + 1) * K, i * K:(i + 1) * K].set(mat)
    return out


def fold_lam(eign, gamma):
    """(eign [C, S], gamma [C]) -> lam [K] = EIGN_k * r_c folded."""
    return (eign * gamma[:, None]).reshape(-1)


def fold_rw(rate_weights, S):
    """rate weights [C] -> [K] (each weight repeated per state)."""
    return jnp.repeat(rate_weights, S)


def fold_tipvec(tipvec):
    """[C, n_codes, S] -> [n_codes, K] folded tip table."""
    C_, nc, S = tipvec.shape
    return jnp.transpose(tipvec, (1, 0, 2)).reshape(nc, C_ * S)


def _traversal_fused_kernel(p_idx, q_idx, r_idx, tip_tip, lzq, lzr, nex,
                            clv_hbm, scaler_hbm, lam_ref, ei_ref, ev_ref,
                            rates_ref,
                            out_clv, out_scaler,
                            sems, xq, xr,
                            *, n_rows, bw, group,
                            min_scale, inv_min_scale, psr=False):
    """Whole-traversal CLV wave, one kernel instance per site block: the
    CLV column block of every (used) row lives in VMEM while every
    traversal op runs, so HBM sees one read + one write per row instead of
    one round trip per level (the reference's newviewIterative loop,
    newviewGenericSpecial.c :917, pays DRAM per node; the level-batched
    kernel pays HBM per level). P matrices are built on the fly from the
    per-op log branch lengths and the shared eigensystem (makeP,
    newviewGenericSpecial.c:78), so the op list costs only scalars. Ops
    execute in descriptor order — dependency-safe by construction,
    identical to the jnp scan semantics.

    With group G > 1, the descriptor must be laid out in aligned blocks of
    G mutually independent ops (traversal.pack_grouped): G children are
    gathered into a [G*K, BW] scratch with the P-matrix column scale
    exp(lam*lz) applied as a ROW scale on the gather (P@x =
    (ei ⊙_col c) @ x = ei @ (c ⊙ x)), so the three matmuls per group use
    the CONSTANT [G*K, G*K] block-diagonal ei/ev — weight-stationary
    full-width MXU matmuls instead of per-op [K, K] slivers."""
    wb = pl.program_id(0)
    col = wb * bw

    # bring the used CLV rows' column block into VMEM (the output block is
    # the working buffer; input_output_aliases make this in-place)
    cp_in = pltpu.make_async_copy(
        clv_hbm.at[pl.ds(0, n_rows), :, pl.ds(col, bw)], out_clv,
        sems.at[0])
    cp_in2 = pltpu.make_async_copy(
        scaler_hbm.at[pl.ds(0, n_rows), :, pl.ds(col, bw)], out_scaler,
        sems.at[1])
    cp_in.start()
    cp_in2.start()
    cp_in.wait()
    cp_in2.wait()

    lam = lam_ref[0]                           # [K] = EIGN_k * r_c folded
    ei = ei_ref[...]                           # [G*K, G*K] block-diagonal
    ev = ev_ref[...]                           # [G*K, G*K] block-diagonal
    hi = jax.lax.Precision.HIGHEST
    K = lam.shape[0]

    if group == 1:
        def body(n, _):
            q = q_idx[n]
            r = r_idx[n]
            p = p_idx[n]
            x1 = out_clv[q].astype(jnp.float32)    # [K, BW]
            x2 = out_clv[r].astype(jnp.float32)
            is_tt = tip_tip[n] != 0
            if psr:
                # per-site rates: the P-matrix column scale varies per
                # site — exp((EIGN lz)_k r_s) applied to the child block
                # (exact rewrite P@x = ei @ (colscale ∘ x); same
                # expression order as the level PSR kernel's lamq∘rates)
                rates = rates_ref[0]               # [BW]
                dq = jnp.exp((lam * lzq[n])[:, None] * rates[None, :])
                dr = jnp.exp((lam * lzr[n])[:, None] * rates[None, :])
                a = jnp.dot(ei, x1 * dq,
                            preferred_element_type=jnp.float32,
                            precision=hi)
                b = jnp.dot(ei, x2 * dr,
                            preferred_element_type=jnp.float32,
                            precision=hi)
            else:
                # makeP on the fly: P[k, l] = exp(lam[l] lz) * ei[k, l]
                # (zero off the diagonal blocks, so the fold is exact)
                pls = jnp.exp(lam * lzq[n])[None, :] * ei
                prs = jnp.exp(lam * lzr[n])[None, :] * ei
                a = jnp.dot(pls, x1, preferred_element_type=jnp.float32,
                            precision=hi)
                b = jnp.dot(prs, x2, preferred_element_type=jnp.float32,
                            precision=hi)
            x3 = jnp.dot(ev.T, a * b, preferred_element_type=jnp.float32,
                         precision=hi)
            m = jnp.max(jnp.abs(x3), axis=0)
            scale = jnp.logical_and(m < min_scale, jnp.logical_not(is_tt))
            x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
            out_clv[p] = x3.astype(out_clv.dtype)
            out_scaler[p] = (out_scaler[q] + out_scaler[r]
                             + scale.astype(jnp.int32))
            return 0

        jax.lax.fori_loop(0, nex[0], body, 0)
    else:
        def body(g, _):
            n0 = g * group
            for i in range(group):             # static unroll
                n = n0 + i
                if psr:
                    rates = rates_ref[0]       # [BW]
                    dq = jnp.exp((lam * lzq[n])[:, None] * rates[None, :])
                    dr = jnp.exp((lam * lzr[n])[:, None] * rates[None, :])
                    xq[i * K:(i + 1) * K] = (
                        out_clv[q_idx[n]].astype(jnp.float32) * dq)
                    xr[i * K:(i + 1) * K] = (
                        out_clv[r_idx[n]].astype(jnp.float32) * dr)
                    continue
                cq = jnp.exp(lam * lzq[n])     # [K] P column scale
                cr = jnp.exp(lam * lzr[n])
                xq[i * K:(i + 1) * K] = (
                    out_clv[q_idx[n]].astype(jnp.float32) * cq[:, None])
                xr[i * K:(i + 1) * K] = (
                    out_clv[r_idx[n]].astype(jnp.float32) * cr[:, None])
            a = jnp.dot(ei, xq[...], preferred_element_type=jnp.float32,
                        precision=hi)
            b = jnp.dot(ei, xr[...], preferred_element_type=jnp.float32,
                        precision=hi)
            x3 = jnp.dot(ev.T, a * b, preferred_element_type=jnp.float32,
                         precision=hi)
            for i in range(group):             # static unroll
                n = n0 + i
                chunk = x3[i * K:(i + 1) * K]
                m = jnp.max(jnp.abs(chunk), axis=0)
                scale = jnp.logical_and(m < min_scale, tip_tip[n] == 0)
                chunk = jnp.where(scale[None, :], chunk * inv_min_scale,
                                  chunk)
                out_clv[p_idx[n]] = chunk.astype(out_clv.dtype)
                out_scaler[p_idx[n]] = (out_scaler[q_idx[n]]
                                        + out_scaler[r_idx[n]]
                                        + scale.astype(jnp.int32))
            return 0

        jax.lax.fori_loop(0, nex[0] // group, body, 0)


@shardable('clv', 'scaler')
def traversal_fused_pallas(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                           lzq, lzr, lam, ei, ev, site_rates=None, *,
                           n_exec=None,
                           n_rows=None, block_w=512, group=1,
                           min_scale=2.0 ** -30,
                           inv_min_scale=2.0 ** 30, interpret=False):
    """Run a whole packed traversal in ONE pallas_call. clv [rows, K, W]
    (donated); lzq/lzr [L] f32 log branch lengths per op; lam [K] =
    EIGN_k * gamma_c folded; ei/ev [G*K, G*K] block-diagonal (G copies
    when group=G, see blockdiag_tile); n_rows bounds the VMEM-resident
    row range (ops must only touch rows < n_rows). With group > 1 the
    descriptor must come from traversal.pack_grouped (aligned independent
    blocks of `group` ops). Use when the column working set fits VMEM
    (see the engine's fallback to the level kernels)."""
    rows, k_dim, W = clv.shape
    L = p_idx.shape[0]
    n_rows = rows if n_rows is None else n_rows
    bw = min(block_w, W)
    assert W % bw == 0
    assert L % group == 0
    gk = group * k_dim
    assert ei.shape == (gk, gk) and ev.shape == (gk, gk)
    # executed slot count may be dynamic: the bucketed descriptor tail is
    # pure padding the kernel never runs, so one compiled shape serves
    # every traversal length at zero padding cost
    nex = jnp.asarray(L if n_exec is None else n_exec,
                      jnp.int32).reshape(1)
    psr = site_rates is not None
    rates = (jnp.asarray(site_rates, jnp.float32).reshape(1, W) if psr
             else jnp.zeros((1, bw), jnp.float32))

    kernel = functools.partial(
        _traversal_fused_kernel, n_rows=n_rows,
        bw=bw, group=group, min_scale=min_scale,
        inv_min_scale=inv_min_scale, psr=psr)

    scratch = [pltpu.SemaphoreType.DMA((2,))]
    if group > 1:
        scratch += [pltpu.VMEM((gk, bw), jnp.float32),
                    pltpu.VMEM((gk, bw), jnp.float32)]
    else:                                   # unused tile-sized dummies
        scratch += [pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.VMEM((8, 128), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(W // bw,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # scaler
            pl.BlockSpec((1, k_dim), lambda w, *_: (0, 0)),
            pl.BlockSpec((gk, gk), lambda w, *_: (0, 0)),
            pl.BlockSpec((gk, gk), lambda w, *_: (0, 0)),
            pl.BlockSpec((1, bw),
                         (lambda w, *_: (0, w)) if psr
                         else (lambda w, *_: (0, 0))),
        ],
        out_specs=[
            pl.BlockSpec((n_rows, k_dim, bw),
                         lambda w, *_: (0, 0, w)),
            pl.BlockSpec((n_rows, 1, bw),
                         lambda w, *_: (0, 0, w)),
        ],
        scratch_shapes=scratch,
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
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, lzq, lzr, nex, clv, scaler, lam, ei,
      ev, rates)
    return clv_out, scaler_out


def _hbm_wave_loop(p_idx, q_idx, r_idx, tip_tip, get_lzq, get_lzr,
                   n_chunks, clv_at, sc_get, sc_set, lam, ei, ev,
                   xq, xr, x3, sems,
                   *, group, min_scale, inv_min_scale, rates=None):
    """Shared descriptor loop of the HBM-resident fused traversal
    kernels: CLV rows stay in HBM — each op DMAs its two child blocks in
    and its result block out instead of keeping every row's column block
    in VMEM. This removes the VMEM row ceiling (rows*(K+1)*bw*8 <=
    ~12 MB caps the resident kernel at ~350 taxa) while keeping the
    one-dispatch / on-the-fly-P structure: at 512+ taxa the per-level
    fallback's [K, K] matmuls fill ~2% of the MXU and measured 1000x
    slower than this loop (the reference streams any tree size,
    newviewGenericSpecial.c:917-1515).

    With group G > 1 the descriptor must be packed as aligned blocks of
    G mutually independent ops (traversal.pack_grouped): each block
    issues its 4G child DMAs concurrently — per-op [K, bw] blocks are
    far smaller than the DMA latency-bandwidth product, so the G=1 loop
    is latency-bound; G in-flight gathers amortize the setup latency to
    ~bandwidth (measured optimum G=4; the per-DMA scalar-core issue cost
    ~3.5us is the binding resource, so the scale counters stay VMEM-
    resident — sc_get/sc_set on a blocked ref — rather than 4 more DMAs
    per op). Padding slots run unconditionally (a pl.when around a DMA
    measured 27x slower than the DMA itself): they read row 0 and write
    DISTINCT per-slot sink rows (pack_grouped pad_rows), so no two
    in-flight writes alias. clv_at(row) maps a CLV row to its HBM block
    ref; get_lzq/get_lzr(n) give op n's log branch lengths. Sequential
    chunk execution orders read-after-write between dependent ops
    (chunk members are independent by construction)."""
    hi = jax.lax.Precision.HIGHEST

    def in_copies(i, n):
        return [
            pltpu.make_async_copy(clv_at(q_idx[n]), xq.at[i],
                                  sems.at[0, i]),
            pltpu.make_async_copy(clv_at(r_idx[n]), xr.at[i],
                                  sems.at[1, i]),
        ]

    def out_copies(i, n):
        return [
            pltpu.make_async_copy(x3.at[i], clv_at(p_idx[n]),
                                  sems.at[2, i]),
        ]

    def body(c, _):
        n0 = c * group
        for i in range(group):             # start all child gathers
            for cp in in_copies(i, n0 + i):
                cp.start()
        for i in range(group):
            for cp in in_copies(i, n0 + i):
                cp.wait()
        for i in range(group):             # on-the-fly P + contraction
            n = n0 + i
            if rates is not None:          # PSR per-site column scales
                dq = jnp.exp((lam * get_lzq(n))[:, None] * rates[None, :])
                dr = jnp.exp((lam * get_lzr(n))[:, None] * rates[None, :])
                a = jnp.dot(ei, xq[i].astype(jnp.float32) * dq,
                            preferred_element_type=jnp.float32,
                            precision=hi)
                b = jnp.dot(ei, xr[i].astype(jnp.float32) * dr,
                            preferred_element_type=jnp.float32,
                            precision=hi)
            else:
                pls = jnp.exp(lam * get_lzq(n))[None, :] * ei
                prs = jnp.exp(lam * get_lzr(n))[None, :] * ei
                a = jnp.dot(pls, xq[i].astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision=hi)
                b = jnp.dot(prs, xr[i].astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                            precision=hi)
            y = jnp.dot(ev.T, a * b, preferred_element_type=jnp.float32,
                        precision=hi)
            m = jnp.max(jnp.abs(y), axis=0)
            scale = jnp.logical_and(m < min_scale, tip_tip[n] == 0)
            y = jnp.where(scale[None, :], y * inv_min_scale, y)
            x3[i] = y.astype(x3.dtype)
            n = n0 + i
            sc_set(p_idx[n], sc_get(q_idx[n]) + sc_get(r_idx[n])
                   + scale.astype(jnp.int32))
        for i in range(group):             # scatter all results
            for cp in out_copies(i, n0 + i):
                cp.start()
        for i in range(group):
            for cp in out_copies(i, n0 + i):
                cp.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _traversal_fused_hbm_kernel(p_idx, q_idx, r_idx, tip_tip, lzq, lzr,
                                nex, clv_hbm, scaler_hbm, lam_ref, ei_ref,
                                ev_ref, rates_ref, out_clv, out_scaler,
                                xq, xr, x3, sc, sems,
                                *, bw, group, min_scale,
                                inv_min_scale, psr=False):
    wb = pl.program_id(0)
    col = wb * bw
    # the whole scale-counter column block rides VMEM for the whole
    # wave: ONE manual DMA in/out per grid instance (blocked specs would
    # be double-buffered by Mosaic — 4x the block bytes — and per-op
    # scaler DMAs cost 4 more scalar-core issues per op)
    cin = pltpu.make_async_copy(
        out_scaler.at[:, pl.ds(col, bw)], sc, sems.at[0, 0])
    cin.start()
    cin.wait()

    def sc_set(row, v):
        sc[row] = v

    _hbm_wave_loop(
        p_idx, q_idx, r_idx, tip_tip,
        lambda n: lzq[n], lambda n: lzr[n], nex[0] // group,
        lambda row: out_clv.at[row, :, pl.ds(col, bw)],
        lambda row: sc[row], sc_set,
        lam_ref[0], ei_ref[...], ev_ref[...],
        xq, xr, x3, sems,
        group=group, min_scale=min_scale,
        inv_min_scale=inv_min_scale,
        rates=rates_ref[0] if psr else None)
    cout = pltpu.make_async_copy(
        sc, out_scaler.at[:, pl.ds(col, bw)], sems.at[0, 0])
    cout.start()
    cout.wait()


def _hbm_scratch(group, k_dim, bw, rows, dtype):
    return [
        pltpu.VMEM((group, k_dim, bw), dtype),
        pltpu.VMEM((group, k_dim, bw), dtype),
        pltpu.VMEM((group, k_dim, bw), dtype),
        pltpu.VMEM((rows, bw), jnp.int32),
        pltpu.SemaphoreType.DMA((3, group)),
    ]


@shardable('clv', 'scaler')
def traversal_fused_hbm(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                        lzq, lzr, lam, ei, ev, site_rates=None, *,
                        n_exec=None,
                        block_w=2048, group=1,
                        min_scale=2.0 ** -30,
                        inv_min_scale=2.0 ** 30, interpret=False):
    """traversal_fused_pallas without the VMEM row-residency requirement
    (see _hbm_wave_loop). ei/ev [K, K]. group > 1 requires a
    pack_grouped descriptor (n_exec a multiple of group, padding slots
    carrying distinct pad_rows sinks). site_rates [W] switches to the
    PSR per-site P application."""
    rows, k_dim, W = clv.shape
    L = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    assert L % group == 0
    nex = jnp.asarray(L if n_exec is None else n_exec,
                      jnp.int32).reshape(1)
    psr = site_rates is not None
    rates = (jnp.asarray(site_rates, jnp.float32).reshape(1, W) if psr
             else jnp.zeros((1, bw), jnp.float32))

    kernel = functools.partial(
        _traversal_fused_hbm_kernel, bw=bw, group=group,
        min_scale=min_scale, inv_min_scale=inv_min_scale, psr=psr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(W // bw,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # scaler (2-D view)
            pl.BlockSpec((1, k_dim), lambda w, *_: (0, 0)),
            pl.BlockSpec((k_dim, k_dim), lambda w, *_: (0, 0)),
            pl.BlockSpec((k_dim, k_dim), lambda w, *_: (0, 0)),
            pl.BlockSpec((1, bw),
                         (lambda w, *_: (0, w)) if psr
                         else (lambda w, *_: (0, 0))),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=_hbm_scratch(group, k_dim, bw, rows, clv.dtype),
    )
    clv_out, scaler_out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv.shape, clv.dtype),
            jax.ShapeDtypeStruct((rows, W), scaler.dtype),
        ],
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, lzq, lzr, nex, clv,
      scaler.reshape(rows, W), lam, ei, ev, rates)
    return clv_out, scaler_out.reshape(scaler.shape)


def _traversal_fused_hbm_stacked_kernel(p_idx, q_idx, r_idx, tip_tip,
                                        lzq, lzr, col_of, nex, ex,
                                        clv_hbm, scaler_hbm, lam_ref,
                                        ei_ref, ev_ref, rates_ref,
                                        out_clv, out_scaler,
                                        xq, xr, x3, sc, sems,
                                        *, bw, group, n_classes,
                                        min_scale, inv_min_scale,
                                        psr=False):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    bcol = col_of[pid]                     # this partition's branch class
    # whole scale-counter slice VMEM-resident per instance (see the flat
    # kernel); masked partitions copy it back unchanged
    cin = pltpu.make_async_copy(
        out_scaler.at[pid, :, pl.ds(col, bw)], sc, sems.at[0, 0])
    cin.start()
    cin.wait()

    def sc_set(row, v):
        sc[row] = v

    # masked partitions (execute-mask / evaluateChange semantics) skip
    # the op loop entirely: rows in HBM simply keep their stale contents
    @pl.when(ex[pid] != 0)
    def _():
        _hbm_wave_loop(
            p_idx, q_idx, r_idx, tip_tip,
            lambda n: lzq[n * n_classes + bcol],
            lambda n: lzr[n * n_classes + bcol],
            nex[0] // group,
            lambda row: out_clv.at[pid, row, :, pl.ds(col, bw)],
            lambda row: sc[row], sc_set,
            lam_ref[0, 0], ei_ref[0], ev_ref[0],
            xq, xr, x3, sems,
            group=group, min_scale=min_scale,
            inv_min_scale=inv_min_scale,
            rates=rates_ref[0, 0] if psr else None)
    cout = pltpu.make_async_copy(
        sc, out_scaler.at[pid, :, pl.ds(col, bw)], sems.at[0, 0])
    cout.start()
    cout.wait()


@shardable('clv', 'scaler', member_axes=dict(
    clv=0, scaler=0, col_of=0, lam=0, ei=0, ev=0, exec_mask=0,
    site_rates=0))
def traversal_fused_hbm_stacked(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                                lzq, lzr, col_of, lam, ei, ev, exec_mask,
                                site_rates=None,
                                *, n_exec=None, block_w=2048, group=1,
                                min_scale=2.0 ** -30,
                                inv_min_scale=2.0 ** 30, interpret=False):
    """Stacked HBM-resident fused traversal: one launch for a whole
    partition group of ANY tree size (big trees previously de-stacked to
    singleton HBM dispatches). clv [P, rows, K, W] (donated), lzq/lzr
    [L, B] log branch lengths by BRANCH CLASS with col_of [P] mapping
    each partition to its class column (a full [L, P] per-partition
    matrix would blow the 1 MB SMEM scalar space at genome-scale
    partition counts), lam [P, K], ei/ev [P, K, K] block-diagonal,
    exec_mask [P] int32 (0 = keep stale CLVs). group as in
    traversal_fused_hbm."""
    P, rows, k_dim, W = clv.shape
    lam = lam.reshape(P, 1, k_dim)
    L = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    assert L % group == 0
    assert lzq.shape[0] == L and lzr.shape == lzq.shape
    assert col_of.shape == (P,)
    B = lzq.shape[1]
    nex = jnp.asarray(L if n_exec is None else n_exec,
                      jnp.int32).reshape(1)
    psr = site_rates is not None
    rates = (jnp.asarray(site_rates, jnp.float32).reshape(P, 1, W) if psr
             else jnp.zeros((P, 1, bw), jnp.float32))

    kernel = functools.partial(
        _traversal_fused_hbm_stacked_kernel, bw=bw, group=group,
        n_classes=B, min_scale=min_scale, inv_min_scale=inv_min_scale,
        psr=psr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(P, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # scaler (3-D view)
            pl.BlockSpec((1, 1, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, k_dim, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, k_dim, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw),
                         (lambda p, w, *_: (p, 0, w)) if psr
                         else (lambda p, w, *_: (0, 0, 0))),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=_hbm_scratch(group, k_dim, bw, rows, clv.dtype),
    )
    clv_out, scaler_out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv.shape, clv.dtype),
            jax.ShapeDtypeStruct((P, rows, W), scaler.dtype),
        ],
        input_output_aliases={9: 0, 10: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip,
      # 1-D SMEM views: Mosaic pads 2-D scalar operands to 128 lanes
      # ([L, 1] f32 allocates 512K of the 1M SMEM)
      jnp.asarray(lzq, jnp.float32).reshape(L * B),
      jnp.asarray(lzr, jnp.float32).reshape(L * B),
      jnp.asarray(col_of, jnp.int32), nex, exec_mask, clv,
      scaler.reshape(P, rows, W), lam, ei, ev, rates)
    return clv_out, scaler_out.reshape(scaler.shape)


def _tip_kernel(codes_ref, tipvec_ref, clv_in, out_clv,
                *, n_codes, bw, n_tips):
    """Materialize tip CLV rows on device: out[t, :, w] =
    tipvec[codes[t, w], :] with the folded [n_codes, K] tip table (all
    categories' tip vectors in one row). The gather is a one-hot matmul
    so the site axis stays on the lanes (replacing round 1's host-side
    numpy gather, whose per-model-change re-upload cost ~4 MB per
    partition through the device tunnel on every optimizer probe).
    Blocks cover 8 rows (sublane tile); row 0 and any non-tip rows inside
    the last block keep their previous contents."""
    t = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_codes, bw), 0)
    hi = jax.lax.Precision.HIGHEST
    for i in range(8):
        row = t * 8 + i
        codes = codes_ref[i]                   # [BW] int32
        onehot = (codes[None, :] == iota).astype(jnp.float32)
        tv = tipvec_ref[...]                   # [n_codes, K]
        tip_block = jnp.dot(tv.T, onehot,
                            preferred_element_type=jnp.float32,
                            precision=hi).astype(out_clv.dtype)  # [K, BW]
        is_tip = jnp.logical_and(row >= 1, row <= n_tips)
        out_clv[i] = jnp.where(is_tip, tip_block, clv_in[i])


@shardable('clv',)
def tip_rows_pallas(clv, codes, tipvec, n_tips, *, block_w=8192,
                    interpret=False):
    """Fill rows 1..n_tips of the CLV buffer with materialized tip
    vectors. codes [T1p, W] int32 with T1p a multiple of 8 (row 0 + tail
    padding ignored), tipvec [n_codes, K] folded."""
    rows, k_dim, W = clv.shape
    T1p = codes.shape[0]
    assert T1p % 8 == 0 and T1p <= rows
    n_codes = tipvec.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(_tip_kernel, n_codes=n_codes, bw=bw,
                               n_tips=n_tips)
    out = pl.pallas_call(
        kernel,
        grid=(T1p // 8, W // bw),
        in_specs=[
            pl.BlockSpec((8, bw), lambda t, w: (t, w)),
            pl.BlockSpec((n_codes, k_dim), lambda t, w: (0, 0)),
            pl.BlockSpec((8, k_dim, bw), lambda t, w: (t, 0, w)),
        ],
        out_specs=pl.BlockSpec((8, k_dim, bw), lambda t, w: (t, 0, w)),
        out_shape=jax.ShapeDtypeStruct(clv.shape, clv.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(codes, tipvec, clv)
    return out


def make_p_batch(qz, rz, gamma, eign, ei):
    """Per-node left/right block-diagonal P matrices for a level:
    qz/rz [N] -> [N, K, K] each with K = C*S (the host-side tiny einsum
    feeding the kernel). ei [C, S, S]."""
    from .reference_jnp import log_z
    C_, S, _ = ei.shape
    K = C_ * S
    lzq = log_z(qz)[:, None, None]                  # [N, 1, 1]
    lzr = log_z(rz)[:, None, None]
    lam = eign * gamma[:, None]                     # [C, S]
    dq = jnp.exp(lam[None] * lzq)                   # [N, C, S]
    dr = jnp.exp(lam[None] * lzr)
    pls_c = dq[:, :, None, :] * ei[None]            # [N, C, S, S]
    prs_c = dr[:, :, None, :] * ei[None]
    N = pls_c.shape[0]
    pls = jnp.zeros((N, K, K), dtype=pls_c.dtype)
    prs = jnp.zeros((N, K, K), dtype=prs_c.dtype)
    for c in range(C_):
        sl = slice(c * S, (c + 1) * S)
        pls = pls.at[:, sl, sl].set(pls_c[:, c])
        prs = prs.at[:, sl, sl].set(prs_c[:, c])
    return pls, prs


# ---------------------------------------------------------------------------
# Root log-likelihood and Newton-Raphson derivative kernels. On this stack
# XLA programs that touch the big CLV buffers compile pathologically slowly
# through the remote-compile path, while Mosaic kernels compile in seconds —
# so the whole per-move hot path (newview/evaluate/derivatives) is Pallas.

def _evaluate_kernel(p_row, q_row,                       # scalar prefetch
                     clv_hbm, scaler_hbm, dw_ref, wgt_ref,
                     out_ref,
                     x1_s, x2_s, s1_s, s2_s, sems,
                     *, bw, log_min_scale):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    # dw [K] = rate_weight_c * diag[c, k] folded: the category sum is one
    # weighted row reduction of the [K, BW] product (evaluateGTRGAMMA,
    # evaluateGenericSpecial.c — with the per-site joint scale counter)
    dw = dw_ref[0]                             # [K]
    term = jnp.sum(x1_s[...].astype(jnp.float32)
                   * x2_s[...].astype(jnp.float32) * dw[:, None], axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    # whole-array SMEM output: Mosaic rejects blocked SMEM outputs whose
    # trailing dims neither tile to (8, 128) nor cover the array, so each
    # sequential grid step writes its own cell instead
    out_ref[wb, 0] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


@shardable('sum',)
def evaluate_pallas(clv, scaler, p_row, q_row, dw, wgt,
                    *, block_w=8192, log_min_scale=float(np.log(2.0 ** -30)),
                    interpret=False):
    """Per-partition root log likelihood (GAMMA/LG4). dw [1, K] =
    rate_weights (x) diag folded. Returns a scalar."""
    rows, k_dim, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    # 1-D operands blocked below full length break Mosaic's layout check
    # (XLA tiles f32[W] as T(W)); carried as [1, W] the (1, bw) tile is a
    # plain lane block
    wgt = wgt.reshape(1, W)

    kernel = functools.partial(_evaluate_kernel, bw=bw,
                               log_min_scale=log_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k_dim), lambda w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
        ],
        out_specs=pl.BlockSpec((nb, 1), lambda w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 1), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, dw, wgt)
    return jnp.sum(partials)


def _evaluate_batch_kernel(p_rows, q_rows,                # scalar prefetch
                           clv_hbm, scaler_hbm, dw_ref, wgt_ref,
                           out_ref,
                           x1_s, x2_s, s1_s, s2_s, sems,
                           *, bw, log_min_scale):
    """Batched root-likelihood kernel: grid (candidate, site-block); each
    candidate evaluates the branch between buffer rows p_rows[n] and
    q_rows[n] with its own folded weight-diagonal dw_ref[n] (the SPR
    candidate wave replacing one evaluateGeneric dispatch per insertion,
    searchAlgo.c:682-777)."""
    n = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    dw = dw_ref[0, 0]                          # [K]
    term = jnp.sum(x1_s[...].astype(jnp.float32)
                   * x2_s[...].astype(jnp.float32) * dw[:, None], axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    val = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))
    # whole-array SMEM output (TPU requires full-shape scalar blocks),
    # accumulated over the sequential site-block grid dim so its size is
    # [N] not [N, nb] (SMEM is 1 MB; whole-genome widths overflow it)

    @pl.when(wb == 0)
    def _init():
        out_ref[n] = val

    @pl.when(wb > 0)
    def _acc():
        out_ref[n] = out_ref[n] + val


@shardable('sum',)
def evaluate_batch_pallas(clv, scaler, p_rows, q_rows, dws, wgt,
                          *, block_w=8192,
                          log_min_scale=float(np.log(2.0 ** -30)),
                          interpret=False):
    """Batched per-partition root log likelihoods -> [N]; dws [N, K]."""
    rows, k_dim, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw

    # Mosaic's block rules bind the LAST TWO dims: a (1, K) block over an
    # [N, K] array puts a 1-row tile on the second-minor axis (rejected on
    # hardware once N > 1); carried as [N, 1, K] the (1, K) tile covers the
    # trailing dims fully and the candidate axis is a plain leading index.
    dws = dws.reshape(N, 1, k_dim)
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands
    kernel = functools.partial(_evaluate_batch_kernel, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, k_dim), lambda n, w, p, q: (n, 0, 0)),
            pl.BlockSpec((1, bw), lambda n, w, p, q: (0, w)),
        ],
        out_specs=pl.BlockSpec((N,), lambda n, w, p, q: (0,),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, dws, wgt)


@shardable('sum',)
def evaluate_batch_gamma(clv, scaler, p_rows, q_rows, lzs, lam_vec,
                         rw_vec, wgt, *, block_w=8192,
                         log_min_scale=float(np.log(2.0 ** -30)),
                         interpret=False):
    """GAMMA batched evaluate: builds per-candidate folded weight-diagonals
    on device (dw[n] = rw_vec * exp(lam_vec * lz_n)) then runs the batched
    kernel. lam_vec/rw_vec [K]."""
    dws = (rw_vec[None, :]
           * jnp.exp(lam_vec[None, :] * lzs[:, None])).astype(jnp.float32)
    return evaluate_batch_pallas(clv, scaler, p_rows, q_rows, dws,
                                 wgt, block_w=block_w,
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
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0, 0]                        # [S] = EIGN * lz of cand n
    rates = rates_ref[0]                       # [BW]
    term = jnp.sum(x1_s[...] * x2_s[...]
                   * jnp.exp(lam[:, None] * rates[None, :]), axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[n, wb] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


@shardable('sum',)
def evaluate_batch_psr(clv, scaler, p_rows, q_rows, lzs, eign, wgt,
                       site_rates, *, block_w=8192,
                       log_min_scale=float(np.log(2.0 ** -30)),
                       interpret=False):
    """PSR batched evaluate -> [N]; eign [S], lzs [N]."""
    rows, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    # [N, 1, S]: see evaluate_batch_pallas on Mosaic's last-two-dims rule
    lams = (eign[None, :] * lzs[:, None]).astype(
        jnp.float32).reshape(N, 1, n_states)
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands
    site_rates = site_rates.reshape(1, W)
    kernel = functools.partial(_evaluate_batch_psr_kernel,
                               n_states=n_states, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_states), lambda n, w, p, q: (n, 0, 0)),
            pl.BlockSpec((1, bw), lambda n, w, p, q: (0, w)),
            pl.BlockSpec((1, bw), lambda n, w, p, q: (0, w)),
        ],
        out_specs=pl.BlockSpec((N, nb), lambda n, w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
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
                     x1_s, x2_s, sems,
                     *, bw):
    """Batched NR derivatives: candidate n evaluates d lnL/d lz at its own
    branch length lzs[n] between rows p_rows[n]/q_rows[n] — the kernel
    behind the vectorized thorough-insertion smoother (each candidate of
    an SPR wave optimizes its three junction branches simultaneously;
    the reference runs one makenewzIterative per candidate,
    searchAlgo.c:484-566). With the per-site joint scale counter the
    scale factor cancels in the dln/inv_li ratio, so no scaling term
    appears at all."""
    n = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0]                           # [K] = EIGN_k * r_c folded
    rw = rw_ref[0]                             # [K] = rate weights folded
    lz = lzs_ref[n]
    d = rw * jnp.exp(lam * lz)                 # [K]
    x12 = (x1_s[...].astype(jnp.float32)
           * x2_s[...].astype(jnp.float32))    # [K, BW]
    tmp = x12 * d[:, None]
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam[:, None], axis=0)
    d2ln = jnp.sum(tmp * (lam * lam)[:, None], axis=0)

    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[n, wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[n, wb, 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum')
def nr_derivatives_batch_pallas(clv, scaler, p_rows, q_rows, lam,
                                rate_weights, wgt, lzs, *, block_w=8192,
                                log_min_scale=float(np.log(2.0 ** -30)),
                                interpret=False):
    """(d1[N], d2[N]) for N branches with per-candidate lengths lzs[N];
    lam [1, K] = EIGN_k * r_c folded, rate_weights [1, K] folded."""
    rows, k_dim, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands
    kernel = functools.partial(_nr_batch_kernel, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k_dim), lambda n, w, p, q: (0, 0)),
            pl.BlockSpec((1, k_dim), lambda n, w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda n, w, p, q: (0, w)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [N]
        ],
        out_specs=pl.BlockSpec((N, nb, 2), lambda n, w, p, q: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
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
               x1_s, x2_s, sems,
               *, bw):
    wb = pl.program_id(0)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0]                           # [K] = EIGN_k * r_c folded
    d = d_ref[0]                               # [K] = w_c * exp(lam lz)
    x12 = (x1_s[...].astype(jnp.float32)
           * x2_s[...].astype(jnp.float32))    # [K, BW]
    tmp = x12 * d[:, None]
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam[:, None], axis=0)
    d2ln = jnp.sum(tmp * (lam * lam)[:, None], axis=0)

    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[wb, 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum')
def nr_derivatives_pallas(clv, scaler, p_row, q_row, lam, d, wgt,
                          *, block_w=8192,
                          log_min_scale=float(np.log(2.0 ** -30)),
                          interpret=False):
    """(dlnLdlz, d2lnLdlz2) for the branch between rows p and q.
    lam [1, K] = EIGN*r_c folded; d [1, K] = rate_weight_c * exp(lam*lz).
    The per-site joint scale factor cancels in the ratios, so the scaler
    buffer is never read (makenewzGenericSpecial.c sumGAMMA/coreGTRGAMMA
    fused, minus the scaling term)."""
    rows, k_dim, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands

    kernel = functools.partial(_nr_kernel, bw=bw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, k_dim), lambda w, p, q: (0, 0)),
            pl.BlockSpec((1, k_dim), lambda w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
        ],
        out_specs=pl.BlockSpec((nb, 2), lambda w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
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
            clv_hbm.at[q, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[r, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[q, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[r, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    rates = rates_ref[0]                       # [BW]
    lamq = lamq_ref[0, 0]                      # [S] = EIGN * lzq of node n
    lamr = lamr_ref[0, 0]
    dq = jnp.exp(lamq[:, None] * rates[None, :])    # [S, BW]
    dr = jnp.exp(lamr[:, None] * rates[None, :])
    ei = ei_ref[...]                           # [S, S]
    ev = ev_ref[...]
    hi = jax.lax.Precision.HIGHEST

    a = jnp.dot(ei, x1_s[...] * dq, preferred_element_type=jnp.float32,
                precision=hi)
    b = jnp.dot(ei, x2_s[...] * dr, preferred_element_type=jnp.float32,
                precision=hi)
    ab = a * b
    x3 = jnp.dot(ev.T, ab, preferred_element_type=jnp.float32, precision=hi)

    m = jnp.max(jnp.abs(x3), axis=0)
    is_tip_tip = tip_tip[n] != 0
    scale = jnp.logical_and(m < min_scale, jnp.logical_not(is_tip_tip))
    x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
    x3_ref[0] = x3
    s3_ref[0, 0] = s1_s[0] + s2_s[0] + scale.astype(jnp.int32)


@shardable('clv', 'scaler')
def newview_level_pallas_psr(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                             lamq, lamr, ei, ev, site_rates, *,
                             block_w=8192, min_scale=2.0 ** -30,
                             inv_min_scale=2.0 ** 30, interpret=False):
    """One level of PSR newview updates in place. clv [rows, S, W],
    scaler [rows, W]; lamq/lamr [N, S] = EIGN * log(z) per node;
    site_rates [W] = the concrete per-site rates
    (perSiteRates[rateCategory])."""
    rows, n_states, W = clv.shape
    N = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0

    # [N, 1, S]: see evaluate_batch_pallas on Mosaic's last-two-dims rule
    lamq = jnp.asarray(lamq, jnp.float32).reshape(N, 1, n_states)
    lamr = jnp.asarray(lamr, jnp.float32).reshape(N, 1, n_states)
    site_rates = site_rates.reshape(1, W)    # see evaluate_pallas on 1-D
    kernel = functools.partial(_newview_psr_kernel, n_states=n_states,
                               bw=bw, min_scale=min_scale,
                               inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_states),
                         lambda n, w, p, q, r, t: (n, 0, 0)),
            pl.BlockSpec((1, 1, n_states),
                         lambda n, w, p, q, r, t: (n, 0, 0)),
            pl.BlockSpec((n_states, n_states),
                         lambda n, w, p, q, r, t: (0, 0)),
            pl.BlockSpec((n_states, n_states),
                         lambda n, w, p, q, r, t: (0, 0)),
            pl.BlockSpec((1, bw), lambda n, w, p, q, r, t: (0, w)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_states, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, w)),
            pl.BlockSpec((1, 1, bw),
                         lambda n, w, p, q, r, t: (p[n], 0, w)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
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
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
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
    rates = rates_ref[0]                       # [BW]
    term = jnp.sum(x1_s[...] * x2_s[...]
                   * jnp.exp(lam[0][:, None] * rates[None, :]), axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[wb, 0] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


@shardable('sum',)
def evaluate_pallas_psr(clv, scaler, p_row, q_row, lam, wgt, site_rates,
                        *, block_w=8192,
                        log_min_scale=float(np.log(2.0 ** -30)),
                        interpret=False):
    """PSR root log likelihood; lam [1, S] = EIGN * log(z);
    clv [rows, S, W], scaler [rows, W]."""
    rows, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands
    site_rates = site_rates.reshape(1, W)
    kernel = functools.partial(_evaluate_psr_kernel, n_states=n_states,
                               bw=bw, log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
        ],
        out_specs=pl.BlockSpec((nb, 1), lambda w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
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
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
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
    rates = rates_ref[0]                       # [BW]
    lz = lz_ref[0]
    lam = eign[0][:, None] * rates[None, :]     # [S, BW]
    tmp = x1_s[...] * x2_s[...] * jnp.exp(lam * lz)
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam, axis=0)
    d2ln = jnp.sum(tmp * lam * lam, axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[wb, 1] = jnp.sum(w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum')
def nr_derivatives_pallas_psr(clv, scaler, p_row, q_row, eign, wgt,
                              site_rates, lz, *, block_w=8192,
                              interpret=False):
    """PSR NR derivatives; eign [1, S]; lz scalar array [1];
    clv [rows, S, W], scaler [rows, W]."""
    rows, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands
    site_rates = site_rates.reshape(1, W)
    kernel = functools.partial(_nr_psr_kernel, n_states=n_states, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
            pl.BlockSpec((1,), lambda w, p, q: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nb, 2), lambda w, p, q: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
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


def _nr_batch_psr_kernel(p_rows, q_rows,
                         clv_hbm, scaler_hbm, eign_ref, wgt_ref,
                         rates_ref, lzs_ref,
                         out_ref,
                         x1_s, x2_s, sems,
                         *, bw):
    n = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    eign = eign_ref[0]                         # [S]
    rates = rates_ref[0]                       # [BW]
    lz = lzs_ref[n]
    lam = eign[:, None] * rates[None, :]       # [S, BW]
    tmp = x1_s[...] * x2_s[...] * jnp.exp(lam * lz)
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam, axis=0)
    d2ln = jnp.sum(tmp * lam * lam, axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[n, wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[n, wb, 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum')
def nr_derivatives_batch_pallas_psr(clv, scaler, p_rows, q_rows, eign,
                                    wgt, site_rates, lzs, *,
                                    block_w=8192, interpret=False):
    """Batched PSR NR derivatives -> (d1 [N], d2 [N]) for N branches
    with per-candidate log lengths lzs [N]; eign [S], clv [rows, S, W].
    The per-(candidate, site-block) grid mirrors nr_derivatives_batch_
    pallas; the PSR exponent is the elementwise per-site-rate form of
    _nr_psr_kernel (makenewzGenericSpecial.c coreGTRCAT, with the joint
    scale factor cancelling in the ratios)."""
    rows, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(1, W)          # see evaluate_pallas on 1-D operands
    site_rates = site_rates.reshape(1, W)
    eign = eign.reshape(1, n_states)
    kernel = functools.partial(_nr_batch_psr_kernel, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_states), lambda n, w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda n, w, p, q: (0, w)),
            pl.BlockSpec((1, bw), lambda n, w, p, q: (0, w)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [N]
        ],
        out_specs=pl.BlockSpec((N, nb, 2), lambda n, w, p, q: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, nb, 2), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, eign, wgt, site_rates,
      jnp.asarray(lzs, jnp.float32))
    sums = jnp.sum(partials, axis=1)
    return sums[:, 0], sums[:, 1]


def _nr_batch_stacked_psr_kernel(p_rows, q_rows,
                                 clv_hbm, scaler_hbm, eign_ref, wgt_ref,
                                 rates_ref, lzs_ref,
                                 out_ref,
                                 x1_s, x2_s, sems,
                                 *, bw):
    pid = pl.program_id(0)
    n = pl.program_id(1)
    wb = pl.program_id(2)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    eign = eign_ref[0, 0]                      # [S] of partition pid
    rates = rates_ref[0, 0]                    # [BW]
    lz = lzs_ref[pid, n]
    lam = eign[:, None] * rates[None, :]
    tmp = x1_s[...] * x2_s[...] * jnp.exp(lam * lz)
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam, axis=0)
    d2ln = jnp.sum(tmp * lam * lam, axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0, 0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    # flat 1-D SMEM offsets (see _nr_batch_stacked_kernel)
    N = pl.num_programs(1)
    nb = pl.num_programs(2)
    base = ((pid * N + n) * nb + wb) * 2
    out_ref[base] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[base + 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum', member_axes=dict(
    clv=0, scaler=0, eign=0, wgt=0, site_rates=0, lzs=0))
def nr_derivatives_batch_stacked_psr(clv, scaler, p_rows, q_rows, eign,
                                     wgt, site_rates, lzs, *,
                                     block_w=8192, interpret=False):
    """Stacked batched PSR NR derivatives -> (d1 [P, N], d2 [P, N]);
    eign [P, S], wgt/site_rates [P, W], lzs [P, N] per-(partition,
    candidate) log branch lengths (per-partition columns support -M
    waves, optimizeModel.c perGeneBranchLengths)."""
    P, rows, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    eign = eign.reshape(P, 1, n_states)
    wgt = wgt.reshape(P, 1, W)
    site_rates = site_rates.reshape(P, 1, W)
    kernel = functools.partial(_nr_batch_stacked_psr_kernel, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_states), lambda p, n, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [P, N]
        ],
        out_specs=pl.BlockSpec((P * N * nb * 2,),
                               lambda p, n, w, *_: (0,),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * N * nb * 2,), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, eign, wgt, site_rates,
      jnp.asarray(lzs, jnp.float32))
    sums = jnp.sum(partials.reshape(P, N, nb, 2), axis=2)
    return sums[..., 0], sums[..., 1]


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
            clv_hbm.at[p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
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
    rates = rates_ref[0]                       # [BW]
    lz = lz_ref[0]
    term = jnp.sum(x1_s[...] * x2_s[...]
                   * jnp.exp(eign[0][:, None] * rates[None, :] * lz),
                   axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    out_ref[0] = jnp.log(jnp.abs(term)) + s * log_min_scale


@shardable('site_rates',)
def per_site_lnl_pallas(clv, scaler, p_row, q_row, eign, site_rates, lz,
                        *, block_w=8192,
                        log_min_scale=float(np.log(2.0 ** -30)),
                        interpret=False):
    """Per-site pattern log likelihoods under PSR -> [W];
    clv [rows, S, W], scaler [rows, W]."""
    rows, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    site_rates = site_rates.reshape(1, W)    # see evaluate_pallas on 1-D
    kernel = functools.partial(_per_site_lnl_kernel, n_states=n_states,
                               bw=bw, log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, n_states), lambda w, p, q: (0, 0)),
            pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
            pl.BlockSpec((1,), lambda w, p, q: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bw), lambda w, p, q: (0, w)),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, eign, site_rates, lz)
    return out[0]


# ---------------------------------------------------------------------------
# Partition-stacked kernel variants (docs/STACKING.md). Partitions sharing a
# geometry (states, n_cats) are stored stacked on a NEW leading axis:
# clv [P, rows, K, W], scaler [P, rows, 1, W] with W the group's max padded
# width (short members carry wgt = 0 columns). Each engine operation then
# runs ONE pallas_call with a leading grid axis p instead of one launch per
# partition (~0.3 ms on-device launch overhead each; whole-genome partition
# counts multiply it). Per-p model tensors are selected by BlockSpec index
# maps -- no indirection inside the kernel. The p-slices are mutually
# independent; within a slice the compute is the SAME matmul sequence as the
# per-partition kernels, so results are bit-identical.
# (Reference counterpart: one MPI rank processes all its partitions in one
# newviewIterative pass, examl/newviewGenericSpecial.c:917.)

def _traversal_fused_stacked_kernel(p_idx, q_idx, r_idx, tip_tip, lzq, lzr,
                                    nex, ex,            # scalar prefetch
                                    clv_hbm, scaler_hbm, lam_ref, ei_ref,
                                    ev_ref, rates_ref,
                                    out_clv, out_scaler,
                                    sems,
                                    *, n_rows, bw, min_scale,
                                    inv_min_scale, psr=False):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw

    cp_in = pltpu.make_async_copy(
        clv_hbm.at[pid, pl.ds(0, n_rows), :, pl.ds(col, bw)],
        out_clv.at[0], sems.at[0])
    cp_in2 = pltpu.make_async_copy(
        scaler_hbm.at[pid, pl.ds(0, n_rows), :, pl.ds(col, bw)],
        out_scaler.at[0], sems.at[1])
    cp_in.start()
    cp_in2.start()
    cp_in.wait()
    cp_in2.wait()

    lam = lam_ref[0, 0]                        # [K] of partition pid
    ei = ei_ref[0]                             # [K, K]
    ev = ev_ref[0]
    hi = jax.lax.Precision.HIGHEST

    def body(n, _):
        q = q_idx[n]
        r = r_idx[n]
        p = p_idx[n]
        x1 = out_clv[0, q].astype(jnp.float32)     # [K, BW]
        x2 = out_clv[0, r].astype(jnp.float32)
        is_tt = tip_tip[n] != 0
        if psr:
            rates = rates_ref[0, 0]                # [BW]
            dq = jnp.exp((lam * lzq[n, pid])[:, None] * rates[None, :])
            dr = jnp.exp((lam * lzr[n, pid])[:, None] * rates[None, :])
            a = jnp.dot(ei, x1 * dq, preferred_element_type=jnp.float32,
                        precision=hi)
            b = jnp.dot(ei, x2 * dr, preferred_element_type=jnp.float32,
                        precision=hi)
        else:
            pls = jnp.exp(lam * lzq[n, pid])[None, :] * ei
            prs = jnp.exp(lam * lzr[n, pid])[None, :] * ei
            a = jnp.dot(pls, x1, preferred_element_type=jnp.float32,
                        precision=hi)
            b = jnp.dot(prs, x2, preferred_element_type=jnp.float32,
                        precision=hi)
        x3 = jnp.dot(ev.T, a * b, preferred_element_type=jnp.float32,
                     precision=hi)
        m = jnp.max(jnp.abs(x3), axis=0)
        scale = jnp.logical_and(m < min_scale, jnp.logical_not(is_tt))
        x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
        out_clv[0, p] = x3.astype(out_clv.dtype)
        out_scaler[0, p] = (out_scaler[0, q] + out_scaler[0, r]
                            + scale.astype(jnp.int32))
        return 0

    # masked partitions (execute-mask / evaluateChange semantics) skip the
    # op loop entirely: the DMA'd-in block writes back unchanged
    @pl.when(ex[pid] != 0)
    def _():
        jax.lax.fori_loop(0, nex[0], body, 0)


@shardable('clv', 'scaler', member_axes=dict(
    clv=0, scaler=0, lzq=1, lzr=1, lam=0, ei=0, ev=0, exec_mask=0,
    site_rates=0))
def traversal_fused_stacked(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                            lzq, lzr, lam, ei, ev, exec_mask,
                            site_rates=None, *,
                            n_exec=None, n_rows=None, block_w=512,
                            min_scale=2.0 ** -30, inv_min_scale=2.0 ** 30,
                            interpret=False):
    """Stacked fused traversal: clv [P, rows, K, W] (donated), lzq/lzr
    [L, P] f32 (per-partition branch columns pre-gathered), lam [P, K],
    ei/ev [P, K, K] block-diagonal, exec_mask [P] int32 (0 = keep stale
    CLVs). site_rates [P, W] switches the per-op P application to the
    PSR per-site column scales (K = S, one category)."""
    P, rows, k_dim, W = clv.shape
    # Mosaic's block rules bind the LAST TWO dims: a (1, K) block over
    # [P, K] puts a 1-row tile on the second-minor axis (rejected on
    # hardware once P > 1); carried as [P, 1, K] the (1, 1, K) tile
    # covers the trailing dims fully (same convention as the batched
    # evaluate's dws)
    lam = lam.reshape(P, 1, k_dim)
    L = p_idx.shape[0]
    n_rows = rows if n_rows is None else n_rows
    bw = min(block_w, W)
    assert W % bw == 0
    assert lzq.shape == (L, P) and lzr.shape == (L, P)
    nex = jnp.asarray(L if n_exec is None else n_exec,
                      jnp.int32).reshape(1)
    psr = site_rates is not None
    rates = (jnp.asarray(site_rates, jnp.float32).reshape(P, 1, W) if psr
             else jnp.zeros((P, 1, bw), jnp.float32))

    kernel = functools.partial(
        _traversal_fused_stacked_kernel, n_rows=n_rows, bw=bw,
        min_scale=min_scale, inv_min_scale=inv_min_scale, psr=psr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(P, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # clv (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),       # scaler
            pl.BlockSpec((1, 1, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, k_dim, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, k_dim, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw),
                         (lambda p, w, *_: (p, 0, w)) if psr
                         else (lambda p, w, *_: (0, 0, 0))),
        ],
        out_specs=[
            pl.BlockSpec((1, n_rows, k_dim, bw),
                         lambda p, w, *_: (p, 0, 0, w)),
            pl.BlockSpec((1, n_rows, 1, bw),
                         lambda p, w, *_: (p, 0, 0, w)),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    clv_out, scaler_out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(clv.shape, clv.dtype),
            jax.ShapeDtypeStruct(scaler.shape, scaler.dtype),
        ],
        input_output_aliases={8: 0, 9: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip,
      jnp.asarray(lzq, jnp.float32), jnp.asarray(lzr, jnp.float32),
      nex, exec_mask, clv, scaler, lam, ei, ev, rates)
    return clv_out, scaler_out


def _newview_level_stacked_kernel(p_idx, q_idx, r_idx, tip_tip, ex,
                                  clv_hbm, scaler_hbm, pl_ref, pr_ref,
                                  ev_ref,
                                  x3_ref, s3_ref,
                                  x1_s, x2_s, s1_s, s2_s, sems,
                                  *, bw, min_scale, inv_min_scale):
    pid = pl.program_id(0)
    n = pl.program_id(1)
    wb = pl.program_id(2)
    q = q_idx[n]
    r = r_idx[n]
    col = wb * bw
    live = ex[pid] != 0

    @pl.when(live)
    def _():
        copies = [
            pltpu.make_async_copy(
                clv_hbm.at[pid, q, :, pl.ds(col, bw)], x1_s, sems.at[0]),
            pltpu.make_async_copy(
                clv_hbm.at[pid, r, :, pl.ds(col, bw)], x2_s, sems.at[1]),
            pltpu.make_async_copy(
                scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s1_s,
                sems.at[2]),
            pltpu.make_async_copy(
                scaler_hbm.at[pid, r, :, pl.ds(col, bw)], s2_s,
                sems.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        is_tip_tip = tip_tip[n] != 0
        hi = jax.lax.Precision.HIGHEST
        a = jnp.dot(pl_ref[0, 0], x1_s[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=hi)
        b = jnp.dot(pr_ref[0, 0], x2_s[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=hi)
        x3 = jnp.dot(ev_ref[0].T, a * b,
                     preferred_element_type=jnp.float32, precision=hi)
        m = jnp.max(jnp.abs(x3), axis=0)
        scale = jnp.logical_and(m < min_scale,
                                jnp.logical_not(is_tip_tip))
        x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
        x3_ref[0, 0] = x3.astype(x3_ref.dtype)
        s3_ref[0, 0, 0] = s1_s[0] + s2_s[0] + scale.astype(jnp.int32)

    # masked partition (execute-mask / evaluateChange semantics): the
    # destination row keeps its stale contents — copy it through, since
    # the block-mapped output would otherwise write back garbage
    @pl.when(jnp.logical_not(live))
    def _():
        p = p_idx[n]
        copies = [
            pltpu.make_async_copy(
                clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
            pltpu.make_async_copy(
                scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s,
                sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        x3_ref[0, 0] = x1_s[...]
        s3_ref[0, 0, 0] = s1_s[0]


@shardable('clv', 'scaler', member_axes=dict(
    clv=0, scaler=0, pls=0, prs=0, ev=0, ex=0))
def newview_level_stacked(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                          pls, prs, ev, ex=None, *, block_w=2048,
                          min_scale=2.0 ** -30, inv_min_scale=2.0 ** 30,
                          interpret=False):
    """Stacked level/junction updates in place: clv [P, rows, K, W]
    (donated), pls/prs [P, N, K, K], ev [P, K, K]. The descriptor
    (p/q/r_idx, tip_tip) is shared by all partitions (same tree).
    ex [P] int32 (None = all live): masked p-slices keep their stale
    destination rows (copied through in-kernel)."""
    P, rows, k_dim, W = clv.shape
    N = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    if ex is None:
        ex = jnp.ones(P, jnp.int32)

    kernel = functools.partial(
        _newview_level_stacked_kernel, bw=bw,
        min_scale=min_scale, inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(P, N, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, k_dim, k_dim),
                         lambda p, n, w, *_: (p, n, 0, 0)),
            pl.BlockSpec((1, 1, k_dim, k_dim),
                         lambda p, n, w, *_: (p, n, 0, 0)),
            pl.BlockSpec((1, k_dim, k_dim),
                         lambda p, n, w, *_: (p, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k_dim, bw),
                         lambda p, n, w, pi, q, r, t, e: (p, pi[n], 0, w)),
            pl.BlockSpec((1, 1, 1, bw),
                         lambda p, n, w, pi, q, r, t, e: (p, pi[n], 0, w)),
        ],
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
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
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, jnp.asarray(ex, jnp.int32), clv,
      scaler, pls, prs, ev)
    return clv_out, scaler_out


def _evaluate_stacked_kernel(p_row, q_row,
                             clv_hbm, scaler_hbm, dw_ref, wgt_ref,
                             out_ref,
                             x1_s, x2_s, s1_s, s2_s, sems,
                             *, bw, log_min_scale):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    dw = dw_ref[0, 0]                          # [K] of partition pid
    term = jnp.sum(x1_s[...].astype(jnp.float32)
                   * x2_s[...].astype(jnp.float32) * dw[:, None], axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0, 0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[pid, wb] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


@shardable('sum', member_axes=dict(clv=0, scaler=0, dw=0, wgt=0))
def evaluate_stacked(clv, scaler, p_row, q_row, dw, wgt,
                     *, block_w=8192,
                     log_min_scale=float(np.log(2.0 ** -30)),
                     interpret=False):
    """Stacked root log likelihood -> [P]. dw [P, 1, K] folded
    weight-diagonals, wgt [P, W] (carried as [P, 1, W]: Mosaic's
    last-two-dims block rule, see traversal_fused_stacked)."""
    P, rows, k_dim, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(P, 1, W)

    kernel = functools.partial(_evaluate_stacked_kernel, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
        ],
        out_specs=pl.BlockSpec((P, nb), lambda p, w, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, nb), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, dw, wgt)
    return jnp.sum(partials, axis=1)


def _evaluate_batch_stacked_kernel(p_rows, q_rows,
                                   clv_hbm, scaler_hbm, dw_ref, wgt_ref,
                                   out_ref,
                                   x1_s, x2_s, s1_s, s2_s, sems,
                                   *, bw, log_min_scale):
    pid = pl.program_id(0)
    n = pl.program_id(1)
    wb = pl.program_id(2)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    dw = dw_ref[0, 0, 0]                       # [K] of (pid, n)
    term = jnp.sum(x1_s[...].astype(jnp.float32)
                   * x2_s[...].astype(jnp.float32) * dw[:, None], axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0, 0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    val = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))
    # SMEM output accumulated over the sequential site-block dim: [P, N]
    # not [P, N, nb] (1 MB SMEM overflows at whole-genome widths)

    @pl.when(wb == 0)
    def _init():
        out_ref[pid, n] = val

    @pl.when(wb > 0)
    def _acc():
        out_ref[pid, n] = out_ref[pid, n] + val


@shardable('sum', member_axes=dict(clv=0, scaler=0, dws=0, wgt=0))
def evaluate_batch_stacked(clv, scaler, p_rows, q_rows, dws, wgt,
                           *, block_w=8192,
                           log_min_scale=float(np.log(2.0 ** -30)),
                           interpret=False):
    """Stacked batched root log likelihoods -> [P, N]; dws [P, N, 1, K]
    per-(partition, candidate) folded weight-diagonals, wgt [P, W]
    (carried as [P, 1, W], see traversal_fused_stacked)."""
    P, rows, k_dim, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(P, 1, W)

    kernel = functools.partial(_evaluate_batch_stacked_kernel, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, k_dim),
                         lambda p, n, w, *_: (p, n, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
        ],
        out_specs=pl.BlockSpec((P, N), lambda p, n, w, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, dws, wgt)


@shardable('sum', member_axes=dict(
    clv=0, scaler=0, lzs=0, lams=0, rws=0, wgt=0))
def evaluate_batch_gamma_stacked(clv, scaler, p_rows, q_rows, lzs, lams,
                                 rws, wgt, *, block_w=8192,
                                 log_min_scale=float(np.log(2.0 ** -30)),
                                 interpret=False):
    """Stacked GAMMA batched evaluate -> [P, N]: builds the per-
    (partition, candidate) folded weight-diagonals on device.
    lzs [P, N] (per-partition branch columns pre-gathered), lams/rws
    [P, K]."""
    P, N = lzs.shape
    dws = (rws[:, None, :]
           * jnp.exp(lams[:, None, :] * lzs[:, :, None])).astype(
               jnp.float32)
    return evaluate_batch_stacked(clv, scaler, p_rows, q_rows,
                                  dws[:, :, None, :], wgt,
                                  block_w=block_w,
                                  log_min_scale=log_min_scale,
                                  interpret=interpret)


def _nr_stacked_kernel(p_row, q_row,
                       clv_hbm, scaler_hbm, lam_ref, d_ref, wgt_ref,
                       out_ref,
                       x1_s, x2_s, sems,
                       *, bw):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]

    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0, 0]
    d = d_ref[0, 0]
    x12 = (x1_s[...].astype(jnp.float32)
           * x2_s[...].astype(jnp.float32))
    tmp = x12 * d[:, None]
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam[:, None], axis=0)
    d2ln = jnp.sum(tmp * (lam * lam)[:, None], axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0, 0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[pid, wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[pid, wb, 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum', member_axes=dict(
    clv=0, scaler=0, lam=0, d=0, wgt=0))
def nr_derivatives_stacked(clv, scaler, p_row, q_row, lam, d, wgt,
                           *, block_w=8192,
                           log_min_scale=float(np.log(2.0 ** -30)),
                           interpret=False):
    """Stacked NR derivatives -> (d1 [P], d2 [P]). lam [P, 1, K],
    d [P, 1, K] = rw * exp(lam * lz_p) per partition, wgt [P, W]
    (carried as [P, 1, W], see traversal_fused_stacked)."""
    P, rows, k_dim, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(P, 1, W)

    kernel = functools.partial(_nr_stacked_kernel, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, k_dim), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
        ],
        out_specs=pl.BlockSpec((P, nb, 2), lambda p, w, *_: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, nb, 2), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, lam, d, wgt)
    sums = jnp.sum(partials, axis=1)
    return sums[:, 0], sums[:, 1]


def _nr_batch_stacked_kernel(p_rows, q_rows,
                             clv_hbm, scaler_hbm, lam_ref, rw_ref,
                             wgt_ref, lzs_ref,
                             out_ref,
                             x1_s, x2_s, sems,
                             *, bw):
    pid = pl.program_id(0)
    n = pl.program_id(1)
    wb = pl.program_id(2)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0, 0]
    rw = rw_ref[0, 0]
    lz = lzs_ref[pid, n]
    d = rw * jnp.exp(lam * lz)
    x12 = (x1_s[...].astype(jnp.float32)
           * x2_s[...].astype(jnp.float32))
    tmp = x12 * d[:, None]
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam[:, None], axis=0)
    d2ln = jnp.sum(tmp * (lam * lam)[:, None], axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0, 0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    # flat 1-D SMEM offsets: a trailing dim of 2 would be lane-padded
    # to 128 (4 MB at P=64 x N=128 — measured SMEM OOM)
    N = pl.num_programs(1)
    nb = pl.num_programs(2)
    base = ((pid * N + n) * nb + wb) * 2
    out_ref[base] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[base + 1] = jnp.sum(
        w * jnp.where(live, d2ln - dln * dln, 0.0))


@shardable('sum', 'sum', member_axes=dict(
    clv=0, scaler=0, lam=0, rate_weights=0, wgt=0, lzs=0))
def nr_derivatives_batch_stacked(clv, scaler, p_rows, q_rows, lam,
                                 rate_weights, wgt, lzs, *, block_w=8192,
                                 log_min_scale=float(np.log(2.0 ** -30)),
                                 interpret=False):
    """Stacked batched NR derivatives -> (d1 [P, N], d2 [P, N]).
    lam/rate_weights [P, 1, K], wgt [P, W] (carried as [P, 1, W], see
    traversal_fused_stacked), lzs [P, N] per-(partition, candidate) log
    branch lengths (identical rows for linked branches; per-partition
    columns for -M waves)."""
    P, rows, k_dim, W = clv.shape
    N = p_rows.shape[0]
    assert lzs.ndim == 2
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    wgt = wgt.reshape(P, 1, W)
    kernel = functools.partial(_nr_batch_stacked_kernel, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, k_dim), lambda p, n, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, k_dim), lambda p, n, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [N]
        ],
        out_specs=pl.BlockSpec((P * N * nb * 2,),
                               lambda p, n, w, *_: (0,),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.VMEM((k_dim, bw), clv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * N * nb * 2,), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, lam, rate_weights, wgt, lzs)
    sums = jnp.sum(partials.reshape(P, N, nb, 2), axis=2)
    return sums[..., 0], sums[..., 1]


def _tip_stacked_kernel(codes_ref, tipvec_ref, clv_in, out_clv,
                        *, n_codes, bw, n_tips):
    t = pl.program_id(1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_codes, bw), 0)
    hi = jax.lax.Precision.HIGHEST
    for i in range(8):
        row = t * 8 + i
        codes = codes_ref[0, i]                # [BW] int32
        onehot = (codes[None, :] == iota).astype(jnp.float32)
        tv = tipvec_ref[0]                     # [n_codes, K]
        tip_block = jnp.dot(tv.T, onehot,
                            preferred_element_type=jnp.float32,
                            precision=hi).astype(out_clv.dtype)
        is_tip = jnp.logical_and(row >= 1, row <= n_tips)
        out_clv[0, i] = jnp.where(is_tip, tip_block, clv_in[0, i])


@shardable('clv', member_axes=dict(clv=0, codes=0, tipvec=0))
def tip_rows_stacked(clv, codes, tipvec, n_tips, *, block_w=8192,
                     interpret=False):
    """Stacked tip materialization: clv [P, rows, K, W] (donated), codes
    [P, T1p, W] int32, tipvec [P, n_codes, K] folded."""
    P, rows, k_dim, W = clv.shape
    T1p = codes.shape[1]
    assert T1p % 8 == 0 and T1p <= rows
    n_codes = tipvec.shape[1]
    bw = min(block_w, W)
    assert W % bw == 0

    kernel = functools.partial(_tip_stacked_kernel, n_codes=n_codes,
                               bw=bw, n_tips=n_tips)
    out = pl.pallas_call(
        kernel,
        grid=(P, T1p // 8, W // bw),
        in_specs=[
            pl.BlockSpec((1, 8, bw), lambda p, t, w: (p, t, w)),
            pl.BlockSpec((1, n_codes, k_dim), lambda p, t, w: (p, 0, 0)),
            pl.BlockSpec((1, 8, k_dim, bw), lambda p, t, w: (p, t, 0, w)),
        ],
        out_specs=pl.BlockSpec((1, 8, k_dim, bw),
                               lambda p, t, w: (p, t, 0, w)),
        out_shape=jax.ShapeDtypeStruct(clv.shape, clv.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(codes, tipvec, clv)
    return out


# ---------------------------------------------------------------------------
# Partition-stacked PSR kernels: the per-site-rate (CAT) analogues of the
# stacked GAMMA kernels above — clv [P, rows, S, W], per-site rates
# [P, 1, W] (short group members carry wgt = 0 columns). Same layout
# rules: model vectors carried with a unit second-minor axis.

def _newview_psr_stacked_kernel(p_idx, q_idx, r_idx, tip_tip, ex,
                                clv_hbm, scaler_hbm, lamq_ref, lamr_ref,
                                ei_ref, ev_ref, rates_ref,
                                x3_ref, s3_ref,
                                x1_s, x2_s, s1_s, s2_s, sems,
                                *, bw, min_scale, inv_min_scale):
    pid = pl.program_id(0)
    n = pl.program_id(1)
    wb = pl.program_id(2)
    q = q_idx[n]
    r = r_idx[n]
    col = wb * bw
    live = ex[pid] != 0

    @pl.when(live)
    def _():
        copies = [
            pltpu.make_async_copy(
                clv_hbm.at[pid, q, :, pl.ds(col, bw)], x1_s, sems.at[0]),
            pltpu.make_async_copy(
                clv_hbm.at[pid, r, :, pl.ds(col, bw)], x2_s, sems.at[1]),
            pltpu.make_async_copy(
                scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s1_s,
                sems.at[2]),
            pltpu.make_async_copy(
                scaler_hbm.at[pid, r, :, pl.ds(col, bw)], s2_s,
                sems.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        rates = rates_ref[0, 0]                # [BW] of partition pid
        lamq = lamq_ref[0, 0, 0]               # [S] of (pid, n)
        lamr = lamr_ref[0, 0, 0]
        dq = jnp.exp(lamq[:, None] * rates[None, :])
        dr = jnp.exp(lamr[:, None] * rates[None, :])
        ei = ei_ref[0]
        ev = ev_ref[0]
        hi = jax.lax.Precision.HIGHEST
        a = jnp.dot(ei, x1_s[...] * dq,
                    preferred_element_type=jnp.float32, precision=hi)
        b = jnp.dot(ei, x2_s[...] * dr,
                    preferred_element_type=jnp.float32, precision=hi)
        x3 = jnp.dot(ev.T, a * b, preferred_element_type=jnp.float32,
                     precision=hi)
        m = jnp.max(jnp.abs(x3), axis=0)
        is_tip_tip = tip_tip[n] != 0
        scale = jnp.logical_and(m < min_scale,
                                jnp.logical_not(is_tip_tip))
        x3 = jnp.where(scale[None, :], x3 * inv_min_scale, x3)
        x3_ref[0, 0] = x3
        s3_ref[0, 0, 0] = s1_s[0] + s2_s[0] + scale.astype(jnp.int32)

    @pl.when(jnp.logical_not(live))
    def _():
        p = p_idx[n]
        copies = [
            pltpu.make_async_copy(
                clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
            pltpu.make_async_copy(
                scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s,
                sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        x3_ref[0, 0] = x1_s[...]
        s3_ref[0, 0, 0] = s1_s[0]


@shardable('clv', 'scaler')
def newview_level_stacked_psr(clv, scaler, p_idx, q_idx, r_idx, tip_tip,
                              lamq, lamr, ei, ev, site_rates, ex=None, *,
                              block_w=8192, min_scale=2.0 ** -30,
                              inv_min_scale=2.0 ** 30, interpret=False):
    """Stacked PSR level updates in place: clv [P, rows, S, W] (donated),
    lamq/lamr [P, N, S] = EIGN * log(z) per (partition, node), ei/ev
    [P, S, S], site_rates [P, W], ex [P] int32 (None = all live)."""
    P, rows, n_states, W = clv.shape
    N = p_idx.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    if ex is None:
        ex = jnp.ones(P, jnp.int32)

    lamq = jnp.asarray(lamq, jnp.float32).reshape(P, N, 1, n_states)
    lamr = jnp.asarray(lamr, jnp.float32).reshape(P, N, 1, n_states)
    site_rates = site_rates.reshape(P, 1, W)
    kernel = functools.partial(_newview_psr_stacked_kernel, bw=bw,
                               min_scale=min_scale,
                               inv_min_scale=inv_min_scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(P, N, W // bw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, n_states),
                         lambda p, n, w, *_: (p, n, 0, 0)),
            pl.BlockSpec((1, 1, 1, n_states),
                         lambda p, n, w, *_: (p, n, 0, 0)),
            pl.BlockSpec((1, n_states, n_states),
                         lambda p, n, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, n_states, n_states),
                         lambda p, n, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n_states, bw),
                         lambda p, n, w, pi, q, r, t, e: (p, pi[n], 0, w)),
            pl.BlockSpec((1, 1, 1, bw),
                         lambda p, n, w, pi, q, r, t, e: (p, pi[n], 0, w)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
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
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(p_idx, q_idx, r_idx, tip_tip, jnp.asarray(ex, jnp.int32), clv,
      scaler, lamq, lamr, ei, ev, site_rates)
    return clv_out, scaler_out


def _evaluate_psr_stacked_kernel(p_row, q_row,
                                 clv_hbm, scaler_hbm, lam_ref, wgt_ref,
                                 rates_ref,
                                 out_ref,
                                 x1_s, x2_s, s1_s, s2_s, sems,
                                 *, bw, log_min_scale):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0, 0]                        # [S] of partition pid
    rates = rates_ref[0, 0]                    # [BW]
    term = jnp.sum(x1_s[...] * x2_s[...]
                   * jnp.exp(lam[:, None] * rates[None, :]), axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0, 0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[pid, wb] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


@shardable('sum',)
def evaluate_stacked_psr(clv, scaler, p_row, q_row, lam, wgt, site_rates,
                         *, block_w=8192,
                         log_min_scale=float(np.log(2.0 ** -30)),
                         interpret=False):
    """Stacked PSR root log likelihood -> [P]; lam [P, S] = EIGN * lz per
    partition, wgt/site_rates [P, W]."""
    P, rows, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    lam = lam.reshape(P, 1, n_states)
    wgt = wgt.reshape(P, 1, W)
    site_rates = site_rates.reshape(P, 1, W)
    kernel = functools.partial(_evaluate_psr_stacked_kernel, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_states), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
        ],
        out_specs=pl.BlockSpec((P, nb), lambda p, w, *_: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, nb), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, lam, wgt, site_rates)
    return jnp.sum(partials, axis=1)


def _evaluate_batch_psr_stacked_kernel(p_rows, q_rows,
                                       clv_hbm, scaler_hbm, lam_ref,
                                       wgt_ref, rates_ref,
                                       out_ref,
                                       x1_s, x2_s, s1_s, s2_s, sems,
                                       *, bw, log_min_scale):
    pid = pl.program_id(0)
    n = pl.program_id(1)
    wb = pl.program_id(2)
    col = wb * bw
    p = p_rows[n]
    q = q_rows[n]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    lam = lam_ref[0, 0, 0]                     # [S] of (pid, n)
    rates = rates_ref[0, 0]                    # [BW]
    term = jnp.sum(x1_s[...] * x2_s[...]
                   * jnp.exp(lam[:, None] * rates[None, :]), axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    wgt = wgt_ref[0, 0]
    site_log = jnp.log(jnp.abs(term)) + s * log_min_scale
    out_ref[pid, n, wb] = jnp.sum(jnp.where(wgt > 0, wgt * site_log, 0.0))


@shardable('sum',)
def evaluate_batch_stacked_psr(clv, scaler, p_rows, q_rows, lams, wgt,
                               site_rates, *, block_w=8192,
                               log_min_scale=float(np.log(2.0 ** -30)),
                               interpret=False):
    """Stacked PSR batched evaluate -> [P, N]; lams [P, N, S] = EIGN_p *
    lz_{p,n}, wgt/site_rates [P, W]."""
    P, rows, n_states, W = clv.shape
    N = p_rows.shape[0]
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    lams = lams.reshape(P, N, 1, n_states).astype(jnp.float32)
    wgt = wgt.reshape(P, 1, W)
    site_rates = site_rates.reshape(P, 1, W)
    kernel = functools.partial(_evaluate_batch_psr_stacked_kernel, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, n_states),
                         lambda p, n, w, *_: (p, n, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
            pl.BlockSpec((1, 1, bw), lambda p, n, w, *_: (p, 0, w)),
        ],
        out_specs=pl.BlockSpec((P, N, nb), lambda p, n, w, *_: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, N, nb), jnp.float32),
        interpret=interpret,
    )(p_rows, q_rows, clv, scaler, lams, wgt, site_rates)
    return jnp.sum(partials, axis=2)


def _nr_psr_stacked_kernel(p_row, q_row,
                           clv_hbm, scaler_hbm, eign_ref, wgt_ref,
                           rates_ref, lzs_ref,
                           out_ref,
                           x1_s, x2_s, sems,
                           *, bw):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    eign = eign_ref[0, 0]                      # [S] of partition pid
    rates = rates_ref[0, 0]                    # [BW]
    lz = lzs_ref[pid]
    lam = eign[:, None] * rates[None, :]       # [S, BW]
    tmp = x1_s[...] * x2_s[...] * jnp.exp(lam * lz)
    inv_li = jnp.sum(tmp, axis=0)
    dln = jnp.sum(tmp * lam, axis=0)
    d2ln = jnp.sum(tmp * lam * lam, axis=0)
    inv_li = 1.0 / jnp.abs(inv_li)
    dln = dln * inv_li
    d2ln = d2ln * inv_li
    wgt = wgt_ref[0, 0]
    live = wgt > 0
    w = jnp.where(live, wgt, 0.0)
    out_ref[pid, wb, 0] = jnp.sum(w * jnp.where(live, dln, 0.0))
    out_ref[pid, wb, 1] = jnp.sum(w * jnp.where(live, d2ln - dln * dln,
                                                0.0))


@shardable('sum', 'sum')
def nr_derivatives_stacked_psr(clv, scaler, p_row, q_row, eign, wgt,
                               site_rates, lzs, *, block_w=8192,
                               interpret=False):
    """Stacked PSR NR derivatives -> (d1 [P], d2 [P]); eign [P, S],
    wgt/site_rates [P, W], lzs [P] per-partition log branch lengths (the
    branch column pre-gathered per member)."""
    P, rows, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    eign = eign.reshape(P, 1, n_states)
    wgt = wgt.reshape(P, 1, W)
    site_rates = site_rates.reshape(P, 1, W)
    kernel = functools.partial(_nr_psr_stacked_kernel, bw=bw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_states), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [P]
        ],
        out_specs=pl.BlockSpec((P, nb, 2), lambda p, w, *_: (0, 0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    partials = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, nb, 2), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, eign, wgt, site_rates,
      jnp.asarray(lzs, jnp.float32))
    sums = jnp.sum(partials, axis=1)
    return sums[:, 0], sums[:, 1]


def _per_site_lnl_stacked_kernel(p_row, q_row,
                                 clv_hbm, scaler_hbm, eign_ref,
                                 rates_ref, lzs_ref,
                                 out_ref,
                                 x1_s, x2_s, s1_s, s2_s, sems,
                                 *, bw, log_min_scale):
    pid = pl.program_id(0)
    wb = pl.program_id(1)
    col = wb * bw
    p = p_row[0]
    q = q_row[0]
    copies = [
        pltpu.make_async_copy(
            clv_hbm.at[pid, p, :, pl.ds(col, bw)], x1_s, sems.at[0]),
        pltpu.make_async_copy(
            clv_hbm.at[pid, q, :, pl.ds(col, bw)], x2_s, sems.at[1]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, p, :, pl.ds(col, bw)], s1_s, sems.at[2]),
        pltpu.make_async_copy(
            scaler_hbm.at[pid, q, :, pl.ds(col, bw)], s2_s, sems.at[3]),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    eign = eign_ref[0, 0]                      # [S]
    rates = rates_ref[0, 0]                    # [BW]
    lz = lzs_ref[pid]
    term = jnp.sum(x1_s[...] * x2_s[...]
                   * jnp.exp(eign[:, None] * rates[None, :] * lz),
                   axis=0)
    s = (s1_s[0] + s2_s[0]).astype(jnp.float32)
    out_ref[0, 0] = jnp.log(jnp.abs(term)) + s * log_min_scale


@shardable('site_rates',)
def per_site_lnl_stacked(clv, scaler, p_row, q_row, eign, site_rates,
                         lzs, *, block_w=8192,
                         log_min_scale=float(np.log(2.0 ** -30)),
                         interpret=False):
    """Stacked per-site PSR pattern log likelihoods -> [P, W]; eign
    [P, S], site_rates [P, W], lzs [P]."""
    P, rows, n_states, W = clv.shape
    bw = min(block_w, W)
    assert W % bw == 0
    nb = W // bw
    eign = eign.reshape(P, 1, n_states)
    site_rates = site_rates.reshape(P, 1, W)
    kernel = functools.partial(_per_site_lnl_stacked_kernel, bw=bw,
                               log_min_scale=log_min_scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, n_states), lambda p, w, *_: (p, 0, 0)),
            pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
            pl.BlockSpec(memory_space=pltpu.SMEM),       # lzs [P]
        ],
        # [P, 1, W] with a (1, 1, bw) tile: a (1, bw) tile on [P, W] puts a
        # 1-row block on the second-minor axis (Mosaic rejects it once
        # P > 1, same rule as the batched dws — see evaluate_batch_pallas)
        out_specs=pl.BlockSpec((1, 1, bw), lambda p, w, *_: (p, 0, w)),
        scratch_shapes=[
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((n_states, bw), jnp.float32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.VMEM((1, bw), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 1, W), jnp.float32),
        interpret=interpret,
    )(p_row, q_row, clv, scaler, eign, site_rates,
      jnp.asarray(lzs, jnp.float32))
    return out[:, 0, :]
