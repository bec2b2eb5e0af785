"""The likelihood engine: device-resident CLV state + jitted compute waves.

Architecture (TPU-first redesign of the reference's kernel layer,
examl/newviewGenericSpecial.c / evaluateGenericSpecial.c /
makenewzGenericSpecial.c):

* One unified CLV buffer per partition, shape [2*mxtips, C, S, W]
  (sites last, so the site axis lands on TPU vector lanes):
  row = node number; rows 1..mxtips hold materialized tip CLVs
  (tipVector rows looked up by tip code, broadcast over rate categories),
  rows mxtips+1..2*mxtips-2 hold inner-node CLVs, row 2*mxtips-1 is a
  scratch row that traversal padding writes into. A per-partition
  [2*mxtips, C, W] int32 array holds cumulative per-(category, site)
  scale counters (refining the reference's per-node globalScaler so the
  f32 path survives the inter-category magnitude spread).

* A traversal wave is one jitted lax.scan over the packed descriptor:
  each step builds the two P matrices from (qz, rz) and the partition's
  eigensystem, contracts the two child CLVs, applies underflow scaling,
  and scatters the result row. The scan gives one device dispatch per
  wave regardless of traversal length.

* evaluate / sumtable / NR-derivative kernels are separate jitted
  functions; site-dimension reductions end in jnp.sum which, under a
  sharded mesh, XLA lowers to psum over the ICI (replacing the
  reference's MPI_Allreduce, evaluateGenericSpecial.c:966-973).

Sites are padded to a lane multiple with weight-0 columns (the
reference's own Xeon-Phi padding trick, examl/axml.h:42-53).
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .datatypes import DataType, ProtModel, info_for
from .io.bytefile import Alignment, LazyTipCodes
from .kernels import reference_jnp as K
from .models.eigen import make_eigen
from .models.gamma import make_gamma_cats
from .models.protein import prot_rates_freqs, wag_rates
from .traversal import (PackedTraversal, TIP_TIP, full_traversal,
                        partial_traversal, pack_grouped, pack_traversal,
                        TraversalEntry)
from .tree import Node, Tree

# descriptor block size for the grouped fused traversal kernel (aligned
# blocks of this many mutually independent ops; see traversal.pack_grouped)
PALLAS_GROUP = 8


class _LazyTips:
    """Lazy [T+1, C, S, W] tip-CLV tensor for the jnp path's host-side
    tip materialization: the site axis is assembled on demand from a
    LazyTipCodes provider, so a multi-process mesh's
    make_array_from_callback touches only the local shards' columns."""

    def __init__(self, lazy_codes, t1, W, tipvec, dtype):
        # tipvec [C, n_codes, S]
        self._codes = lazy_codes
        self._tipvec = tipvec
        C_, _, S_ = tipvec.shape
        self.shape = (t1, C_, S_, W)
        self.dtype = dtype
        self.ndim = 4

    def __getitem__(self, idx):
        t_sl, c_sl, s_sl, w_sl = idx
        # normalize the taxon slice against THIS shape (the codes
        # provider is row-padded to a sublane multiple)
        t_sl = slice(*t_sl.indices(self.shape[0])[:2])
        codes = self._codes[t_sl, w_sl]             # [T', W'] int32
        tips = self._tipvec[c_sl][:, codes, :]      # [C', T', W', S]
        tips = np.ascontiguousarray(tips.transpose(1, 0, 3, 2))
        return tips[:, :, s_sl, :].astype(self.dtype)


def _device_memory_limit():
    """Per-device accelerator memory in bytes, or None when the backend
    does not report one (CPU)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return stats.get('bytes_limit')
    except Exception:
        return None


class _TimedJitCache(dict):
    """Cache of jitted programs that also attributes host-blocked time:
    any cached callable whose invocation blocks the host for more than
    50 ms is charged to op_time['compile:<name>'] (tracing + XLA
    compilation — dispatch of an already-compiled program only enqueues,
    ~0.03 ms through the axon tunnel). Together with the sync:* entries
    this lets --op-stats separate remote-compile latency from host-sync
    latency, the two costs that dominate tunneled runtimes."""

    def __init__(self, engine):
        super().__init__()
        self._eng = engine

    def __setitem__(self, key, fn):
        if callable(fn):
            eng = self._eng
            name = key[0] if isinstance(key, tuple) else str(key)
            inner = fn

            def timed(*a, **k):
                t0 = time.perf_counter()
                out = inner(*a, **k)
                dt = time.perf_counter() - t0
                if dt > 0.05:
                    k2 = 'compile:' + name
                    eng.op_time[k2] = eng.op_time.get(k2, 0.0) + dt
                    eng.op_stats[k2] = eng.op_stats.get(k2, 0) + 1
                return out

            fn = timed
        super().__setitem__(key, fn)


class _Kernels:
    """Namespace view of kernels.pallas_newview with the engine's mesh
    pre-bound: under a mesh, every @shardable wrapper runs inside
    shard_map over the 'sites' axis (SPMD exactly like the reference's
    rank model — replicated control flow, site-sharded data, psum where
    the reference allreduces). Without a mesh (or on the jnp path) the
    functions pass through unchanged."""

    def __init__(self, mesh):
        from .kernels import pallas_newview as _mod
        object.__setattr__(self, '_mod', _mod)
        object.__setattr__(self, '_mesh', mesh)

    def __getattr__(self, name):
        fn = getattr(self._mod, name)
        if self._mesh is not None and getattr(fn, '_shardable', False):
            fn = partial(fn, mesh=self._mesh)
        object.__setattr__(self, name, fn)        # cache
        return fn


@dataclasses.dataclass
class PartitionModel:
    """Host-side model parameters for one partition."""
    name: str
    data_type: DataType
    states: int
    prot_model: ProtModel
    prot_freqs: bool
    optimize_base_frequencies: bool
    empirical_frequencies: np.ndarray
    # current parameter values
    subst_rates: np.ndarray         # upper-triangle exchangeabilities
    frequencies: np.ndarray
    freq_exponents: np.ndarray
    alpha: float
    auto_prot_model: ProtModel = ProtModel.WAG
    partition_weight: float = 0.0   # Σ wgt, for fracchange averaging
    # LG4X free parameters (initModel :4230-4237)
    gamma_rates: np.ndarray = None        # only used by LG4X
    lg4x_weights: np.ndarray = None
    weight_exponents: np.ndarray = None

    def n_rates(self) -> int:
        return self.states * (self.states - 1) // 2


def default_partition_model(meta) -> PartitionModel:
    """Initial model parameters (reference models.c initModel :4180,
    initRateMatrix :3866)."""
    states = meta.states
    nr = states * (states - 1) // 2
    if meta.data_type == DataType.AA and meta.prot_model != ProtModel.GTR:
        if meta.prot_model == ProtModel.AUTO:
            rates, mfreqs = prot_rates_freqs(ProtModel.WAG)
        else:
            rates, mfreqs = prot_rates_freqs(meta.prot_model)
        if meta.prot_model == ProtModel.AUTO:
            freqs = (mfreqs if meta.prot_freqs
                     else meta.frequencies.copy())
        elif meta.optimize_base_frequencies:
            freqs = np.full(states, 1.0 / states)
        elif meta.prot_freqs:
            freqs = meta.frequencies.copy()
        else:
            freqs = mfreqs
    else:
        if meta.data_type == DataType.AA:   # AA GTR mode
            rates = wag_rates()
        else:
            rates = np.ones(nr)
        freqs = (np.full(states, 1.0 / states)
                 if meta.optimize_base_frequencies else meta.frequencies.copy())
    return PartitionModel(
        name=meta.name, data_type=meta.data_type, states=states,
        prot_model=meta.prot_model, prot_freqs=meta.prot_freqs,
        optimize_base_frequencies=meta.optimize_base_frequencies,
        empirical_frequencies=meta.frequencies.copy(),
        subst_rates=rates, frequencies=freqs,
        freq_exponents=np.zeros(states), alpha=1.0,
        gamma_rates=make_gamma_cats(1.0, 4),
        lg4x_weights=np.full(4, 0.25), weight_exponents=np.zeros(4))


class LikelihoodEngine:
    """Owns device CLV state for one tree + alignment and exposes the four
    generic operations (newview / evaluate / makenewz / per-site eval)."""

    def __init__(self, alignment: Alignment, tree: Tree, *,
                 dtype=None, rate_het: str = 'GAMMA', pad: int = 8,
                 num_branches: int = 1, use_median: bool = False,
                 use_pallas: Optional[bool] = None, sharding=None,
                 max_categories: int = 25, clv_dtype=None,
                 stack: Optional[bool] = None, compact: bool = False):
        assert rate_het in ('GAMMA', 'PSR')
        # Induced-subtree CLV compaction (the -S/SEV successor,
        # docs/SEV.md, examl_tpu/compact.py): per-partition row spaces of
        # ~2*present(p) rows. Restricted to full-tree evaluation on the
        # Pallas GAMMA path (singleton groups, no mesh): partial
        # traversals / NR / SPR keep the dense layout.
        self.compact = bool(compact)
        self.compact_plan = None
        if self.compact:
            if use_pallas is False or rate_het != 'GAMMA':
                raise ValueError('induced-subtree compaction (-S) requires '
                                 'the Pallas GAMMA path')
            if sharding is not None:
                raise ValueError('induced-subtree compaction (-S) does not '
                                 'compose with a device mesh yet; drop one')
            use_pallas = True
            stack = False                # per-partition row spaces
            from .compact import CompactPlan
            self.compact_plan = CompactPlan(alignment, num_branches)
        self.aln = alignment
        self.tree = tree
        self.rate_het = rate_het
        self.use_median = use_median
        self.num_branches = num_branches
        self.mesh = sharding            # optional jax Mesh over axis 'sites'
        self.mesh_ndev = (1 if self.mesh is None
                          else int(np.prod(self.mesh.devices.shape)))
        self.pad = pad
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = jnp.dtype(dtype)
        scale_exp = (C.SCALE_EXP_F64 if self.dtype == jnp.float64
                     else C.SCALE_EXP_F32)
        self.min_scale = 2.0 ** -scale_exp
        self.inv_min_scale = 2.0 ** scale_exp
        self.log_min_scale = math.log(self.min_scale)

        # default matmul precision on TPU truncates f32 operands to bf16;
        # likelihood kernels need true f32 contractions
        jax.config.update('jax_default_matmul_precision', 'highest')

        if use_pallas is None:
            use_pallas = (self.dtype == jnp.float32
                          and jax.default_backend() not in ('cpu',))
        self.use_pallas = bool(use_pallas)
        # host-sync observability: every entry is one device->host value
        # fetch (the dominant cost through a remote runtime; --op-stats)
        self.op_stats = {}
        self.op_time = {}                    # seconds per compile:/sync: key
        self.op_context = ''                 # e.g. 'modopt:' during mod_opt
        if self.use_pallas and jax.default_backend() != 'cpu':
            # Mosaic DMA slices must be lane-tile aligned
            self.pad = max(self.pad, 128)
        if self.compact:
            # the compacted evaluate runs the fused kernels exclusively
            # (no level fallback), whose block plans need lane-aligned
            # member widths on every backend
            self.pad = max(self.pad, 128)
        self.pad_unit = self.pad
        if self.mesh is not None:
            # site-sharded arrays: each device's site shard must itself
            # satisfy the per-device alignment unit, so pad to
            # unit * n_devices (the reference pads each rank's slice
            # independently; here the global width carries the product).
            # Member-sharded stacked groups (_plan_groups) keep the bare
            # unit — their site axis never splits.
            self.pad = self.pad * self.mesh_ndev
        # Mosaic tiles the second-minor (state) axis by 8 sublanes; DMA
        # slices of a 20-state CLV are not tile-aligned on real hardware,
        # so the device state axis is zero-padded to a sublane multiple
        # (padded states are exact zeros through every kernel: EI/EV rows
        # are zero, so P columns, CLV entries, diag terms and sumtables of
        # padded states all vanish)
        self.state_mult = 8 if self.use_pallas else 1
        # Folded CLV layout (GAMMA Pallas path): [rows, K, W] with
        # K = n_cats * padded_states and ONE per-site scale counter
        # [rows, W] shared by all categories (the reference's own scheme:
        # one ex_L counter per site, newviewGenericSpecial.c:1140-1168).
        # Folding puts all categories' states on the sublane axis, so the
        # per-child P contraction is a single block-diagonal [K, K] x
        # [K, BW] matmul: 4x the MXU row occupancy, and for DNA (S=4) it
        # eliminates the half-empty (8, 128) sublane tiles that made every
        # CLV read/write move 2x its logical bytes.
        # PSR (C=1) folds trivially to [rows, S, W]; the whole Pallas path
        # is uniformly rank-3.
        self.folded = self.use_pallas

        # CLV *storage* dtype (--clv-dtype bf16): halves the HBM traffic of
        # every newview/evaluate/NR kernel. Kernels upcast to f32 after the
        # VMEM load; all arithmetic, the scaling test and the accumulations
        # stay f32; only CLV stores round. Costs ~2.5e-4 relative lnL
        # error; Pallas/GAMMA path only.
        self.clv_dtype = (self.dtype if clv_dtype is None
                          else jnp.dtype(clv_dtype))
        if self.clv_dtype != self.dtype:
            if not self.folded or rate_het == 'PSR':
                raise ValueError('clv_dtype != dtype requires the Pallas '
                                 'path and GAMMA rate heterogeneity')

        self.mxtips = tree.mxtips
        # CLV rows: [0..2*mxtips-1] node rows (2*mxtips-1 is the traversal
        # dummy-padding row) + a scratch pool for batched SPR scoring
        # (proximal/junction CLVs of a candidate wave; searchAlgo.c pays one
        # evaluateGeneric dispatch per insertion candidate instead,
        # searchAlgo.c:682-777)
        self.scratch_base = 2 * self.mxtips
        self.n_scratch = min(256, max(64, 2 * self.mxtips))
        # grouped-descriptor padding sinks: the HBM fused kernels run a
        # block's padding slots unconditionally with all writes in
        # flight, so each in-block slot needs its own sink row (see
        # pack_grouped pad_rows)
        self.pad_sink_base = self.scratch_base + self.n_scratch
        self.rows = self.pad_sink_base + PALLAS_GROUP
        self.is_psr = rate_het == 'PSR'
        self.n_cats = 1 if self.is_psr else 4
        # -c: number of PSR rate categories (reference axml.c case 'c' ->
        # tr->categories, default 25)
        self.max_categories = int(max_categories)
        self.optimize_rate_category_invocations = 1

        self.partitions: List[PartitionModel] = [
            default_partition_model(m) for m in alignment.partitions]
        self.n_models = len(self.partitions)
        if num_branches > 1:
            assert num_branches == self.n_models

        # Partition-geometry stacking (docs/STACKING.md): partitions that
        # share (data type, states) are stored stacked on a leading axis
        # and each Pallas engine operation runs ONE kernel launch for the
        # whole group (launch overhead ~0.3 ms each on-device). Pallas
        # path only (GAMMA and PSR); EXAML_STACK=0/1 overrides; default
        # on everywhere the Pallas path runs (hardware-validated on a
        # v5e chip: tools/validate_stacking_hw.py — all stacked kernels
        # bit-exact vs per-partition slices, engine lnLs identical,
        # stacked evaluate 1.55x faster per op).
        import os
        env = os.environ.get('EXAML_STACK')
        if env is not None:
            stack = env.strip().lower() in ('1', 'true', 'yes', 'on')
        if stack is None:
            stack = self.use_pallas
        self.stack = bool(stack and self.use_pallas)

        # kernel namespace: shardable Pallas wrappers get mesh pre-bound
        # (shard_map over 'sites'); the jnp path relies on XLA's automatic
        # partitioning instead and needs no manual regions
        self.PK = _Kernels(self.mesh if self.use_pallas else None)

        self._jit_cache = _TimedJitCache(self)
        self._check_memory()
        self._build_buffers()
        self.update_eigen(range(self.n_models))

        # host-visible engine status, mirroring the reference tree struct
        self.likelihood = C.UNLIKELY
        self.per_partition_lh = np.zeros(self.n_models)
        self.partition_smoothed = np.zeros(num_branches, dtype=bool)
        self.partition_converged = np.zeros(num_branches, dtype=bool)
        self.execute_model = np.ones(self.n_models, dtype=bool)

    # ------------------------------------------------------------------
    # device state construction

    def _plan_groups(self):
        """Group partitions by stacked geometry and choose each
        multi-member group's mesh layout. Default: the site axis splits
        over the mesh (every member padded to pad_unit * n_devices).
        Alternative: MEMBER-axis sharding — whole partitions per device,
        the TPU form of the reference's whole-partition assignment
        (Kassian's algorithm, examl/partitionAssignment.c:156-390,
        rationale axml.h:906-927): when a group holds many partitions
        narrower than the per-device lane unit, splitting the member
        axis wastes far less HBM than padding every gene to n_dev lane
        units (a 200-site gene on a 64-device mesh would pad 40x).
        Member-sharded groups pad their membership to a device multiple
        with zero-weight duplicate slots, chosen whenever that padded
        volume is smaller. Returns (groups, member_sharded [per group],
        pad per partition)."""
        if self.stack:
            by_key = {}
            for m in range(self.n_models):
                key = (self.partitions[m].data_type,
                       self.partitions[m].states)
                by_key.setdefault(key, []).append(m)
            # big trees keep their stacks: beyond the resident kernel's
            # VMEM row ceiling the group runs the stacked HBM-resident
            # fused variant (traversal_fused_hbm_stacked) — still one
            # launch per group per traversal
            groups = list(by_key.values())
        else:
            groups = [[m] for m in range(self.n_models)]
        member_sharded = []
        pad_of = [self.pad] * self.n_models
        nd = self.mesh_ndev

        def padded(w, u):
            return max(u, ((w + u - 1) // u) * u)

        for gi, ms in enumerate(groups):
            ok = (self.mesh is not None and not self.is_psr
                  and self.folded and len(ms) >= max(2, nd))
            if ok:
                unit = self.pad_unit
                widths = [self.aln.partitions[m].width for m in ms]
                vol_site = len(ms) * max(padded(w, unit * nd)
                                         for w in widths)
                p_mem = ((len(ms) + nd - 1) // nd) * nd
                vol_mem = p_mem * max(padded(w, unit) for w in widths)
                ok = vol_mem < vol_site
                if ok:
                    for m in ms:
                        pad_of[m] = self.pad_unit
                    groups[gi] = ms + [ms[0]] * (p_mem - len(ms))
            member_sharded.append(bool(ok))
        return groups, member_sharded, pad_of

    def _build_buffers(self):
        groups, g_member, pad_of = self._plan_groups()
        self.widths = []        # padded widths
        self.real_widths = []
        self.tip_codes = []     # [mxtips+1, W] int32 per partition
        self.host_tip_codes = []    # host copies (multi-process safe)
        self.wgts = []          # [W] dtype
        self.wgts_i = []        # [W] int32
        self.host_wgts = []     # host copies (multi-process safe)
        import jax as _jax
        lazy_ok = (self.mesh is not None and _jax.process_count() > 1)
        for m, meta in enumerate(self.aln.partitions):
            w = meta.width
            pad = pad_of[m]
            W = max(pad, ((w + pad - 1) // pad) * pad)
            inf = info_for(meta.data_type)
            # tip-code rows padded to a sublane multiple for the on-device
            # tip-materialization kernel (row 0 + tail are ignored)
            t1p = ((self.mxtips + 1 + 7) // 8) * 8
            if self.compact:
                # rows 1..n_p = codes of the PRESENT taxa in ascending
                # global tip order (the compact local row layout,
                # compact.CompactPlan)
                t1p = self.compact_plan.t1p[m]
                full = self.aln.partition_codes(m)
                lazy = np.full((t1p, W), inf.undetermined, dtype=np.int32)
                lazy[1:len(self.compact_plan.tips[m]) + 1,
                     :full.shape[1]] = full[self.compact_plan.tips[m] - 1]
            else:
                lazy = LazyTipCodes(self.aln.partition_codes(m), t1p, W,
                                    inf.undetermined, self.mxtips)
            ax = None if pad_of[m] != self.pad else -1
            wgt = np.zeros(W, dtype=np.int64)
            wgt[:w] = self.aln.weights[meta.lower:meta.upper]
            self.widths.append(W)
            self.real_widths.append(w)
            self.host_wgts.append(wgt)
            if lazy_ok and ax == -1:
                # multi-process: each process materializes only the
                # tip-code columns of its addressable shards (the
                # reference's per-rank readMyData slice ingestion,
                # byteFile.c:278-382); pair with read_bytefile(mmap=True)
                # so untouched columns never leave the disk. The jnp path
                # consumes tips host-side (_refresh_tips) and never reads
                # the device codes array — skip staging it there.
                self.host_tip_codes.append(lazy)
                self.tip_codes.append(
                    self._put(lazy, 'codes', axis=ax)
                    if self.use_pallas else None)
            else:
                codes = lazy[:, :]
                self.host_tip_codes.append(codes)
                self.tip_codes.append(self._put(jnp.asarray(codes),
                                                'codes', axis=ax))
            self.wgts.append(self._put(jnp.asarray(wgt, dtype=self.dtype),
                                       'sites', axis=ax))
            self.wgts_i.append(self._put(jnp.asarray(wgt, dtype=jnp.int32),
                                         'sites', axis=ax))
            self.partitions[m].partition_weight = float(wgt.sum())

        # device model tensors (filled by update_eigen)
        self.d_EIGN = [None] * self.n_models
        self.d_EI = [None] * self.n_models
        self.d_EV = [None] * self.n_models
        self.d_tipvec = [None] * self.n_models
        self.d_gamma = [None] * self.n_models
        self.d_rate_weights = [
            jnp.full((self.n_cats,), 1.0 if self.is_psr else 0.25,
                     dtype=self.dtype)
            for _ in range(self.n_models)]

        # PSR state (reference initModel :4190-4214): one category, rate 1
        self.num_categories = [1] * self.n_models
        self.psr_rates = [np.concatenate(([1.0],
                                          np.zeros(self.max_categories - 1)))
                          for _ in range(self.n_models)]
        self.patrat = [np.ones(W) for W in self.widths]
        self.lhs = [np.zeros(W) for W in self.widths]
        self.rate_category = [np.zeros(W, dtype=np.int32)
                              for W in self.widths]
        self.d_psr_rates = [jnp.asarray(r, dtype=self.dtype)
                            for r in self.psr_rates]
        self.d_rate_cat = [jnp.asarray(c) for c in self.rate_category]
        self.d_site_rates = [jnp.ones(W, dtype=self.dtype)
                             for W in self.widths]

        # Partition groups (docs/STACKING.md): each group is a list of
        # partition indices sharing (data type, states); multi-member
        # groups store their CLVs stacked [P, rows, K, Wg] (Wg = max
        # member width; short members carry wgt = 0 columns) and run ONE
        # stacked kernel per engine op (GAMMA and PSR). Without stacking
        # (or on the jnp path) every group is a singleton and the storage
        # layout is exactly the ungrouped one. Under a mesh a group is
        # either site-sharded (default) or member-sharded (_plan_groups;
        # zero-weight duplicate slots pad the membership to a device
        # multiple, marked in g_n_real).
        self.groups = groups
        self.g_member_sharded = g_member
        self.n_groups = len(self.groups)
        self.gslot = [None] * self.n_models      # m -> (g, slot)
        self.g_n_real = []
        for g, ms in enumerate(self.groups):
            seen = set()
            for j, m in enumerate(ms):
                if m not in seen:
                    self.gslot[m] = (g, j)
                    seen.add(m)
            self.g_n_real.append(len(seen))
        self.g_width = [max(self.widths[m] for m in ms)
                        for ms in self.groups]
        # per-group CLV row count / materialized tip count: the dense
        # layout shares the global row space; compacted groups (singleton
        # by construction) carry their partition's induced row space
        self.g_rows = [self.compact_plan.n_rows[ms[0]] if self.compact
                       else self.rows for ms in self.groups]
        self.g_ntips = [len(self.compact_plan.tips[ms[0]]) if self.compact
                        else self.mxtips for ms in self.groups]

        # per-group weight / tip-code / PSR-site-rate device tensors for
        # the stacked kernels (singletons reuse the per-partition arrays
        # unchanged; g_site_rates is refreshed by set_psr_state)
        self.g_wgt = []
        self.g_codes = []
        self.g_site_rates = [None] * self.n_groups
        for g, ms in enumerate(self.groups):
            if len(ms) == 1:
                self.g_wgt.append(self.wgts[ms[0]])
                self.g_codes.append(self.tip_codes[ms[0]])
                continue
            gax = 0 if self.g_member_sharded[g] else -1
            Wg = self.g_width[g]
            wstk = np.zeros((len(ms), Wg), dtype=np.float64)
            cstk = []
            for j, m in enumerate(ms):
                # host copies: the device arrays may span non-addressable
                # shards in multi-process runs
                c = self.host_tip_codes[m]
                inf = info_for(self.partitions[m].data_type)
                cpad = np.full((c.shape[0], Wg), inf.undetermined,
                               dtype=np.int32)
                cpad[:, :c.shape[1]] = c
                cstk.append(cpad)
                if j >= self.g_n_real[g]:
                    continue             # duplicate slot: weight 0
                wstk[j, :self.widths[m]] = self.host_wgts[m]
            self.g_wgt.append(self._put(
                jnp.asarray(wstk, dtype=self.dtype), 'sites', axis=gax))
            self.g_codes.append(self._put(
                jnp.asarray(np.stack(cstk)), 'codes', axis=gax))

        for g in range(self.n_groups):
            self._refresh_g_site_rates(g)

        # CLV buffers and scale counters (folded: per-site joint counter;
        # jnp path: per-(category, site) counters), one entry per GROUP
        self.clv = []
        self.scaler = []
        for g, ms in enumerate(self.groups):
            m0 = ms[0]
            S = self._padded_states(m0)
            if len(ms) > 1:
                assert self.folded
                gax = 0 if self.g_member_sharded[g] else -1
                self.clv.append(self._put(jnp.zeros(
                    (len(ms), self.rows, self.n_cats * S, self.g_width[g]),
                    dtype=self.clv_dtype), 'clv', axis=gax))
                self.scaler.append(self._put(jnp.zeros(
                    (len(ms), self.rows, 1, self.g_width[g]),
                    dtype=jnp.int32), 'scaler', axis=gax))
            elif self.folded:
                # scaler keeps a vestigial middle axis: Mosaic requires
                # the last two block dims to be lane/sublane-aligned or
                # full, and (1, bw) over [rows, 1, W] satisfies that where
                # (1, bw) over [rows, W] does not
                self.clv.append(self._put(jnp.zeros(
                    (self.g_rows[g], self.n_cats * S, self.widths[m0]),
                    dtype=self.clv_dtype), 'clv'))
                self.scaler.append(self._put(jnp.zeros(
                    (self.g_rows[g], 1, self.widths[m0]), dtype=jnp.int32),
                    'scaler'))
            else:
                self.clv.append(self._put(jnp.zeros(
                    (self.rows, self.n_cats, S, self.widths[m0]),
                    dtype=self.clv_dtype), 'clv'))
                self.scaler.append(self._put(jnp.zeros(
                    (self.rows, self.n_cats, self.widths[m0]),
                    dtype=jnp.int32), 'scaler'))

    def memory_estimate(self) -> dict:
        """Device-memory budget for the CLV state, the analogue of the
        reference parser's printed memory arithmetic (parser/axml.c:
        2846-2884: CAT states*patterns*taxa*8 B, GAMMA 4x, + tips). Adds
        what the reference model omits: the scratch-row pool, the state/
        lane padding, and the scale counters — the folded (Pallas) layout
        carries ONE int32 counter per (row, site) (the reference's own
        per-site ex_L scheme); the jnp path carries one per (row,
        category, site), a 4x HBM tax accepted for kernel simplicity on
        the non-accelerator path. Returns bytes by component, plus the
        per-device share under the mesh (sites axis sharded)."""
        clv_b = self.clv_dtype.itemsize
        clv = scaler = tips = 0
        groups, g_member, pad_of = self._plan_groups()
        for g, ms in enumerate(groups):
            Wg = 0
            for m in set(ms):
                w = self.aln.partitions[m].width
                pad = pad_of[m]
                Wg = max(Wg, max(pad, ((w + pad - 1) // pad) * pad))
            S = self._padded_states(ms[0])
            rows_g = (self.compact_plan.n_rows[ms[0]] if self.compact
                      else self.rows)
            t1p_g = (self.compact_plan.t1p[ms[0]] if self.compact
                     else ((self.mxtips + 1 + 7) // 8) * 8)
            clv += len(ms) * rows_g * self.n_cats * S * Wg * clv_b
            cnt = 1 if self.folded else self.n_cats
            scaler += len(ms) * rows_g * cnt * Wg * 4
            tips += len(set(ms)) * t1p_g * Wg * 4
        total = clv + scaler + tips
        return dict(clv=clv, scaler=scaler, tips=tips, total=total,
                    per_device=total // self.mesh_ndev)

    def _check_memory(self):
        """Fail fast (before any allocation) when the CLV state cannot fit
        the mesh's per-device memory — the reference leaves this to an
        MPI_Abort inside malloc_aligned (examl/axml.c:129-140); here the
        error carries the parser-style sizing so the user can grow the
        mesh instead of watching an opaque device OOM."""
        est = self.memory_estimate()
        limit = _device_memory_limit()
        if limit and est['per_device'] > 0.92 * limit:
            gib = 1 << 30
            need = math.ceil(est['total'] / (0.92 * limit))
            raise MemoryError(
                f"CLV state needs {est['per_device'] / gib:.1f} GiB per "
                f"device (CLVs {est['clv'] / gib:.1f} + scale counters "
                f"{est['scaler'] / gib:.1f} + tips {est['tips'] / gib:.1f} "
                f"GiB total over {self.mesh_ndev} device(s)) but the "
                f"device reports {limit / gib:.1f} GiB; shard the sites "
                f"axis over >= {need} devices (sharding=Mesh(...)), or "
                f"use clv_dtype=bfloat16 to halve the CLV bytes")

    def _put(self, arr, kind, axis=-1):
        """Place an array on the device mesh: axis -1 shards the sites
        axis (the analogue of the reference's per-rank site slices,
        examl/partitionAssignment.c + byteFile.c readMyData), axis 0
        shards the member axis of a member-sharded stacked group (whole
        partitions per device), axis None replicates. When the mesh spans
        multiple processes, each process materializes only its
        addressable shards."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.distributed import put_global
        if axis is None:
            spec = P(*([None] * arr.ndim))
        elif axis == 0:
            spec = P('sites')
        else:
            # sites are always the last axis, whatever the buffer rank
            # (folded [rows, K, W] vs per-category [rows, C, S, W])
            spec = P(*([None] * (arr.ndim - 1)), 'sites')
        return put_global(arr, NamedSharding(self.mesh, spec))

    def host_sites(self, arr) -> np.ndarray:
        """Materialize a per-site device array on the host in global site
        order (process_allgather over DCN when multi-process — replacing
        the reference's Gatherv + master reorder, communication.c:120-182)."""
        from .parallel.distributed import host_gather
        return host_gather(arr)

    def _padded_states(self, m) -> int:
        """Device state-axis size: S > one sublane tile is padded to a
        tile multiple (20 -> 24); S <= 8 stays exact (a sub-tile slice is
        alignable, and padding DNA would inflate its HBM traffic)."""
        S = self.partitions[m].states
        k = self.state_mult
        if S <= k:
            return S
        return ((S + k - 1) // k) * k

    def _pad_state_axes(self, arr, axes):
        """Zero-pad the given axes of a per-partition model tensor from S
        to the device sublane multiple."""
        if self.state_mult == 1:
            return arr
        arr = np.asarray(arr)
        pads = [(0, 0)] * arr.ndim
        for ax in axes:
            S = arr.shape[ax]
            k = self.state_mult
            pads[ax] = (0, 0) if S <= k else (0, ((S + k - 1) // k) * k - S)
        if not any(p[1] for p in pads):
            return arr
        return np.pad(arr, pads)

    def _resolve_model(self, pm: PartitionModel):
        """Refresh rates/frequencies of empirical-matrix AA partitions
        before the eigendecomposition (initReversibleGTR AA branch,
        models.c:3495-3560). Note the protFreqs flag semantics: for AUTO,
        1 = matrix ("fixed") frequencies; for fixed models, 1 = empirical."""
        if pm.data_type != DataType.AA or pm.prot_model == ProtModel.GTR:
            return
        if pm.prot_model == ProtModel.AUTO:
            rates, mfreqs = prot_rates_freqs(pm.auto_prot_model)
            pm.subst_rates = rates
            assert not pm.optimize_base_frequencies
            pm.frequencies = (mfreqs if pm.prot_freqs
                              else pm.empirical_frequencies.copy())
        elif pm.prot_model in (ProtModel.LG4M, ProtModel.LG4X):
            pass  # rates/freqs live per category, handled in update_eigen
        else:
            rates, mfreqs = prot_rates_freqs(pm.prot_model)
            pm.subst_rates = rates
            if not pm.optimize_base_frequencies:
                pm.frequencies = (pm.empirical_frequencies.copy()
                                  if pm.prot_freqs else mfreqs)

    def reset_branches(self):
        """All branches back to defaultz (optimizeModel.c resetBranches)."""
        for i in range(1, 2 * self.mxtips - 1):
            base = self.tree.nodep[i]
            if base is None:
                continue
            ring = ([base] if self.tree.is_tip(i)
                    else [base, base.next, base.next.next])
            for p in ring:
                p.z = [C.DEFAULTZ] * self.num_branches

    def update_eigen(self, models):
        """Recompute eigensystem + tip CLV rows after a parameter change
        (the analogue of initReversibleGTR, models.c:3462). Eigen tensors
        are stored per category ([C, S] / [C, S, S]): identical rows for
        ordinary reversible models, four distinct systems for LG4M/LG4X
        (initReversibleGTR LG4 branch, models.c:3560-3575)."""
        C_ = self.n_cats
        for m in models:
            pm = self.partitions[m]
            self._resolve_model(pm)
            inf = info_for(pm.data_type)
            if pm.prot_model in (ProtModel.LG4M, ProtModel.LG4X):
                systems = []
                for c in range(C_):
                    rates, mfreqs = prot_rates_freqs(pm.prot_model, c)
                    systems.append(make_eigen(rates, mfreqs,
                                              inf.bit_vectors))
                eign = np.stack([es.EIGN for es in systems])
                if pm.prot_model == ProtModel.LG4X:
                    acc = float(np.dot(pm.lg4x_weights, pm.gamma_rates))
                    eign = eign / acc      # scaleLG4X_EIGN (:341)
                    pm_gamma = pm.gamma_rates.copy()
                    self.d_rate_weights[m] = jnp.asarray(
                        pm.lg4x_weights, dtype=self.dtype)
                else:
                    pm_gamma = make_gamma_cats(pm.alpha, C_, self.use_median)
                self.d_EIGN[m] = jnp.asarray(
                    self._pad_state_axes(eign, (1,)), dtype=self.dtype)
                self.d_EI[m] = jnp.asarray(self._pad_state_axes(
                    np.stack([es.EI for es in systems]), (1, 2)),
                    dtype=self.dtype)
                self.d_EV[m] = jnp.asarray(self._pad_state_axes(
                    np.stack([es.EV for es in systems]), (1, 2)),
                    dtype=self.dtype)
                self.d_tipvec[m] = jnp.asarray(self._pad_state_axes(
                    np.stack([es.tip_vector for es in systems]), (2,)),
                    dtype=self.dtype)
            else:
                es = make_eigen(pm.subst_rates, pm.frequencies,
                                inf.bit_vectors)
                pm_gamma = (np.ones(1) if self.is_psr else
                            make_gamma_cats(pm.alpha, C_, self.use_median))
                self.d_EIGN[m] = jnp.asarray(self._pad_state_axes(
                    np.tile(es.EIGN, (C_, 1)), (1,)), dtype=self.dtype)
                self.d_EI[m] = jnp.asarray(self._pad_state_axes(
                    np.tile(es.EI, (C_, 1, 1)), (1, 2)), dtype=self.dtype)
                self.d_EV[m] = jnp.asarray(self._pad_state_axes(
                    np.tile(es.EV, (C_, 1, 1)), (1, 2)), dtype=self.dtype)
                self.d_tipvec[m] = jnp.asarray(self._pad_state_axes(
                    np.tile(es.tip_vector, (C_, 1, 1)), (2,)),
                    dtype=self.dtype)
            self.d_gamma[m] = jnp.asarray(pm_gamma, dtype=self.dtype)
        self._refresh_tips(models)

    def update_gamma(self, models):
        """Alpha changed only: refresh discrete rates."""
        if self.is_psr:
            return
        for m in models:
            pm = self.partitions[m]
            self.d_gamma[m] = jnp.asarray(
                make_gamma_cats(pm.alpha, self.n_cats, self.use_median),
                dtype=self.dtype)

    def _stack_site_rates(self, g, rates_per_m):
        """[P, Wg] stacked site-rate tensor for group g from per-member
        host vectors, POSITIONAL in group order (short members
        zero-padded)."""
        ms = self.groups[g]
        stk = np.zeros((len(ms), self.g_width[g]))
        for j, m in enumerate(ms):
            stk[j, :self.widths[m]] = np.asarray(rates_per_m[j])
        return self._put(jnp.asarray(stk, dtype=self.dtype), 'sites')

    def _refresh_g_site_rates(self, g):
        """Per-group stacked site-rate tensor [P, Wg] (PSR stacked
        kernels); singletons alias the per-partition vector. Multi-member
        rebuilds are deferred to first use (_gsr): bulk per-partition
        set_psr_state loops would otherwise rebuild the tensor P times
        per group."""
        ms = self.groups[g]
        if len(ms) == 1:
            self.g_site_rates[g] = self.d_site_rates[ms[0]]
            return
        self.g_site_rates[g] = None      # dirty; rebuilt by _gsr

    def _gsr(self, g):
        """Group site-rate tensor, rebuilding a dirty multi-member
        entry from the host PSR state."""
        if self.g_site_rates[g] is None:
            self.g_site_rates[g] = self._stack_site_rates(
                g, [self.psr_rates[m][self.rate_category[m]]
                    for m in self.groups[g]])
        return self.g_site_rates[g]

    def set_psr_state(self, m, num_categories=None, per_site_rates=None,
                      rate_category=None):
        """Install new PSR categories/rates for partition m and refresh
        the device-side gathered per-site rate vector."""
        assert self.is_psr
        if num_categories is not None:
            self.num_categories[m] = int(num_categories)
        if per_site_rates is not None:
            rates = np.zeros(self.max_categories)
            rates[:len(per_site_rates)] = per_site_rates
            self.psr_rates[m] = rates
        if rate_category is not None:
            self.rate_category[m] = np.asarray(rate_category, dtype=np.int32)
        self.d_psr_rates[m] = jnp.asarray(self.psr_rates[m],
                                          dtype=self.dtype)
        self.d_rate_cat[m] = jnp.asarray(self.rate_category[m])
        self.d_site_rates[m] = jnp.asarray(
            self.psr_rates[m][self.rate_category[m]], dtype=self.dtype)
        self._refresh_g_site_rates(self.gslot[m][0])

    def _refresh_tips(self, models):
        """Materialize tip CLVs = tipVector[code] per category. On the
        accelerator this is one jitted program running the one-hot-matmul
        tip kernel for every partition (only the tiny tipVector tables
        cross the host boundary); the CPU path gathers on the host."""
        if self.use_pallas:
            interpret = jax.default_backend() == 'cpu'
            fn = self._jit_cache.get('tips_all')
            if fn is None:
                def run(clvs, codes, tipvecs):
                    return self._g_tip_rows(clvs, codes, tipvecs,
                                            interpret)
                fn = jax.jit(run, donate_argnums=(0,))
                self._jit_cache['tips_all'] = fn
            self.clv = list(fn(tuple(self.clv), tuple(self.g_codes),
                               tuple(self.d_tipvec)))
            return
        lazy_ok = self.mesh is not None and jax.process_count() > 1
        for m in models:
            tipvec = np.asarray(self.d_tipvec[m])       # [C, codes, S]
            if lazy_ok and isinstance(self.host_tip_codes[m],
                                      LazyTipCodes):
                # assemble only the local shards' tip columns
                # (readMyData slice ingestion; the Pallas path instead
                # materializes tips on device from the sharded codes)
                tips = _LazyTips(self.host_tip_codes[m],
                                 self.mxtips + 1, self.widths[m],
                                 tipvec, np.dtype(self.dtype))
                fn = self._get_jit('tip_set', m)
                self.clv[m] = fn(self.clv[m], self._put(tips, 'clv'))
                continue
            codes = self.host_tip_codes[m][:self.mxtips + 1]
            tips = tipvec[:, codes, :]                  # [C, T+1, W, S]
            tips = np.ascontiguousarray(tips.transpose(1, 0, 3, 2))
            fn = self._get_jit('tip_set', m)
            self.clv[m] = fn(self.clv[m],
                             self._put(jnp.asarray(tips, dtype=self.dtype),
                                       'clv'))

    # ------------------------------------------------------------------
    # group helpers (partition stacking, docs/STACKING.md): trace-time
    # building blocks that run one kernel per GROUP — the per-partition
    # kernel for singleton groups (the hardware-validated path), the
    # stacked leading-axis kernel otherwise. Per-member model tensors are
    # built with the exact per-partition expressions and stacked (tiny:
    # K- and K^2-sized), so stacked results are bit-identical to the
    # singleton path.

    def _g_cols(self, ms):
        return [self._branch_col(m) for m in ms]

    def _unstack(self, outs):
        """Per-group outputs (leading P axis for multi-member groups) ->
        per-partition list in model order."""
        res = [None] * self.n_models
        for g, ms in enumerate(self.groups):
            if len(ms) == 1:
                res[ms[0]] = outs[g]
            else:
                # skip zero-weight duplicate slots of member-sharded pads
                for j, m in enumerate(ms[:self.g_n_real[g]]):
                    res[m] = outs[g][j]
        return res

    def _g_evaluate_all(self, clvs, scalers, gammas, eigns, rate_weights,
                        gwgts, p_row, q_row, qz, interpret, only=None,
                        srates=None):
        """Root lnL of every partition -> [M] at branch (p_row, q_row)
        with branch lengths qz [B]. only: optional per-m bool — groups
        with no selected member are skipped (their output entries are
        zeros the caller must ignore; the device modOpt probe loop only
        reads its lanes' entries). srates: per-group site-rate tensors
        (PSR programs)."""
        _PK = self.PK  # evaluate_pallas, evaluate_stacked, evaluate_pallas_psr, evaluate_stacked_psr, fold_lam, fold_rw
        if self.is_psr:
            outs = []
            for g, ms in enumerate(self.groups):
                bw = self._block_wg(g)
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    lz = jnp.log(jnp.maximum(qz[col], C.ZMIN))
                    lam = (eigns[m][0] * lz)[None, :].astype(jnp.float32)
                    outs.append(_PK.evaluate_pallas_psr(
                        clvs[g], scalers[g], p_row, q_row, lam,
                        gwgts[g].astype(jnp.float32),
                        srates[g].astype(jnp.float32), block_w=bw,
                        log_min_scale=self.log_min_scale,
                        interpret=interpret))
                else:
                    lams = jnp.stack([
                        (eigns[m][0]
                         * jnp.log(jnp.maximum(qz[self._branch_col(m)],
                                               C.ZMIN))).astype(jnp.float32)
                        for m in ms])
                    outs.append(_PK.evaluate_stacked_psr(
                        clvs[g], scalers[g], p_row, q_row, lams,
                        gwgts[g].astype(jnp.float32),
                        srates[g].astype(jnp.float32), block_w=bw,
                        log_min_scale=self.log_min_scale,
                        shard_member=self.g_member_sharded[g],
                        interpret=interpret))
            return jnp.stack(self._unstack(outs))
        outs = []
        for g, ms in enumerate(self.groups):
            if only is not None and not any(only[m] for m in ms):
                outs.append(jnp.zeros(() if len(ms) == 1 else (len(ms),),
                                      jnp.float32))
                continue
            bw = self._block_wg(g)
            dws = []
            for m in ms:
                lz = jnp.log(jnp.maximum(qz[self._branch_col(m)], C.ZMIN))
                lam = _PK.fold_lam(eigns[m], gammas[m])
                dws.append((_PK.fold_rw(rate_weights[m], eigns[m].shape[1])
                            * jnp.exp(lam * lz))[None, :].astype(
                                jnp.float32))
            if len(ms) == 1:
                outs.append(_PK.evaluate_pallas(
                    clvs[g], scalers[g], p_row, q_row, dws[0],
                    gwgts[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
            else:
                outs.append(_PK.evaluate_stacked(
                    clvs[g], scalers[g], p_row, q_row, jnp.stack(dws),
                    gwgts[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret))
        return jnp.stack(self._unstack(outs))

    def _g_evaluate_batch_all(self, clvs, scalers, gammas, eigns,
                              rate_weights, gwgts, bp_rows, bq_rows, bzs,
                              interpret):
        """Batched root lnLs -> [M, N]; bzs [N, B]."""
        _PK = self.PK  # evaluate_batch_gamma, evaluate_batch_stacked, fold_lam, fold_rw
        outs = []
        for g, ms in enumerate(self.groups):
            bw = self._block_wg(g)
            if len(ms) == 1:
                m = ms[0]
                lzs = jnp.log(jnp.maximum(
                    bzs[:, self._branch_col(m)],
                    C.ZMIN)).astype(jnp.float32)
                outs.append(_PK.evaluate_batch_gamma(
                    clvs[g], scalers[g], bp_rows, bq_rows, lzs,
                    _PK.fold_lam(eigns[m], gammas[m]).astype(jnp.float32),
                    _PK.fold_rw(rate_weights[m],
                            eigns[m].shape[1]).astype(jnp.float32),
                    gwgts[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
            else:
                dws = []
                for m in ms:
                    lzs = jnp.log(jnp.maximum(
                        bzs[:, self._branch_col(m)],
                        C.ZMIN)).astype(jnp.float32)
                    lam = _PK.fold_lam(eigns[m],
                                   gammas[m]).astype(jnp.float32)
                    rw = _PK.fold_rw(rate_weights[m],
                                 eigns[m].shape[1]).astype(jnp.float32)
                    dws.append((rw[None, :]
                                * jnp.exp(lam[None, :]
                                          * lzs[:, None])).astype(
                                              jnp.float32))
                outs.append(_PK.evaluate_batch_stacked(
                    clvs[g], scalers[g], bp_rows, bq_rows,
                    jnp.stack(dws)[:, :, None, :],
                    gwgts[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret))
        return jnp.stack(self._unstack(outs))

    def _g_evaluate_batch_all_psr(self, clvs, scalers, eigns, gwgts, srs,
                                  bp_rows, bq_rows, bzs, interpret):
        """PSR batched root lnLs -> [M, N]; bzs [N, B]. Traceable (jnp)
        counterpart of _evaluate_batch_pallas's PSR branch, used inside
        the thorough-wave program (evaluateGTRCAT, evaluateGeneric
        Special.c, per-site rates in the exponent)."""
        _PK = self.PK  # evaluate_batch_psr, evaluate_batch_stacked_psr
        outs = []
        for g, ms in enumerate(self.groups):
            bw = self._block_wg(g)
            if len(ms) == 1:
                m = ms[0]
                lzs = K.log_z(bzs[:, self._branch_col(m)]).astype(
                    jnp.float32)
                outs.append(_PK.evaluate_batch_psr(
                    clvs[g], scalers[g], bp_rows, bq_rows, lzs,
                    eigns[m][0].astype(jnp.float32),
                    gwgts[g].astype(jnp.float32),
                    srs[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
            else:
                lams = jnp.stack([
                    eigns[m][0][None, :].astype(jnp.float32)
                    * K.log_z(bzs[:, self._branch_col(m)]).astype(
                        jnp.float32)[:, None]
                    for m in ms])                       # [P, N, S]
                outs.append(_PK.evaluate_batch_stacked_psr(
                    clvs[g], scalers[g], bp_rows, bq_rows, lams,
                    gwgts[g].astype(jnp.float32),
                    srs[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
        return jnp.stack(self._unstack(outs))

    def _g_nr_derivs(self, clvs, scalers, gammas, eigns, rate_weights,
                     gwgts, jp, jq, core_lz, interpret):
        """(d1 [M], d2 [M]) NR derivatives at branch (jp, jq), core_lz
        [B] log branch lengths."""
        _PK = self.PK  # fold_lam, fold_rw, nr_derivatives_pallas, nr_derivatives_stacked
        d1o, d2o = [], []
        for g, ms in enumerate(self.groups):
            bw = self._block_wg(g)
            lams, ds = [], []
            for m in ms:
                lam = _PK.fold_lam(eigns[m], gammas[m])
                d = (_PK.fold_rw(rate_weights[m], eigns[m].shape[1])
                     * jnp.exp(lam
                               * core_lz[self._branch_col(m)])).astype(
                                   jnp.float32)
                lams.append(lam[None, :].astype(jnp.float32))
                ds.append(d[None, :])
            if len(ms) == 1:
                d1, d2 = _PK.nr_derivatives_pallas(
                    clvs[g], scalers[g], jp, jq, lams[0], ds[0],
                    gwgts[g].astype(jnp.float32), block_w=bw,
                    log_min_scale=self.log_min_scale,
                    interpret=interpret)
            else:
                d1, d2 = _PK.nr_derivatives_stacked(
                    clvs[g], scalers[g], jp, jq, jnp.stack(lams),
                    jnp.stack(ds), gwgts[g].astype(jnp.float32),
                    block_w=bw, log_min_scale=self.log_min_scale,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret)
            d1o.append(d1)
            d2o.append(d2)
        return (jnp.stack(self._unstack(d1o)),
                jnp.stack(self._unstack(d2o)))

    def _g_nr_derivs_batch(self, clvs, scalers, gammas, eigns,
                           rate_weights, gwgts, jp, jq, lzs, interpret,
                           srs=None):
        """([M, N], [M, N]) batched NR derivatives; lzs [N] per-candidate
        log branch lengths shared by all partitions (wave semantics), or
        [N, B] with per-branch-class columns (-M waves). srs: per-group
        site-rate tuple (PSR mode only)."""
        _PK = self.PK  # fold_lam, fold_rw, nr_derivatives_batch_pallas, nr_derivatives_batch_stacked
        if lzs.ndim == 1:
            lzs = lzs[:, None]

        def _col(m):
            return self._branch_col(m) if lzs.shape[1] > 1 else 0

        d1o, d2o = [], []
        for g, ms in enumerate(self.groups):
            bw = self._block_wg(g)
            if self.is_psr:
                if len(ms) == 1:
                    m = ms[0]
                    d1, d2 = _PK.nr_derivatives_batch_pallas_psr(
                        clvs[g], scalers[g], jp, jq,
                        eigns[m][0].astype(jnp.float32),
                        gwgts[g].astype(jnp.float32),
                        srs[g].astype(jnp.float32),
                        lzs[:, _col(m)].astype(jnp.float32),
                        block_w=bw, interpret=interpret)
                else:
                    d1, d2 = _PK.nr_derivatives_batch_stacked_psr(
                        clvs[g], scalers[g], jp, jq,
                        jnp.stack([eigns[m][0].astype(jnp.float32)
                                   for m in ms]),
                        gwgts[g].astype(jnp.float32),
                        srs[g].astype(jnp.float32),
                        jnp.stack([lzs[:, _col(m)]
                                   for m in ms]).astype(jnp.float32),
                        block_w=bw, interpret=interpret)
                d1o.append(d1)
                d2o.append(d2)
                continue
            lams, rws = [], []
            for m in ms:
                lams.append(_PK.fold_lam(eigns[m], gammas[m]).astype(
                    jnp.float32)[None, :])
                rws.append(_PK.fold_rw(rate_weights[m],
                                   eigns[m].shape[1]).astype(
                                       jnp.float32)[None, :])
            if len(ms) == 1:
                d1, d2 = _PK.nr_derivatives_batch_pallas(
                    clvs[g], scalers[g], jp, jq, lams[0], rws[0],
                    gwgts[g].astype(jnp.float32),
                    lzs[:, _col(ms[0])], block_w=bw,
                    log_min_scale=self.log_min_scale,
                    interpret=interpret)
            else:
                d1, d2 = _PK.nr_derivatives_batch_stacked(
                    clvs[g], scalers[g], jp, jq, jnp.stack(lams),
                    jnp.stack(rws), gwgts[g].astype(jnp.float32),
                    jnp.stack([lzs[:, _col(m)]
                               for m in ms]),
                    block_w=bw, log_min_scale=self.log_min_scale,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret)
            d1o.append(d1)
            d2o.append(d2)
        return (jnp.stack(self._unstack(d1o)),
                jnp.stack(self._unstack(d2o)))

    def _g_junctions(self, clvs, scalers, gammas, eigns, eis, evs,
                     j_rows, a_rows, b_rows, za, zb, tt, interpret,
                     srs=None):
        """Junction CLV updates (scratch row j_i = combine(a_i via za_i,
        b_i via zb_i)) for every partition; za/zb [N] or [N, B] (-M
        per-branch-class columns). srs: per-group site rates (PSR)."""
        _PK = self.PK  # blockdiag, make_p_batch, newview_level_pallas, newview_level_stacked
        if za.ndim == 1:
            za = za[:, None]
            zb = zb[:, None]

        def _col(m):
            return self._branch_col(m) if za.shape[1] > 1 else 0
        out_c = list(clvs)
        out_s = list(scalers)
        if self.is_psr:
            for g, ms in enumerate(self.groups):
                bw = self._block_wg(g)
                lamqs, lamrs = [], []
                for m in ms:
                    col = _col(m)
                    lza = K.log_z(za[:, col])
                    lzb = K.log_z(zb[:, col])
                    e = eigns[m][0].astype(jnp.float32)
                    lamqs.append(e[None, :] * lza[:, None].astype(
                        jnp.float32))                    # [N, S]
                    lamrs.append(e[None, :] * lzb[:, None].astype(
                        jnp.float32))
                if len(ms) == 1:
                    m = ms[0]
                    c2, s2 = _PK.newview_level_pallas_psr(
                        clvs[g], scalers[g], j_rows, a_rows, b_rows, tt,
                        lamqs[0], lamrs[0],
                        eis[m][0].astype(jnp.float32),
                        evs[m][0].astype(jnp.float32),
                        srs[g].astype(jnp.float32), block_w=bw,
                        min_scale=self.min_scale,
                        inv_min_scale=self.inv_min_scale,
                        interpret=interpret)
                else:
                    c2, s2 = _PK.newview_level_stacked_psr(
                        clvs[g], scalers[g], j_rows, a_rows, b_rows, tt,
                        jnp.stack(lamqs), jnp.stack(lamrs),
                        jnp.stack([eis[m][0].astype(jnp.float32)
                                   for m in ms]),
                        jnp.stack([evs[m][0].astype(jnp.float32)
                                   for m in ms]),
                        srs[g].astype(jnp.float32), block_w=bw,
                        min_scale=self.min_scale,
                        inv_min_scale=self.inv_min_scale,
                        interpret=interpret)
                out_c[g] = c2
                out_s[g] = s2
            return tuple(out_c), tuple(out_s)
        for g, ms in enumerate(self.groups):
            bw = self._block_wg(g)
            pls, prs, evb = [], [], []
            for m in ms:
                col = _col(m)
                pl_m, pr_m = _PK.make_p_batch(za[:, col], zb[:, col],
                                          gammas[m], eigns[m],
                                          eis[m])
                pls.append(pl_m.astype(jnp.float32))
                prs.append(pr_m.astype(jnp.float32))
                evb.append(_PK.blockdiag(evs[m]).astype(jnp.float32))
            if len(ms) == 1:
                c2, s2 = _PK.newview_level_pallas(
                    clvs[g], scalers[g], j_rows, a_rows, b_rows, tt,
                    pls[0], prs[0], evb[0], block_w=bw,
                    min_scale=self.min_scale,
                    inv_min_scale=self.inv_min_scale,
                    interpret=interpret)
            else:
                c2, s2 = _PK.newview_level_stacked(
                    clvs[g], scalers[g], j_rows, a_rows, b_rows, tt,
                    jnp.stack(pls), jnp.stack(prs), jnp.stack(evb),
                    block_w=bw, min_scale=self.min_scale,
                    inv_min_scale=self.inv_min_scale,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret)
            out_c[g] = c2
            out_s[g] = s2
        return tuple(out_c), tuple(out_s)

    def _g_tip_rows(self, clvs, codes, tipvecs, interpret, refresh=None):
        """Materialize tip rows for every partition (refresh: optional
        per-m bool — partitions outside it keep their rows by rewriting
        identical values in stacked groups, or are skipped when their
        whole singleton group is excluded)."""
        _PK = self.PK  # fold_tipvec, tip_rows_pallas, tip_rows_stacked
        out = list(clvs)
        for g, ms in enumerate(self.groups):
            bw = self._block_wg(g)
            # the tip kernel's block covers 8 rows x K x bw twice
            # (aliased in/out are double-buffered): K = 96 (AA) at
            # bw = 8192 allocates 96.5M of the ~16M scoped VMEM
            # (measured OOM on a wide AA partition) — shrink the block
            # to fit
            K_g = self.n_cats * self._padded_states(ms[0])
            while bw > 128 and 8 * K_g * bw * 4 * 2 > 8 * 2 ** 20:
                bw //= 2
            if refresh is not None and not any(refresh[m] for m in ms):
                continue
            if len(ms) == 1:
                m = ms[0]
                out[g] = _PK.tip_rows_pallas(
                    clvs[g], codes[g],
                    _PK.fold_tipvec(tipvecs[m].astype(jnp.float32)),
                    self.g_ntips[g], block_w=bw, interpret=interpret)
            else:
                tv = jnp.stack([
                    _PK.fold_tipvec(tipvecs[m].astype(jnp.float32))
                    for m in ms])
                out[g] = _PK.tip_rows_stacked(
                    clvs[g], codes[g], tv, self.mxtips, block_w=bw,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret)
        return tuple(out)

    # ------------------------------------------------------------------
    # jitted kernels (built per partition / per signature, cached)

    def _get_jit(self, kind, key):
        ck = (kind, key)
        if ck in self._jit_cache:
            return self._jit_cache[ck]

        if kind == 'tip_set':
            @partial(jax.jit, donate_argnums=(0,))
            def fn(clv, tips):
                return clv.at[:self.mxtips + 1].set(tips)
            self._jit_cache[ck] = fn
            return fn

        if kind == 'traversal':
            fn = self._build_traversal_fn()
            self._jit_cache[ck] = fn
            return fn

        if kind == 'evaluate':
            fn = self._build_evaluate_fn()
            self._jit_cache[ck] = fn
            return fn

        if kind == 'evaluate_batch':
            fn = self._build_evaluate_batch_fn()
            self._jit_cache[ck] = fn
            return fn

        if kind == 'sumtable':
            fn = self._build_sumtable_fn()
            self._jit_cache[ck] = fn
            return fn

        if kind == 'nr_core':
            fn = self._build_nr_core_fn()
            self._jit_cache[ck] = fn
            return fn

        if kind == 'psr_lnl':
            fn = self._build_psr_lnl_fn()
            self._jit_cache[ck] = fn
            return fn

        raise KeyError(kind)

    def _branch_col(self, m):
        """Which column of the packed qz/rz arrays partition m uses."""
        return m if self.num_branches > 1 else 0

    def _block_wk(self, W: int, m: int) -> int:
        """_block_w capped by the partition's folded K: the level /
        junction / evaluate / tip kernels move a handful of [K, bw] f32
        blocks through VMEM (double-buffered), so K*bw must stay under
        ~2 MB — at K = 96 (AA) the DNA-tuned 8192 block allocates 18-96 MB
        and Mosaic rejects the kernel (measured on a 16k-wide AA
        partition; DNA's K = 16 never binds, so its plans are
        unchanged)."""
        bw = self._block_w(W)
        K = self.n_cats * self._padded_states(m)
        while bw > 128 and K * bw * 4 > 2 * 2 ** 20:
            bw //= 2
        return bw

    def _block_wg(self, g: int) -> int:
        """K-aware site-block width for group g (see _block_wk)."""
        return self._block_wk(self.g_width[g], self.groups[g][0])

    def _block_w(self, W: int) -> int:
        """Largest site-block width <= 8192 that divides W (every kernel
        asserts W % block_w == 0; a 8320-wide partition must fall back to
        smaller power-of-two blocks, not truncate). Under a mesh the
        kernels see the per-device LOCAL width (shard_map splits the site
        axis), so the block plan is computed from that."""
        W //= self.mesh_ndev
        if W <= 8192:
            return W
        for cand in (8192, 4096, 2048, 1024, 512, 256, 128, 8):
            if W % cand == 0:
                return cand
        return 1

    def _build_traversal_fn(self):
        n_models = self.n_models
        mxtips = self.mxtips

        @partial(jax.jit, donate_argnums=(0, 1))
        def run(clv_list, scaler_list, eign, ei, ev, gamma, wgts,
                psr_rates, rate_cat,
                p_idx, q_idx, r_idx, tip_tip, qz, rz, exec_mask):
            def step(carry, op):
                clvs, scalers = carry
                pi, qi, ri, tt, opqz, oprz = op
                new_clvs = []
                new_scalers = []
                for m in range(n_models):
                    col = self._branch_col(m)
                    lzq = K.log_z(opqz[col])
                    lzr = K.log_z(oprz[col])
                    x1 = clvs[m][qi]
                    x2 = clvs[m][ri]
                    if self.is_psr:
                        pl = K.make_p_cat(lzq, psr_rates[m], eign[m][0],
                                          ei[m][0])
                        pr = K.make_p_cat(lzr, psr_rates[m], eign[m][0],
                                          ei[m][0])
                        x3, sc = K.newview_kernel_cat(
                            x1, x2, scalers[m][qi], scalers[m][ri], pl, pr,
                            rate_cat[m], ev[m][0], tt,
                            self.min_scale, self.inv_min_scale)
                    else:
                        pl = K.make_p(lzq, gamma[m], eign[m], ei[m])
                        pr = K.make_p(lzr, gamma[m], eign[m], ei[m])
                        x3, sc = K.newview_kernel(
                            x1, x2, scalers[m][qi], scalers[m][ri], pl, pr,
                            ev[m], tt, self.min_scale, self.inv_min_scale)
                    # execute mask: masked partitions keep their old CLV
                    x3 = jnp.where(exec_mask[m], x3, clvs[m][pi])
                    sc = jnp.where(exec_mask[m], sc, scalers[m][pi])
                    new_clvs.append(clvs[m].at[pi].set(x3))
                    new_scalers.append(scalers[m].at[pi].set(sc))
                return (tuple(new_clvs), tuple(new_scalers)), None

            ops = (p_idx, q_idx, r_idx, tip_tip, qz, rz)
            (clvs, scalers), _ = jax.lax.scan(
                step, (tuple(clv_list), tuple(scaler_list)), ops)
            return clvs, scalers

        return run

    def _build_evaluate_fn(self):
        n_models = self.n_models

        @jax.jit
        def run(clv_list, scaler_list, eign, gamma, rate_weights, wgts,
                site_rates, p_row, q_row, qz):
            out = []
            for m in range(n_models):
                col = self._branch_col(m)
                lz = jnp.log(jnp.maximum(qz[col], C.ZMIN))
                if self.is_psr:
                    lh = K.evaluate_kernel_cat(
                        clv_list[m][q_row], clv_list[m][p_row],
                        scaler_list[m][q_row], scaler_list[m][p_row],
                        site_rates[m], eign[m][0], lz, wgts[m],
                        self.log_min_scale)
                else:
                    diag = jnp.exp(eign[m] * gamma[m][:, None] * lz)
                    lh = K.evaluate_kernel(
                        clv_list[m][q_row], clv_list[m][p_row],
                        scaler_list[m][q_row], scaler_list[m][p_row], diag,
                        rate_weights[m], wgts[m], self.log_min_scale)
                out.append(lh)
            return jnp.stack(out)

        return run

    def _build_evaluate_batch_fn(self):
        """Batched evaluate: N (row-pair, branch-length) triples scored in
        one dispatch — the kernel form of one SPR candidate wave (the
        reference instead pays one evaluateGeneric + MPI reduction per
        insertion candidate, searchAlgo.c testInsertBIG :682-777)."""
        n_models = self.n_models

        @jax.jit
        def run(clv_list, scaler_list, eign, gamma, rate_weights, wgts,
                site_rates, p_rows, q_rows, qzs):
            out = []
            for m in range(n_models):
                col = self._branch_col(m)
                lzs = jnp.log(jnp.maximum(qzs[:, col], C.ZMIN))
                if self.is_psr:
                    def one(pr, qr, lz, m=m):
                        return K.evaluate_kernel_cat(
                            clv_list[m][qr], clv_list[m][pr],
                            scaler_list[m][qr], scaler_list[m][pr],
                            site_rates[m], eign[m][0], lz, wgts[m],
                            self.log_min_scale)
                    lh = jax.vmap(one)(p_rows, q_rows, lzs)
                else:
                    diag = jnp.exp(eign[m][None] * gamma[m][None, :, None]
                                   * lzs[:, None, None])      # [N, C, S]

                    def one(pr, qr, dg, m=m):
                        return K.evaluate_kernel(
                            clv_list[m][qr], clv_list[m][pr],
                            scaler_list[m][qr], scaler_list[m][pr],
                            dg, rate_weights[m], wgts[m],
                            self.log_min_scale)
                    lh = jax.vmap(one)(p_rows, q_rows, diag)
                out.append(lh)
            return jnp.stack(out)                              # [M, N]

        return run

    def _pad_batch(self, p_rows, q_rows, zs):
        N = len(p_rows)
        L = 4
        while L < N:
            L *= 2
        dummy = self.scratch_base - 1
        jp = np.full(L, dummy, dtype=np.int32)
        jp[:N] = p_rows
        jq = np.full(L, dummy, dtype=np.int32)
        jq[:N] = q_rows
        z = np.full((L, self.num_branches), C.DEFAULTZ)
        z[:N] = zs
        return jp, jq, z

    def fetch(self, handles, kind='fetch'):
        """Materialize a batch of device values with ONE synchronization
        point: all transfers start asynchronously, then each is awaited.
        Through a remote runtime every separate value fetch costs a full
        round trip (~34 ms on the axon tunnel); the speculative SPR driver
        funnels a whole wave of lazily dispatched programs through one
        fetch. numpy entries pass through unchanged."""
        t0 = time.perf_counter()
        for h in handles:
            if hasattr(h, 'copy_to_host_async'):
                h.copy_to_host_async()
        out = [np.asarray(h, dtype=np.float64) for h in handles]
        self._count(kind)
        self._time(kind, time.perf_counter() - t0)
        return out

    def evaluate_batch_lazy(self, p_rows, q_rows, zs):
        """evaluate_batch without the host sync: returns a device (or
        host, on the jnp path) handle [M, L] of per-partition candidate
        lnls; slice [:, :N] and sum axis 0 after fetch."""
        jp, jq, z = self._pad_batch(p_rows, q_rows, zs)
        if self.use_pallas:
            return self._evaluate_batch_pallas(jp, jq, z)
        fn = self._get_jit('evaluate_batch', len(jp))
        return fn(tuple(self.clv), tuple(self.scaler),
                  tuple(self.d_EIGN), tuple(self.d_gamma),
                  tuple(self.d_rate_weights), tuple(self.wgts),
                  tuple(self.d_site_rates),
                  jnp.asarray(jp), jnp.asarray(jq),
                  jnp.asarray(z, dtype=self.dtype))

    def evaluate_batch(self, p_rows, q_rows, zs) -> np.ndarray:
        """Log likelihood of N branches in one wave: candidate i is the
        branch of length zs[i] (per branch class) between the CLVs in
        buffer rows p_rows[i] and q_rows[i]. Returns [N] summed over
        partitions. Rows may be scratch rows written by a synthetic
        traversal (see SprSearch batched scoring)."""
        N = len(p_rows)
        lhs = self.fetch([self.evaluate_batch_lazy(p_rows, q_rows, zs)],
                         kind='evaluate_batch')[0]
        return lhs[:, :N].sum(axis=0)

    def traverse_and_score_lazy(self, entries, p_rows, q_rows, zs,
                                sub_mask=None, zqr_sub=None):
        """Dispatch a synthetic traversal + batched branch scoring WITHOUT
        fetching: returns a handle [M, L] of per-partition candidate lnls
        (slice [:, :N], sum axis 0 after engine.fetch). sub_mask marks
        traversal slots whose rz branch is replaced on device by zqr_sub
        (the device-resident prune-branch NR result of the speculative
        SPR driver)."""
        if self.use_pallas:
            packed = self._pack_fused(entries)
            fn = self._pallas_program('trav_evalbatch', packed)
            if fn is not None:
                jp, jq, z = self._pad_batch(p_rows, q_rows, zs)
                clvs, scalers, lhs = fn(
                    tuple(self.clv), tuple(self.scaler),
                    jnp.ones(self.n_models, dtype=bool),
                    *self._trav_args(packed, sub_mask, zqr_sub),
                    tuple(self.d_rate_weights), tuple(self.g_wgt),
                    jnp.asarray(jp), jnp.asarray(jq),
                    jnp.asarray(z, dtype=self.dtype))
                self.clv = list(clvs)
                self.scaler = list(scalers)
                return lhs
        assert sub_mask is None or not any(sub_mask), \
            'branch substitution requires the fused program'
        self._run_traversal(entries)
        return self.evaluate_batch_lazy(p_rows, q_rows, np.asarray(zs))

    def traverse_and_score(self, entries, p_rows, q_rows, zs) -> np.ndarray:
        """Synthetic traversal (proximal/junction CLV ops) + batched
        branch scoring — ONE device dispatch on the accelerator path (the
        whole lazy-SPR candidate wave of a pruned subtree)."""
        N = len(p_rows)
        lhs = self.fetch([self.traverse_and_score_lazy(entries, p_rows,
                                                       q_rows, zs)],
                         kind='spr_lazy_wave')[0]
        return lhs[:, :N].sum(axis=0)

    def _evaluate_batch_pallas(self, jp, jq, zs):
        _PK = self.PK  # evaluate_batch_psr
        interpret = jax.default_backend() == 'cpu'
        jpd = jnp.asarray(jp)
        jqd = jnp.asarray(jq)
        if self.is_psr:
            _PK = self.PK  # evaluate_batch_stacked_psr
            fn = self._jit_cache.get('pallas_eval_batch')
            if fn is None:
                fn = jax.jit(_PK.evaluate_batch_psr,
                             static_argnames=('block_w', 'log_min_scale',
                                              'interpret'))
                self._jit_cache['pallas_eval_batch'] = fn
            outs = []
            for g, ms in enumerate(self.groups):
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    lzs = jnp.asarray(
                        np.log(np.maximum(zs[:, col], C.ZMIN)),
                        dtype=jnp.float32)
                    outs.append(fn(
                        self.clv[g], self.scaler[g], jpd, jqd, lzs,
                        self.d_EIGN[m][0].astype(jnp.float32),
                        self.g_wgt[g].astype(jnp.float32),
                        self._gsr(g).astype(jnp.float32),
                        block_w=self._block_wg(g),
                        log_min_scale=self.log_min_scale,
                        interpret=interpret))
                    continue
                pfn = self._jit_cache.get('pallas_evalb_stacked_psr')
                if pfn is None:
                    pfn = jax.jit(_PK.evaluate_batch_stacked_psr,
                                  static_argnames=('block_w',
                                                   'log_min_scale',
                                                   'interpret'))
                    self._jit_cache['pallas_evalb_stacked_psr'] = pfn
                    pfn = self._jit_cache['pallas_evalb_stacked_psr']
                lams = jnp.stack([
                    self.d_EIGN[m][0][None, :].astype(jnp.float32)
                    * jnp.asarray(np.log(np.maximum(
                        zs[:, self._branch_col(m)],
                        C.ZMIN)), jnp.float32)[:, None]
                    for m in ms])                       # [P, N, S]
                outs.append(pfn(
                    self.clv[g], self.scaler[g], jpd, jqd, lams,
                    self.g_wgt[g].astype(jnp.float32),
                    self._gsr(g).astype(jnp.float32),
                    block_w=self._block_wg(g),
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
            return jnp.stack(self._unstack(outs))
        fn = self._jit_cache.get('pallas_eval_batch')
        if fn is None:
            def run(clvs, scalers, gammas, eigns, rws, gwgts, jpd, jqd,
                    bzs):
                return self._g_evaluate_batch_all(
                    clvs, scalers, gammas, eigns, rws, gwgts, jpd, jqd,
                    bzs, interpret)
            fn = jax.jit(run)
            self._jit_cache['pallas_eval_batch'] = fn
        return fn(tuple(self.clv), tuple(self.scaler),
                  tuple(self.d_gamma), tuple(self.d_EIGN),
                  tuple(self.d_rate_weights), tuple(self.g_wgt),
                  jpd, jqd, jnp.asarray(zs, dtype=self.dtype))

    def _build_sumtable_fn(self):
        n_models = self.n_models

        @jax.jit
        def run(clv_list, scaler_list, p_row, q_row):
            sums = []
            srels = []
            for m in range(n_models):
                sums.append(K.sumtable_kernel(clv_list[m][p_row],
                                              clv_list[m][q_row]))
                s = scaler_list[m][p_row] + scaler_list[m][q_row]
                smin = jnp.min(s, axis=0)
                rel = (s - smin[None, :]).astype(self.dtype)
                srels.append(jnp.exp(rel * self.log_min_scale))
            return tuple(sums), tuple(srels)

        return run

    def _build_nr_core_fn(self):
        n_models = self.n_models

        @jax.jit
        def run(sumtables, srels, eign, gamma, rate_weights, wgts,
                site_rates, lzs):
            d1s, d2s = [], []
            for m in range(n_models):
                col = self._branch_col(m)
                if self.is_psr:
                    d1, d2 = K.nr_core_kernel_cat(
                        sumtables[m], site_rates[m], lzs[col], eign[m][0],
                        wgts[m])
                else:
                    d1, d2 = K.nr_core_kernel(sumtables[m], srels[m],
                                              lzs[col], gamma[m], eign[m],
                                              wgts[m], rate_weights[m])
                d1s.append(d1)
                d2s.append(d2)
            return jnp.stack(d1s), jnp.stack(d2s)

        return run

    def _build_psr_lnl_fn(self):
        """Full traversal + per-site log likelihoods at arbitrary per-site
        rates, all sites in one wave (the TPU-native form of the PSR rate
        scan; reference optRateCatPthreads + evaluatePartialGeneric)."""
        n_models = self.n_models

        @jax.jit
        def run(clv_list, scaler_list, eign, ei, ev, site_rates, root_qzs,
                p_idx, q_idx, r_idx, tip_tip, qz, rz, root_p, root_q):
            def step(carry, op):
                clvs, scalers = carry
                pi, qi, ri, tt, opqz, oprz = op
                new_c, new_s = [], []
                for m in range(n_models):
                    col = self._branch_col(m)
                    lzq = K.log_z(opqz[col])
                    lzr = K.log_z(oprz[col])
                    x3, sc = K.newview_kernel_persite(
                        clvs[m][qi], clvs[m][ri],
                        scalers[m][qi], scalers[m][ri],
                        site_rates[m], lzq, lzr, eign[m][0], ei[m][0],
                        ev[m][0], tt,
                        self.min_scale, self.inv_min_scale)
                    new_c.append(clvs[m].at[pi].set(x3))
                    new_s.append(scalers[m].at[pi].set(sc))
                return (tuple(new_c), tuple(new_s)), None

            ops = (p_idx, q_idx, r_idx, tip_tip, qz, rz)
            (clvs, scalers), _ = jax.lax.scan(
                step, (tuple(clv_list), tuple(scaler_list)), ops)

            out = []
            for m in range(n_models):
                col = self._branch_col(m)
                lz = jnp.log(jnp.maximum(root_qzs[col], C.ZMIN))
                out.append(K.per_site_lnl_kernel(
                    clvs[m][root_q], clvs[m][root_p],
                    scalers[m][root_q], scalers[m][root_p],
                    site_rates[m], eign[m][0], lz, self.log_min_scale))
            return tuple(out)

        return run

    def psr_per_site_lnl(self, rates_list):
        """Per-site pattern log likelihoods with per-site rates rates_list
        (numpy [W] per partition), evaluated at tr.start like the PSR
        optimizer does."""
        if self.use_pallas:
            return self._psr_per_site_lnl_pallas(rates_list)
        tr = self.tree
        p = tr.start
        q = p.back
        entries = full_traversal(tr, q)
        packed = pack_traversal(tr, entries)
        fn = self._get_jit('psr_lnl', packed.p_idx.shape[0])
        out = fn(tuple(self.clv), tuple(self.scaler),
                 tuple(self.d_EIGN), tuple(self.d_EI), tuple(self.d_EV),
                 tuple(jnp.asarray(r, dtype=self.dtype) for r in rates_list),
                 jnp.asarray(np.array(q.z), dtype=self.dtype),
                 jnp.asarray(packed.p_idx), jnp.asarray(packed.q_idx),
                 jnp.asarray(packed.r_idx), jnp.asarray(packed.tip_tip),
                 jnp.asarray(packed.qz, dtype=self.dtype),
                 jnp.asarray(packed.rz, dtype=self.dtype),
                 p.number, q.number)
        return [self.host_sites(o).astype(np.float64) for o in out]

    def _psr_per_site_lnl_pallas(self, rates_list):
        """Pallas path for the PSR rate scan: run the traversal wave on
        scratch copies of the CLV buffers with the proposed per-site rates,
        then read per-site lnls at the root."""
        _PK = self.PK  # per_site_lnl_pallas
        from .traversal import chunk_entries
        tr = self.tree
        p = tr.start
        q = p.back
        entries = full_traversal(tr, q)
        chunks = chunk_entries(tr, entries, 16)
        interpret = jax.default_backend() == 'cpu'

        fn = self._jit_cache.get('pallas_nv')
        assert fn is not None or True
        # reuse the PSR level_update jit; temporarily swap site rates in
        # (per-partition AND per-group: the stacked level kernels read
        # g_site_rates)
        saved_clv = self.clv
        saved_scaler = self.scaler
        saved_rates = self.d_site_rates
        saved_grates = self.g_site_rates
        self.clv = [jnp.array(c) for c in self.clv]     # scratch copies
        self.scaler = [jnp.array(s) for s in self.scaler]
        self.d_site_rates = [jnp.asarray(r, dtype=self.dtype)
                             for r in rates_list]
        self.g_site_rates = [
            self.d_site_rates[ms[0]] if len(ms) == 1
            else self._stack_site_rates(g, rates_list)
            for g, ms in enumerate(self.groups)]
        try:
            self._run_traversal_pallas(entries, None)
            lfn = self._jit_cache.get('pallas_pslnl')
            if lfn is None:
                lfn = jax.jit(_PK.per_site_lnl_pallas,
                              static_argnames=('block_w', 'log_min_scale',
                                               'interpret'))
                self._jit_cache['pallas_pslnl'] = lfn
            jp = jnp.asarray([p.number], dtype=jnp.int32)
            jq = jnp.asarray([q.number], dtype=jnp.int32)
            out = [None] * self.n_models
            for g, ms in enumerate(self.groups):
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    lz = math.log(max(q.z[col], C.ZMIN))
                    out[m] = np.asarray(lfn(
                        self.clv[g], self.scaler[g], jp, jq,
                        self.d_EIGN[m][0][None, :].astype(jnp.float32),
                        self._gsr(g).astype(jnp.float32),
                        jnp.asarray([lz], dtype=jnp.float32),
                        block_w=self._block_wg(g),
                        log_min_scale=self.log_min_scale,
                        interpret=interpret), dtype=np.float64)
                    continue
                _PK = self.PK  # per_site_lnl_stacked
                sfn = self._jit_cache.get('pallas_pslnl_stacked')
                if sfn is None:
                    sfn = jax.jit(_PK.per_site_lnl_stacked,
                                  static_argnames=('block_w',
                                                   'log_min_scale',
                                                   'interpret'))
                    self._jit_cache['pallas_pslnl_stacked'] = sfn
                    sfn = self._jit_cache['pallas_pslnl_stacked']
                lzs = [math.log(max(q.z[self._branch_col(m)], C.ZMIN))
                       for m in ms]
                res = np.asarray(sfn(
                    self.clv[g], self.scaler[g], jp, jq,
                    jnp.stack([self.d_EIGN[m][0].astype(jnp.float32)
                               for m in ms]),
                    self._gsr(g).astype(jnp.float32),
                    jnp.asarray(lzs, jnp.float32),
                    block_w=self._block_wg(g),
                    log_min_scale=self.log_min_scale,
                    interpret=interpret), dtype=np.float64)
                for j, m in enumerate(ms):
                    out[m] = res[j, :self.widths[m]]
        finally:
            self.clv = saved_clv
            self.scaler = saved_scaler
            self.d_site_rates = saved_rates
            self.g_site_rates = saved_grates
        return out

    # ------------------------------------------------------------------
    # generic operations (host API mirroring the reference entry points)

    def _pallas_group(self, m) -> int:
        """Ops fused per MXU matmul in the grouped traversal kernel.

        Measured on hardware (v5e, 64 taxa x 64k sites): a batched group
        costs ~254us/wave-slot vs ~48us per single op — the [G*K, bw]
        gather/scatter traffic through VMEM outweighs the bigger matmuls
        (at K=16 the op is VPU-movement-bound, not MXU-bound), and real
        trees' long 1-wide chain tails leave groups ~2/8 occupied. So the
        product path runs group=1 on flat descriptors with the dynamic
        n_exec bound (padding slots skipped); the grouped kernel and
        pack_grouped stay available (tests cover bit-equivalence) for
        wide-level regimes (e.g. 10^3+-taxon balanced trees)."""
        return 1

    def _fused_plan(self, packed):
        """(n_rows, per-model block_w) for the fused whole-traversal
        kernel, or None when the VMEM working set does not fit. A
        NEGATIVE block_w entry selects the HBM-resident variant
        (traversal_fused_hbm / traversal_fused_hbm_stacked: per-op child
        DMA instead of keeping every row's column block in VMEM) with
        |block_w| — big trees exceed the resident kernel's row ceiling
        but keep the one-dispatch-per-group structure."""
        max_row = int(max(packed.p_idx.max(), packed.q_idx.max(),
                          packed.r_idx.max()))
        n_rows = (2 * self.mxtips if max_row < 2 * self.mxtips
                  else self.rows)
        return self._fused_plan_rows(n_rows)

    def _fused_plan_rows(self, n_rows):
        budget = 12 * 2 ** 20            # ~16 MB VMEM/core, leave slack
        plan = []
        for g, ms in enumerate(self.groups):
            m = ms[0]
            S = self._padded_states(m)
            K = self.n_cats * S
            gk = self._pallas_group(m) * K
            bw = None
            for cand in (1024, 512, 256, 128):
                if cand > self.g_width[g] or self.g_width[g] % cand:
                    continue
                # x2: Mosaic double-buffers the aliased out blocks across
                # grid steps (measured: 128x17x1024x4 plans 8.9M, allocates
                # 17.0M on hardware); + gather scratch and matmul
                # temporaries of the grouped kernel (~4 [G*K, bw] buffers)
                need = (n_rows * (K + 1) * cand * 4 * 2
                        + 4 * gk * cand * 4)
                if need <= budget:
                    bw = cand
                    break
            if bw is None:
                # HBM variant: prefer the whole member width (fewest DMA
                # issues — the scalar core's issue rate is the binding
                # resource); VMEM holds the gather scratch + the blocked
                # scale-counter columns of every row. The HBM branch runs
                # against a 14 MB ceiling (vs the resident 12 MB): the
                # K = 96 sweet spot g=2 x bw=4096 needs 13.7 MB and runs
                # 2.1x faster than the 12 MB-admissible g=4 x bw=2048
                # (measured 12.1 vs 21.4 ms per 62-op AA wave)
                for cand in ([self.g_width[g], 4096, 2048, 1024, 512,
                              256, 128]):
                    if (cand > self.g_width[g] or self.g_width[g] % cand
                            or cand % 128):
                        continue
                    gd = self._hbm_group_raw(K, cand)
                    # aliased in/out scaler blocks share one VMEM buffer
                    # (validated on hardware at 1032 rows x 1664 cols)
                    need = (self.rows * cand * 4
                            + 3 * gd * K * cand * 4)
                    if need <= 14 * 2 ** 20:
                        bw = -cand       # HBM-resident marker
                        break
                if bw is None:
                    return None
            plan.append(bw)
        return n_rows, tuple(plan)

    def _build_pallas_program(self, kind, n_rows, plan):
        """One jitted multi-partition program for the accelerator path:
        all partitions' Mosaic kernels run inside a single XLA executable,
        so one engine operation costs ONE device dispatch regardless of
        partition count (through the remote tunnel a dispatch costs
        ~5 ms; the reference instead pays an MPI reduction per operation).
        kind: 'trav' (fused traversal), 'trav_eval' (+ root lnL per
        partition), 'trav_evalbatch' (+ batched candidate lnLs)."""
        interpret = jax.default_backend() == 'cpu'
        traverse = self._make_traverse(n_rows, plan, interpret)

        if self.is_psr:
            # PSR programs carry the per-site rates as a trailing operand
            # (_trav_args appends it): the fused kernels' per-op column
            # scales and the PSR evaluate kernels both consume it
            if kind == 'trav':
                def run(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq,
                        lzr, sub, zqrs, nex, gammas, eigns, eis, evs,
                        srates):
                    return traverse(clvs, scalers, exec_mask, jp, jq, jr,
                                    jt, lzq, lzr, sub, zqrs, nex, gammas,
                                    eigns, eis, evs, srates)
            elif kind == 'trav_eval':
                def run(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq,
                        lzr, sub, zqrs, nex, gammas, eigns, eis, evs,
                        srates, rate_weights, gwgts, p_row, q_row, qz):
                    clvs, scalers = traverse(clvs, scalers, exec_mask,
                                             jp, jq, jr, jt, lzq, lzr,
                                             sub, zqrs, nex, gammas,
                                             eigns, eis, evs, srates)
                    lhs = self._g_evaluate_all(clvs, scalers, gammas,
                                               eigns, rate_weights,
                                               gwgts, p_row, q_row, qz,
                                               interpret, srates=srates)
                    return clvs, scalers, lhs
            elif kind == 'trav_evalbatch':
                def run(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq,
                        lzr, sub, zqrs, nex, gammas, eigns, eis, evs,
                        srates, rate_weights, gwgts, bp_rows, bq_rows,
                        bzs):
                    clvs, scalers = traverse(clvs, scalers, exec_mask,
                                             jp, jq, jr, jt, lzq, lzr,
                                             sub, zqrs, nex, gammas,
                                             eigns, eis, evs, srates)
                    lhs = self._g_evaluate_batch_all_psr(
                        clvs, scalers, eigns, gwgts, srates,
                        bp_rows, bq_rows, bzs, interpret)
                    return clvs, scalers, lhs
            else:
                raise KeyError(kind)
            return jax.jit(run, donate_argnums=(0, 1))

        if kind == 'trav':
            def run(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq, lzr,
                    sub, zqrs, nex, gammas, eigns, eis, evs):
                return traverse(clvs, scalers, exec_mask, jp, jq, jr, jt,
                                lzq, lzr, sub, zqrs, nex, gammas, eigns,
                                eis, evs)
        elif kind == 'trav_eval':
            def run(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq, lzr,
                    sub, zqrs, nex, gammas, eigns, eis, evs, rate_weights,
                    gwgts, p_row, q_row, qz):
                clvs, scalers = traverse(clvs, scalers, exec_mask, jp, jq,
                                         jr, jt, lzq, lzr, sub, zqrs, nex,
                                         gammas, eigns, eis, evs)
                lhs = self._g_evaluate_all(clvs, scalers, gammas, eigns,
                                           rate_weights, gwgts, p_row,
                                           q_row, qz, interpret)
                return clvs, scalers, lhs
        elif kind == 'trav_evalbatch':
            def run(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq, lzr,
                    sub, zqrs, nex, gammas, eigns, eis, evs, rate_weights,
                    gwgts, bp_rows, bq_rows, bzs):
                clvs, scalers = traverse(clvs, scalers, exec_mask, jp, jq,
                                         jr, jt, lzq, lzr, sub, zqrs, nex,
                                         gammas, eigns, eis, evs)
                lhs = self._g_evaluate_batch_all(
                    clvs, scalers, gammas, eigns, rate_weights, gwgts,
                    bp_rows, bq_rows, bzs, interpret)
                return clvs, scalers, lhs
        else:
            raise KeyError(kind)

        return jax.jit(run, donate_argnums=(0, 1))

    def _make_traverse(self, n_rows, plan, interpret):
        """The fused multi-partition traversal as a reusable jnp-level
        function (consumed by the trav/trav_eval/trav_evalbatch programs
        and the on-device model-optimization programs)."""
        _PK = self.PK  # blockdiag, blockdiag_tile, fold_lam, traversal_fused_pallas, traversal_fused_stacked

        def traverse(clvs, scalers, exec_mask, jp, jq, jr, jt, lzq, lzr,
                     sub, zqrs, nex, gammas, eigns, eis, evs,
                     srates=None):
            # exec_mask is a dynamic [M] bool vector (one compiled program
            # serves every evaluateChange mask pattern); masked partitions
            # keep their stale CLVs (singletons via a select, stacked
            # groups in-kernel). Slots with sub[i]&1 take their rz branch
            # length (sub[i]&2: qz) from the device value zqrs
            # (speculative SPR: the prune-branch NR result never visits
            # the host).
            lzqr = jnp.log(jnp.maximum(zqrs, C.ZMIN)).astype(
                jnp.float32)[None, :]
            lzr = jnp.where((sub & 1).astype(bool)[:, None], lzqr, lzr)
            lzq = jnp.where((sub & 2).astype(bool)[:, None], lzqr, lzq)
            out_c = list(clvs)
            out_s = list(scalers)
            for gi, ms in enumerate(self.groups):
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    lam = _PK.fold_lam(eigns[m],
                                   gammas[m]).astype(jnp.float32)
                    sr = srates[gi] if self.is_psr else None
                    if plan[gi] < 0:
                        # HBM-resident variant: rows exceed the resident
                        # kernel's VMEM ceiling (big trees)
                        K_dim = self.n_cats * self._padded_states(m)
                        c2, s2 = _PK.traversal_fused_hbm(
                            clvs[gi], scalers[gi], jp, jq, jr, jt,
                            lzq[:, col], lzr[:, col], lam[None, :],
                            _PK.blockdiag(eis[m]).astype(jnp.float32),
                            _PK.blockdiag(evs[m]).astype(jnp.float32),
                            sr,
                            n_exec=nex[0], block_w=-plan[gi],
                            group=self._hbm_group(K_dim, -plan[gi]),
                            min_scale=self.min_scale,
                            inv_min_scale=self.inv_min_scale,
                            interpret=interpret)
                    else:
                        g = self._pallas_group(m)
                        c2, s2 = _PK.traversal_fused_pallas(
                            clvs[gi], scalers[gi], jp, jq, jr, jt,
                            lzq[:, col], lzr[:, col], lam[None, :],
                            _PK.blockdiag_tile(
                                _PK.blockdiag(eis[m]).astype(jnp.float32),
                                g),
                            _PK.blockdiag_tile(
                                _PK.blockdiag(evs[m]).astype(jnp.float32),
                                g),
                            sr,
                            n_exec=nex[0], n_rows=n_rows,
                            block_w=plan[gi],
                            group=g, min_scale=self.min_scale,
                            inv_min_scale=self.inv_min_scale,
                            interpret=interpret)
                    out_c[gi] = jnp.where(exec_mask[m], c2, clvs[gi])
                    out_s[gi] = jnp.where(exec_mask[m], s2, scalers[gi])
                else:
                    cols = jnp.asarray(self._g_cols(ms))
                    lams = jnp.stack([
                        _PK.fold_lam(eigns[m], gammas[m]).astype(jnp.float32)
                        for m in ms])
                    eib = jnp.stack([
                        _PK.blockdiag(eis[m]).astype(jnp.float32)
                        for m in ms])
                    evb = jnp.stack([
                        _PK.blockdiag(evs[m]).astype(jnp.float32)
                        for m in ms])
                    ex_g = exec_mask[jnp.asarray(ms)].astype(jnp.int32)
                    sr = srates[gi] if self.is_psr else None
                    if plan[gi] < 0:
                        # stacked HBM-resident variant: big trees keep
                        # one launch per group past the VMEM row ceiling
                        K_dim = self.n_cats * self._padded_states(ms[0])
                        c2, s2 = _PK.traversal_fused_hbm_stacked(
                            clvs[gi], scalers[gi], jp, jq, jr, jt,
                            lzq, lzr, cols, lams, eib, evb,
                            ex_g, sr, n_exec=nex[0], block_w=-plan[gi],
                            group=self._hbm_group(K_dim, -plan[gi]),
                            min_scale=self.min_scale,
                            inv_min_scale=self.inv_min_scale,
                            shard_member=self.g_member_sharded[gi],
                            interpret=interpret)
                    else:
                        c2, s2 = _PK.traversal_fused_stacked(
                            clvs[gi], scalers[gi], jp, jq, jr, jt,
                            lzq[:, cols], lzr[:, cols], lams, eib, evb,
                            ex_g, sr, n_exec=nex[0], n_rows=n_rows,
                            block_w=plan[gi],
                            min_scale=self.min_scale,
                            inv_min_scale=self.inv_min_scale,
                            shard_member=self.g_member_sharded[gi],
                            interpret=interpret)
                    out_c[gi] = c2
                    out_s[gi] = s2
            return tuple(out_c), tuple(out_s)

        return traverse

    def _fused_slots(self, n: int) -> int:
        """Canonical descriptor length for the fused traversal programs:
        few, coarse buckets (the kernel's dynamic n_exec makes the padded
        tail free, so the only cost of a big bucket is host-side numpy
        fill) keep the number of remote XLA compiles small — measured
        6 s per shape through the tunnel."""
        b = 32
        while b < n:
            b *= 4
        return b

    @property
    def _fused_grouped(self) -> bool:
        """Whether the fused-traversal descriptors are packed as aligned
        independent-op blocks (pack_grouped) instead of flat: big trees
        whose full row buffer exceeds the resident kernel's VMEM ceiling
        run the HBM variant, whose G concurrent child DMAs per block
        lift the op loop from DMA-latency-bound to ~bandwidth. The
        grouped descriptor is also valid for the resident kernel
        (group=1 execution; padding slots are dummy ops), so one packing
        serves mixed plans."""
        v = self.__dict__.get('_fused_grouped_c')
        if v is None:
            plan = self._fused_plan_rows(self.rows)
            v = plan is not None and any(bw < 0 for bw in plan[1])
            self.__dict__['_fused_grouped_c'] = v
        return v

    def _hbm_group_raw(self, k_dim: int, bw: int) -> int:
        """Concurrent-DMA block size for the HBM fused kernels: with the
        VMEM-resident scale counters the v5e measures ~3.4-3.7 ms per
        511-op x 1664-col wave for G in {1,4,8} (min over interleaved
        reps; tunnel noise dominates medians) — G=4 minutely fastest
        (252M site-updates/s); shrunk when the gather scratch (3
        [G, K, bw] f32 buffers) would crowd VMEM."""
        g = min(PALLAS_GROUP, 4)
        # 10 MB gather-scratch allowance: at K = 96 (AA) the old 6 MB cap
        # forced g = 1 and left the loop DMA-latency-bound — measured
        # 64-taxa × 16k AA wave 40.5 ms (g=1, bw=4096) vs 12.0 ms
        # (g=2, bw=4096) / 12.2 ms (g=2, bw=2048): 4.3× from concurrent
        # gathers. DNA's K = 16 plans are unchanged (1.3 MB at g=4).
        while g > 1 and 3 * g * k_dim * bw * 4 > 10 * 2 ** 20:
            g //= 2
        return g

    def _hbm_group(self, k_dim: int, bw: int) -> int:
        if not self._fused_grouped:
            return 1
        return self._hbm_group_raw(k_dim, bw)

    @property
    def _fused_pack_group(self) -> int:
        """Block size of the grouped descriptor: the LARGEST kernel DMA
        group any partition's HBM plan uses. Packing at a fixed 8 padded
        every 1-wide chain level to 8 slots (7/8 dummy ops executed —
        measured 51.6 ms vs 21.4 ms for the same 62-op AA wave on a
        chain-heavy tree); padding now matches what the kernels actually
        run concurrently."""
        v = self.__dict__.get('_fused_pack_group_c')
        if v is None:
            plan = self._fused_plan_rows(self.rows)
            v = 1
            if plan is not None:
                for g, bw in enumerate(plan[1]):
                    if bw < 0:
                        K = self.n_cats * self._padded_states(
                            self.groups[g][0])
                        v = max(v, self._hbm_group_raw(K, -bw))
            self.__dict__['_fused_pack_group_c'] = v
        return v

    def _pack_fused(self, entries) -> PackedTraversal:
        """Descriptor packing for the fused-traversal programs (all
        callers of _pallas_program must use this so one compiled program
        serves every traversal)."""
        if self._fused_grouped:
            gp = self._fused_pack_group
            return pack_grouped(
                self.tree, entries, group=gp,
                pad_rows=[self.pad_sink_base + i for i in range(gp)])
        return pack_traversal(self.tree, entries,
                              slots=self._fused_slots(len(entries)))

    def _pallas_program(self, kind, packed):
        plan = self._fused_plan(packed)
        if plan is None:
            return None
        n_rows, bws = plan
        key = ('pprog', kind, n_rows, bws)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._build_pallas_program(kind, n_rows, bws)
            self._jit_cache[key] = fn
        return fn

    def _trav_args(self, packed, sub_mask=None, zqr_sub=None):
        jp = jnp.asarray(packed.p_idx)
        jq = jnp.asarray(packed.q_idx)
        jr = jnp.asarray(packed.r_idx)
        jt = jnp.asarray(packed.tip_tip.astype(np.int32))
        lzq = jnp.asarray(
            np.log(np.maximum(packed.qz, C.ZMIN)).astype(np.float32))
        lzr = jnp.asarray(
            np.log(np.maximum(packed.rz, C.ZMIN)).astype(np.float32))
        nex = jnp.asarray([packed.exec_count()], dtype=jnp.int32)
        # device-side branch substitution: bit 1 of sub[i] replaces the
        # slot's rz (bit 2: qz) with zqr_sub — a device-resident value
        # such as the in-flight prune-branch NR result of the speculative
        # SPR driver — instead of the host descriptor (which then only
        # carries a placeholder). Boolean masks (rz-only) still work.
        L = packed.p_idx.shape[0]
        sub = np.zeros(L, dtype=np.int32)
        if sub_mask is not None:
            sm = np.asarray(sub_mask, dtype=np.int32)
            if packed.slot_of is not None:
                # grouped packings permute entries into independent
                # blocks; sub_mask is entry-ordered
                sub[packed.slot_of[:len(sm)]] = sm
            else:
                sub[:len(sm)] = sm
        if zqr_sub is None:
            zqr_sub = jnp.full((self.num_branches,), C.DEFAULTZ,
                               jnp.float32)
        else:
            zqr_sub = jnp.asarray(zqr_sub).astype(jnp.float32)
        args = (jp, jq, jr, jt, lzq, lzr, jnp.asarray(sub), zqr_sub, nex,
                tuple(self.d_gamma),
                tuple(self.d_EIGN), tuple(self.d_EI), tuple(self.d_EV))
        if self.is_psr:
            # per-site rates feed the PSR fused kernels' per-op column
            # scales (live engine state: must be a traced operand)
            args += (tuple(self._gsr(g) for g in range(self.n_groups)),)
        return args

    def _count(self, kind: str, n: int = 1):
        kind = self.op_context + kind
        self.op_stats[kind] = self.op_stats.get(kind, 0) + n

    def _time(self, kind: str, dt: float):
        kind = 'sync:' + self.op_context + kind
        self.op_time[kind] = self.op_time.get(kind, 0.0) + dt

    def _run_traversal_fused(self, entries, exec_mask, interpret,
                             sub_mask=None, zqr_sub=None) -> bool:
        """Fused whole-traversal dispatch for ALL partitions in one jitted
        program (one device round trip). Returns False when the VMEM
        working set does not fit (caller falls back to level kernels).
        PSR runs the same program with per-site-rate column scales
        (round 5; previously level-path only)."""
        packed = self._pack_fused(entries)
        fn = self._pallas_program('trav', packed)
        if fn is None:
            return False
        # np.array (copy): the caller may mutate its mask after this
        # async dispatch and jax CPU can alias host numpy zero-copy
        ex = (np.ones(self.n_models, dtype=bool) if exec_mask is None
              else np.array(exec_mask, dtype=bool))
        clvs, scalers = fn(tuple(self.clv), tuple(self.scaler),
                           jnp.asarray(ex),
                           *self._trav_args(packed, sub_mask, zqr_sub))
        self.clv = list(clvs)
        self.scaler = list(scalers)
        return True

    def _run_traversal_pallas(self, entries, exec_mask):
        """Level-batched traversal through the fused Pallas newview kernel
        (one in-place gather/compute/scatter pass per level per
        partition). Level node counts are padded to powers of two (dummy
        updates land in the scratch row) to bound the number of compiled
        programs."""
        _PK = self.PK  # make_p_batch, newview_level_pallas, newview_level_pallas_psr
        from .traversal import chunk_entries
        tr = self.tree
        interpret = jax.default_backend() == 'cpu'
        if self._run_traversal_fused(entries, exec_mask, interpret):
            return
        # fixed chunk size => one compiled kernel shape for every traversal
        chunk = 16 if len(entries) > 4 else 4
        levels = chunk_entries(tr, entries, chunk)
        fn = self._jit_cache.get('pallas_nv')
        if fn is None:
            if self.is_psr:
                def level_update(clv, scaler, jp, jq, jr, jt, zq, zr,
                                 site_rates, eign, ei, ev, *, block_w,
                                 min_scale, inv_min_scale, interpret):
                    lamq = eign[0][None, :] * K.log_z(zq)[:, None]
                    lamr = eign[0][None, :] * K.log_z(zr)[:, None]
                    return _PK.newview_level_pallas_psr(
                        clv, scaler, jp, jq, jr, jt,
                        lamq.astype(jnp.float32),
                        lamr.astype(jnp.float32), ei[0], ev[0], site_rates,
                        block_w=block_w, min_scale=min_scale,
                        inv_min_scale=inv_min_scale, interpret=interpret)
            else:
                _PK = self.PK  # blockdiag

                def level_update(clv, scaler, jp, jq, jr, jt, zq, zr,
                                 gamma, eign, ei, ev, *, block_w, min_scale,
                                 inv_min_scale, interpret):
                    pls, prs = _PK.make_p_batch(zq, zr, gamma, eign, ei)
                    return _PK.newview_level_pallas(
                        clv, scaler, jp, jq, jr, jt, pls, prs,
                        _PK.blockdiag(ev),
                        block_w=block_w, min_scale=min_scale,
                        inv_min_scale=inv_min_scale, interpret=interpret)

            fn = jax.jit(level_update,
                         static_argnames=('block_w', 'min_scale',
                                          'inv_min_scale', 'interpret'),
                         donate_argnums=(0, 1))
            self._jit_cache['pallas_nv'] = fn

        sfn = None
        for lv in levels:
            qz = lv.qz
            rz = lv.rz
            jp = jnp.asarray(lv.p_idx)
            jq = jnp.asarray(lv.q_idx)
            jr = jnp.asarray(lv.r_idx)
            jt = jnp.asarray(lv.tip_tip.astype(np.int32))
            for g, ms in enumerate(self.groups):
                if (exec_mask is not None
                        and not any(exec_mask[m] for m in ms)):
                    continue
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    zq = jnp.asarray(qz[:, col], dtype=self.dtype)
                    zr = jnp.asarray(rz[:, col], dtype=self.dtype)
                    third = (self.d_site_rates[m] if self.is_psr
                             else self.d_gamma[m])
                    self.clv[g], self.scaler[g] = fn(
                        self.clv[g], self.scaler[g], jp, jq, jr, jt, zq,
                        zr, third, self.d_EIGN[m], self.d_EI[m],
                        self.d_EV[m], block_w=self._block_wk(self.widths[m], m),
                        min_scale=self.min_scale,
                        inv_min_scale=self.inv_min_scale,
                        interpret=interpret)
                    continue
                if self.is_psr:
                    # stacked PSR group: lamq/lamr per (member, node)
                    pfn = self._jit_cache.get('pallas_nv_stacked_psr')
                    if pfn is None:
                        _PK = self.PK  # newview_level_stacked_psr
                        pfn = jax.jit(_PK.newview_level_stacked_psr,
                                      donate_argnums=(0, 1),
                                      static_argnames=(
                                          'block_w', 'min_scale',
                                          'inv_min_scale', 'interpret'))
                        self._jit_cache['pallas_nv_stacked_psr'] = pfn
                        pfn = self._jit_cache['pallas_nv_stacked_psr']
                    lamqs, lamrs = [], []
                    for m in ms:
                        col = self._branch_col(m)
                        zqd = jnp.asarray(qz[:, col], dtype=self.dtype)
                        zrd = jnp.asarray(rz[:, col], dtype=self.dtype)
                        eig = self.d_EIGN[m][0]
                        lamqs.append((eig[None, :]
                                      * K.log_z(zqd)[:, None]).astype(
                                          jnp.float32))
                        lamrs.append((eig[None, :]
                                      * K.log_z(zrd)[:, None]).astype(
                                          jnp.float32))
                    ex_g = (np.ones(len(ms), dtype=bool)
                            if exec_mask is None
                            else np.array([bool(exec_mask[m])
                                           for m in ms]))
                    self.clv[g], self.scaler[g] = pfn(
                        self.clv[g], self.scaler[g], jp, jq, jr, jt,
                        jnp.stack(lamqs), jnp.stack(lamrs),
                        jnp.stack([self.d_EI[m][0].astype(jnp.float32)
                                   for m in ms]),
                        jnp.stack([self.d_EV[m][0].astype(jnp.float32)
                                   for m in ms]),
                        self._gsr(g).astype(jnp.float32),
                        jnp.asarray(ex_g, jnp.int32),
                        block_w=self._block_wg(g),
                        min_scale=self.min_scale,
                        inv_min_scale=self.inv_min_scale,
                        interpret=interpret)
                    continue
                # stacked group (GAMMA): one kernel for the whole group;
                # a partial execute-mask preserves stale members
                # IN-KERNEL (masked p-slices copy their old destination
                # rows through), so the buffers update in place
                if sfn is None:
                    sfn = self._jit_cache.get('pallas_nv_stacked')
                if sfn is None:
                    _PK = self.PK  # newview_level_stacked

                    def level_update_stacked(clv, scaler, jp, jq, jr, jt,
                                             pls, prs, evb, ex, *,
                                             block_w, min_scale,
                                             inv_min_scale, shard_member,
                                             interpret):
                        return _PK.newview_level_stacked(
                            clv, scaler, jp, jq, jr, jt, pls, prs, evb,
                            ex, block_w=block_w, min_scale=min_scale,
                            inv_min_scale=inv_min_scale,
                            shard_member=shard_member,
                            interpret=interpret)

                    sfn = jax.jit(level_update_stacked,
                                  donate_argnums=(0, 1),
                                  static_argnames=('block_w', 'min_scale',
                                                   'inv_min_scale',
                                                   'shard_member',
                                                   'interpret'))
                    self._jit_cache['pallas_nv_stacked'] = sfn
                    sfn = self._jit_cache['pallas_nv_stacked']
                _PK = self.PK  # blockdiag, make_p_batch
                pls, prs, evb = [], [], []
                for m in ms:
                    col = self._branch_col(m)
                    pl_m, pr_m = _PK.make_p_batch(
                        jnp.asarray(qz[:, col], dtype=self.dtype),
                        jnp.asarray(rz[:, col], dtype=self.dtype),
                        self.d_gamma[m], self.d_EIGN[m], self.d_EI[m])
                    pls.append(pl_m.astype(jnp.float32))
                    prs.append(pr_m.astype(jnp.float32))
                    evb.append(_PK.blockdiag(
                        self.d_EV[m]).astype(jnp.float32))
                ex_g = (np.ones(len(ms), dtype=bool) if exec_mask is None
                        else np.array([bool(exec_mask[m]) for m in ms]))
                self.clv[g], self.scaler[g] = sfn(
                    self.clv[g], self.scaler[g], jp, jq, jr, jt,
                    jnp.stack(pls), jnp.stack(prs), jnp.stack(evb),
                    jnp.asarray(ex_g, jnp.int32),
                    block_w=self._block_wg(g),
                    min_scale=self.min_scale,
                    inv_min_scale=self.inv_min_scale,
                    shard_member=self.g_member_sharded[g],
                    interpret=interpret)

    def _run_traversal(self, entries: List[TraversalEntry],
                       exec_mask: Optional[np.ndarray] = None,
                       sub_mask=None, zqr_sub=None):
        if not entries:
            return
        if sub_mask is not None and any(sub_mask):
            # device branch substitution exists only on the fused path
            interpret = jax.default_backend() == 'cpu'
            if not self._run_traversal_fused(entries, exec_mask, interpret,
                                             sub_mask, zqr_sub):
                raise RuntimeError('branch substitution requires the fused '
                                   'traversal program (VMEM plan failed)')
            return
        if self.use_pallas:
            self._run_traversal_pallas(entries, exec_mask)
            return
        packed = pack_traversal(self.tree, entries)
        if exec_mask is None:
            exec_mask = np.ones(self.n_models, dtype=bool)
        else:
            # copy: callers mutate their masks after this async dispatch
            exec_mask = np.array(exec_mask, dtype=bool)
        fn = self._get_jit('traversal', packed.p_idx.shape[0])
        clvs, scalers = fn(
            tuple(self.clv), tuple(self.scaler),
            tuple(self.d_EIGN), tuple(self.d_EI), tuple(self.d_EV),
            tuple(self.d_gamma), tuple(self.wgts),
            tuple(self.d_psr_rates), tuple(self.d_rate_cat),
            jnp.asarray(packed.p_idx), jnp.asarray(packed.q_idx),
            jnp.asarray(packed.r_idx), jnp.asarray(packed.tip_tip),
            jnp.asarray(packed.qz, dtype=self.dtype),
            jnp.asarray(packed.rz, dtype=self.dtype),
            jnp.asarray(exec_mask))
        self.clv = list(clvs)
        self.scaler = list(scalers)

    def copy_rows(self, src_rows, dst_rows):
        """Copy CLV + scale-counter rows src->dst across every partition
        group in ONE dispatch. This is the commit step of the stale-exact
        batched SPR walk: after the candidate replay determines which
        insertions the sequential walk would actually have tested, only
        THEIR CLV recomputes move from the scratch versions to the main
        rows — leaving exactly the persistent buffer state the reference's
        walk leaves behind (its partial traversals trust these rows across
        prune positions, newviewGenericSpecial.c:691-813)."""
        n = len(src_rows)
        if n == 0:
            return
        L = 1
        while L < n:
            L *= 2
        src = np.zeros(L, dtype=np.int32)
        dst = np.zeros(L, dtype=np.int32)
        src[:n] = src_rows
        dst[:n] = dst_rows
        fn = self._jit_cache.get('copy_rows')
        if fn is None:
            def run(clvs, scalers, jsrc, jdst):
                # one row at a time: a fancy-indexed gather+scatter
                # materializes an [P, L, K, W] temp — 8.7 GB at the
                # 512-taxon whole-genome config (measured HBM OOM);
                # dynamic slices keep the temp at one row and update the
                # donated buffers in place
                out_c, out_s = list(clvs), list(scalers)
                L = jsrc.shape[0]
                for g, ms in enumerate(self.groups):
                    row_ax = 1 if len(ms) > 1 else 0

                    def body(i, arrs, ax=row_ax):
                        c, s = arrs
                        cb = jax.lax.dynamic_slice_in_dim(
                            c, jsrc[i], 1, axis=ax)
                        sb = jax.lax.dynamic_slice_in_dim(
                            s, jsrc[i], 1, axis=ax)
                        c = jax.lax.dynamic_update_slice_in_dim(
                            c, cb, jdst[i], axis=ax)
                        s = jax.lax.dynamic_update_slice_in_dim(
                            s, sb, jdst[i], axis=ax)
                        return (c, s)

                    out_c[g], out_s[g] = jax.lax.fori_loop(
                        0, L, body, (clvs[g], scalers[g]))
                return tuple(out_c), tuple(out_s)
            fn = jax.jit(run, donate_argnums=(0, 1))
            self._jit_cache['copy_rows'] = fn
        clvs, scalers = fn(tuple(self.clv), tuple(self.scaler),
                           jnp.asarray(src), jnp.asarray(dst))
        self.clv = list(clvs)
        self.scaler = list(scalers)

    def _dense_only(self, what: str):
        if self.compact:
            raise RuntimeError(
                f'{what} is not supported under induced-subtree '
                f'compaction (-S): the compacted row spaces carry no '
                f'global-node rows. Supported: full-tree evaluation '
                f'(evaluate(full_traversal_=True) / -f e without branch '
                f'smoothing). Run without -S for search/NR paths.')

    def newview(self, p: Node, masked: bool = False):
        """Recompute the CLV at p (reference newviewGeneric :1523)."""
        self._dense_only('partial CLV recomputation (newview)')
        if self.tree.is_tip(p.number):
            return
        entries = partial_traversal(self.tree, p)
        exec_mask = None
        if masked:
            exec_mask = ~self._converged_mask()
        self._run_traversal(entries, exec_mask)

    def _converged_mask(self):
        if self.num_branches > 1:
            return self.partition_converged.copy()
        return np.full(self.n_models, self.partition_converged[0])

    def evaluate(self, p: Node, full_traversal_: bool = False) -> float:
        """Log likelihood at branch (p, p.back)
        (reference evaluateGeneric :897)."""
        if self.compact:
            if not full_traversal_:
                raise RuntimeError(
                    'induced-subtree compaction (-S) supports full-tree '
                    'evaluation only; partial traversals need the dense '
                    'layout')
            return self._evaluate_compact()
        tr = self.tree
        q = p.back
        qz = np.array(q.z, dtype=np.float64)

        entries: List[TraversalEntry] = []
        if full_traversal_:
            assert tr.is_tip(p.number)
            entries = full_traversal(tr, q)
        else:
            if not p.x:
                entries += partial_traversal(tr, p)
            if not q.x:
                entries += partial_traversal(tr, q)
        # masked partitions keep their stale CLVs (evaluateChange
        # semantics, optimizeModel.c:464-534)
        mask = (None if self.execute_model.all()
                else self.execute_model.copy())

        if self.use_pallas:
            # single-dispatch path: traversal + all partitions' root lnL
            # in one jitted program
            packed = self._pack_fused(entries)
            fn = self._pallas_program('trav_eval', packed)
            if fn is not None:
                ex = (np.ones(self.n_models, dtype=bool) if mask is None
                      else np.asarray(mask, dtype=bool))
                clvs, scalers, lhs = fn(
                    tuple(self.clv), tuple(self.scaler), jnp.asarray(ex),
                    *self._trav_args(packed),
                    tuple(self.d_rate_weights), tuple(self.g_wgt),
                    jnp.asarray([p.number], dtype=jnp.int32),
                    jnp.asarray([q.number], dtype=jnp.int32),
                    jnp.asarray(qz, dtype=self.dtype))
                self.clv = list(clvs)
                self.scaler = list(scalers)
                self._count('evaluate')
                t0 = time.perf_counter()
                lhs = np.asarray(lhs, dtype=np.float64)
                self._time('evaluate', time.perf_counter() - t0)
                lhs = np.where(self.execute_model, lhs,
                               self.per_partition_lh)
                self.per_partition_lh = lhs
                self.likelihood = float(lhs.sum())
                return self.likelihood

        self._run_traversal(entries, mask)

        if self.use_pallas:
            lhs = self._evaluate_pallas(p.number, q.number, qz)
        else:
            fn = self._get_jit('evaluate', 0)
            lhs = fn(tuple(self.clv), tuple(self.scaler), tuple(self.d_EIGN),
                     tuple(self.d_gamma), tuple(self.d_rate_weights),
                     tuple(self.wgts), tuple(self.d_site_rates),
                     p.number, q.number,
                     jnp.asarray(qz, dtype=self.dtype))
        self._count('evaluate')
        t0 = time.perf_counter()
        lhs = np.asarray(lhs, dtype=np.float64)
        self._time('evaluate', time.perf_counter() - t0)
        # per-partition execute mask: keep stored values for masked entries
        lhs = np.where(self.execute_model, lhs, self.per_partition_lh)
        self.per_partition_lh = lhs
        self.likelihood = float(lhs.sum())
        return self.likelihood

    def _evaluate_pallas(self, p_row, q_row, qz):
        _PK = self.PK  # evaluate_pallas, evaluate_pallas_psr
        interpret = jax.default_backend() == 'cpu'
        fn = self._jit_cache.get('pallas_eval')
        if fn is None:
            fn = jax.jit(_PK.evaluate_pallas_psr if self.is_psr
                         else _PK.evaluate_pallas,
                         static_argnames=('block_w', 'log_min_scale',
                                          'interpret'))
            self._jit_cache['pallas_eval'] = fn
        jp = jnp.asarray([p_row], dtype=jnp.int32)
        jq = jnp.asarray([q_row], dtype=jnp.int32)
        if self.is_psr:
            _PK = self.PK  # evaluate_stacked_psr
            outs = []
            for g, ms in enumerate(self.groups):
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    lz = math.log(max(qz[col], C.ZMIN))
                    lam = (self.d_EIGN[m][0] * lz)[None, :]
                    outs.append(fn(
                        self.clv[g], self.scaler[g], jp, jq,
                        lam.astype(jnp.float32),
                        self.g_wgt[g].astype(jnp.float32),
                        self._gsr(g).astype(jnp.float32),
                        block_w=self._block_wg(g),
                        log_min_scale=self.log_min_scale,
                        interpret=interpret))
                    continue
                pfn = self._jit_cache.get('pallas_eval_stacked_psr')
                if pfn is None:
                    pfn = jax.jit(_PK.evaluate_stacked_psr,
                                  static_argnames=('block_w',
                                                   'log_min_scale',
                                                   'interpret'))
                    self._jit_cache['pallas_eval_stacked_psr'] = pfn
                    pfn = self._jit_cache['pallas_eval_stacked_psr']
                lams = jnp.stack([
                    (self.d_EIGN[m][0]
                     * math.log(max(qz[self._branch_col(m)], C.ZMIN))
                     ).astype(jnp.float32) for m in ms])
                outs.append(pfn(
                    self.clv[g], self.scaler[g], jp, jq, lams,
                    self.g_wgt[g].astype(jnp.float32),
                    self._gsr(g).astype(jnp.float32),
                    block_w=self._block_wg(g),
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
            return np.array([float(np.asarray(o)) for o in
                             self._unstack([np.asarray(o)
                                            for o in outs])])
        _PK = self.PK  # evaluate_stacked, fold_lam, fold_rw
        outs = []
        for g, ms in enumerate(self.groups):
            dws = []
            for m in ms:
                col = self._branch_col(m)
                lz = math.log(max(qz[col], C.ZMIN))
                lam = _PK.fold_lam(self.d_EIGN[m], self.d_gamma[m])
                dws.append((_PK.fold_rw(self.d_rate_weights[m],
                                    self.d_EIGN[m].shape[1])
                            * jnp.exp(lam * lz))[None, :].astype(
                                jnp.float32))
            if len(ms) == 1:
                outs.append(fn(self.clv[g], self.scaler[g], jp, jq,
                               dws[0], self.g_wgt[g].astype(jnp.float32),
                               block_w=self._block_wg(g),
                               log_min_scale=self.log_min_scale,
                               interpret=interpret))
            else:
                sfn = self._jit_cache.get('pallas_eval_stacked')
                if sfn is None:
                    sfn = jax.jit(_PK.evaluate_stacked,
                                  static_argnames=('block_w',
                                                   'log_min_scale',
                                                   'shard_member',
                                                   'interpret'))
                    self._jit_cache['pallas_eval_stacked'] = sfn
                    sfn = self._jit_cache['pallas_eval_stacked']
                outs.append(sfn(self.clv[g], self.scaler[g], jp, jq,
                                jnp.stack(dws),
                                self.g_wgt[g].astype(jnp.float32),
                                block_w=self._block_wg(g),
                                log_min_scale=self.log_min_scale,
                                shard_member=self.g_member_sharded[g],
                                interpret=interpret))
        return np.array([float(np.asarray(o)) for o in
                         self._unstack([np.asarray(o) for o in outs])])

    # ------------------------------------------------------------------
    # Induced-subtree compaction (-S successor, docs/SEV.md,
    # examl_tpu/compact.py): full evaluate over per-partition induced
    # traversals in per-partition local row spaces.

    def _compact_bw(self, g: int) -> int:
        """Per-group fused block width under the compact row count:
        positive = VMEM-resident variant, negative = HBM variant (same
        planning rule as _fused_plan_rows with the group's own rows)."""
        budget = 12 * 2 ** 20
        m = self.groups[g][0]
        K = self.n_cats * self._padded_states(m)
        rows_g = self.g_rows[g]
        for cand in (1024, 512, 256, 128):
            if cand > self.g_width[g] or self.g_width[g] % cand:
                continue
            if rows_g * (K + 1) * cand * 4 * 2 + 4 * K * cand * 4 <= budget:
                return cand
        for cand in (self.g_width[g], 4096, 2048, 1024, 512, 256, 128):
            if (cand > self.g_width[g] or self.g_width[g] % cand
                    or cand % 128):
                continue
            if rows_g * cand * 4 + 3 * K * cand * 4 <= budget:
                return -cand
        raise MemoryError(f'no VMEM plan for compacted partition {m}')

    def _build_compact_program(self, slots, nex):
        """One jitted program: every compacted partition's induced
        traversal (fused resident/HBM kernel in its own row space) + its
        root lnL. slots/nex: per-group descriptor length / live op count
        (static: a full induced traversal always has present(p)-2 ops)."""
        _PK = self.PK  # traversal_fused_pallas, traversal_fused_hbm, evaluate_pallas, fold_lam, fold_rw, blockdiag
        interpret = jax.default_backend() == 'cpu'
        plan = [self._compact_bw(g) for g in range(self.n_groups)]

        def run(clvs, scalers, jps, jqs, jrs, jts, lzqs, lzrs,
                gammas, eigns, eis, evs, rate_weights, gwgts,
                p_rows, q_rows, lzroots):
            out_c = list(clvs)
            out_s = list(scalers)
            lhs = []
            for g, ms in enumerate(self.groups):
                m = ms[0]
                lam = _PK.fold_lam(eigns[m],
                                   gammas[m]).astype(jnp.float32)
                ei_bd = _PK.blockdiag(eis[m]).astype(jnp.float32)
                ev_bd = _PK.blockdiag(evs[m]).astype(jnp.float32)
                bw = plan[g]
                if bw < 0:
                    c2, s2 = _PK.traversal_fused_hbm(
                        out_c[g], out_s[g], jps[g], jqs[g], jrs[g],
                        jts[g], lzqs[g], lzrs[g], lam[None, :], ei_bd,
                        ev_bd, n_exec=nex[g], block_w=-bw, group=1,
                        min_scale=self.min_scale,
                        inv_min_scale=self.inv_min_scale,
                        interpret=interpret)
                else:
                    c2, s2 = _PK.traversal_fused_pallas(
                        out_c[g], out_s[g], jps[g], jqs[g], jrs[g],
                        jts[g], lzqs[g], lzrs[g], lam[None, :], ei_bd,
                        ev_bd, n_exec=nex[g], n_rows=self.g_rows[g],
                        block_w=bw, min_scale=self.min_scale,
                        inv_min_scale=self.inv_min_scale,
                        interpret=interpret)
                out_c[g] = c2
                out_s[g] = s2
                dw = (_PK.fold_rw(rate_weights[m], eigns[m].shape[1])
                      * jnp.exp(lam * lzroots[m]))[None, :].astype(
                          jnp.float32)
                lhs.append(_PK.evaluate_pallas(
                    c2, s2, p_rows[g], q_rows[g], dw,
                    gwgts[g].astype(jnp.float32),
                    block_w=self._block_wg(g),
                    log_min_scale=self.log_min_scale,
                    interpret=interpret))
            return tuple(out_c), tuple(out_s), jnp.stack(lhs)

        return jax.jit(run, donate_argnums=(0, 1))

    def _evaluate_compact(self) -> float:
        from .compact import pack_local, slot_bucket
        tr = self.tree
        jps, jqs, jrs, jts, lzqs, lzrs = [], [], [], [], [], []
        p_rows, q_rows = [], []
        lzroot = np.zeros(self.n_models)
        slots_l, nex_l = [], []
        for g, ms in enumerate(self.groups):
            m = ms[0]
            it = self.compact_plan.build_full(tr, m)
            slots = slot_bucket(max(1, len(it.entries)))
            p_i, q_i, r_i, tt, qz, rz, n = pack_local(
                it.entries, slots, self.compact_plan.dummy_row(m),
                self.num_branches)
            col = self._branch_col(m)
            jps.append(jnp.asarray(p_i))
            jqs.append(jnp.asarray(q_i))
            jrs.append(jnp.asarray(r_i))
            jts.append(jnp.asarray(tt.astype(np.int32)))
            lzqs.append(jnp.asarray(
                np.log(np.maximum(qz[:, col], C.ZMIN)), jnp.float32))
            lzrs.append(jnp.asarray(
                np.log(np.maximum(rz[:, col], C.ZMIN)), jnp.float32))
            p_rows.append(jnp.asarray([it.root.p_row], jnp.int32))
            q_rows.append(jnp.asarray([it.root.q_row], jnp.int32))
            lzroot[m] = math.log(max(it.root.z[col], C.ZMIN))
            slots_l.append(slots)
            nex_l.append(n)
        key = ('compactprog', tuple(slots_l), tuple(nex_l))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = self._build_compact_program(tuple(slots_l), tuple(nex_l))
            self._jit_cache[key] = fn
        clvs, scalers, lhs = fn(
            tuple(self.clv), tuple(self.scaler), tuple(jps), tuple(jqs),
            tuple(jrs), tuple(jts), tuple(lzqs), tuple(lzrs),
            tuple(self.d_gamma), tuple(self.d_EIGN), tuple(self.d_EI),
            tuple(self.d_EV), tuple(self.d_rate_weights),
            tuple(self.g_wgt),
            tuple(p_rows), tuple(q_rows),
            jnp.asarray(lzroot, jnp.float32))
        self.clv = list(clvs)
        self.scaler = list(scalers)
        self._count('evaluate')
        t0 = time.perf_counter()
        lhs = np.asarray(lhs, dtype=np.float64)
        self._time('evaluate', time.perf_counter() - t0)
        lhs = np.where(self.execute_model, lhs, self.per_partition_lh)
        self.per_partition_lh = lhs
        self.likelihood = float(lhs.sum())
        return self.likelihood

    def _nr_pallas(self, p_row, q_row, core_lz):
        _PK = self.PK  # nr_derivatives_pallas, nr_derivatives_pallas_psr
        interpret = jax.default_backend() == 'cpu'
        fn = self._jit_cache.get('pallas_nrd')
        if fn is None:
            statics = (('block_w', 'interpret') if self.is_psr
                       else ('block_w', 'log_min_scale', 'interpret'))
            fn = jax.jit(_PK.nr_derivatives_pallas_psr if self.is_psr
                         else _PK.nr_derivatives_pallas,
                         static_argnames=statics)
            self._jit_cache['pallas_nrd'] = fn
        jp = jnp.asarray([p_row], dtype=jnp.int32)
        jq = jnp.asarray([q_row], dtype=jnp.int32)
        # only reachable on PSR/singleton layouts (the GAMMA accelerator
        # path optimizes branches through _makenewz_dispatch instead)
        assert all(len(ms) == 1 for ms in self.groups)
        d1s = np.zeros(self.n_models)
        d2s = np.zeros(self.n_models)
        for m in range(self.n_models):
            col = self._branch_col(m)
            if self.is_psr:
                d1, d2 = fn(self.clv[m], self.scaler[m], jp, jq,
                            self.d_EIGN[m][0][None, :].astype(jnp.float32),
                            self.wgts[m].astype(jnp.float32),
                            self.d_site_rates[m].astype(jnp.float32),
                            jnp.asarray([core_lz[col]], dtype=jnp.float32),
                            block_w=self._block_wk(self.widths[m], m),
                            interpret=interpret)
            else:
                _PK = self.PK  # fold_lam, fold_rw
                lam = _PK.fold_lam(self.d_EIGN[m], self.d_gamma[m])
                d = (_PK.fold_rw(self.d_rate_weights[m],
                             self.d_EIGN[m].shape[1])
                     * jnp.exp(lam * core_lz[col])).astype(jnp.float32)
                d1, d2 = fn(self.clv[m], self.scaler[m], jp, jq,
                            lam[None, :].astype(jnp.float32), d[None, :],
                            self.wgts[m].astype(jnp.float32),
                            block_w=self._block_wk(self.widths[m], m),
                            log_min_scale=self.log_min_scale,
                            interpret=interpret)
            d1s[m] = float(d1)
            d2s[m] = float(d2)
        return d1s, d2s

    # ------------------------------------------------------------------
    # batched thorough-insertion scoring (accelerator path): ALL thorough
    # SPR candidates of one pruned subtree run their complete insertBIG +
    # localSmooth + evaluate pipeline (searchAlgo.c:484-566, 127-200) in
    # ONE device dispatch — a vectorized Newton-Raphson state machine over
    # candidates with per-round junction CLV rebuilds in scratch rows

    def _wave_model(self):
        """The device model tuple consumed by the wave programs; the
        trailing per-group site-rate tuple feeds the PSR kernels (empty
        under GAMMA — the programs never index it there)."""
        srs = (tuple(self._gsr(g) for g in range(self.n_groups))
               if self.is_psr else ())
        return (tuple(self.d_gamma), tuple(self.d_EIGN),
                tuple(self.d_EI), tuple(self.d_EV),
                tuple(self.d_rate_weights), tuple(self.g_wgt), srs)

    def _make_wave_ops(self, interpret):
        """(batch_nr, junctions): the vectorized branch-NR state machine
        and the batched junction-CLV builder shared by the thorough-
        insertion and quartet wave programs."""
        M = self.n_models
        B = self.num_branches

        def batch_nr(clvs, scalers, model, jp, jq, z0, maxiter, frozen):
            """topLevelMakenewz vectorized over N branches (rows jp/jq);
            z0 [N] (linked branches) or [N, B] (per-partition classes,
            the reference's numBranches > 1 NR lanes); frozen lanes keep
            z0."""
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            vec = z0.ndim == 2
            z0m = z0 if vec else z0[:, None]

            def derivs(core_lz):                   # [N, B']
                d1m, d2m = self._g_nr_derivs_batch(
                    clvs, scalers, gammas, eigns, rate_weights, gwgts,
                    jp, jq, core_lz, interpret, srs=srs)
                if B == 1:
                    return (jnp.sum(d1m, axis=0)[:, None],
                            jnp.sum(d2m, axis=0)[:, None])
                # per-partition branch classes: class of model m is m
                # (engine asserts num_branches == n_models)
                return d1m.T, d2m.T

            N = z0m.shape[0]
            frozen2 = jnp.broadcast_to(frozen[:, None], z0m.shape)

            def cond(st):
                return ~jnp.all(st[4])

            def body(st):
                z, zprev, zstep, maxi, outer, curvat = st
                fresh = ~outer & curvat
                zprev = jnp.where(fresh, z, zprev)
                zstep = jnp.where(fresh, (1.0 - C.ZMAX) * z + C.ZMIN,
                                  zstep)
                curvat = curvat & ~fresh
                active = ~outer & ~curvat
                zc = jnp.clip(z, C.ZMIN, C.ZMAX)
                z = jnp.where(active, zc, z)
                core_lz = jnp.log(jnp.clip(z, C.ZMIN, C.ZMAX)).astype(
                    jnp.float32)
                d1, d2 = derivs(core_lz)
                shorten = active & (d2 >= 0.0) & (z < C.ZMAX)
                zshort = 0.37 * z + 0.63
                z = jnp.where(shorten, zshort, z)
                zprev = jnp.where(shorten, zshort, zprev)
                curvat = curvat | (active & ~shorten)
                do_nr = active & ~shorten
                tantmp = -d1 / d2
                small = tantmp < 100.0
                zexp = jnp.maximum(z * jnp.exp(tantmp), C.ZMIN)
                cap = 0.25 * zprev + 0.75
                zexp = jnp.minimum(zexp, cap)
                znr = jnp.where((d2 < 0.0) & small, zexp,
                                jnp.where(d2 < 0.0, cap, z))
                znr = jnp.minimum(znr, C.ZMAX)
                z = jnp.where(do_nr, znr, z)
                maxi = jnp.where(do_nr, maxi - 1, maxi)
                moved = jnp.abs(z - zprev) > zstep
                give_up = do_nr & moved & (maxi < -20)
                z = jnp.where(give_up, z0m, z)
                outer = jnp.where(do_nr,
                                  jnp.where(moved, give_up, True), outer)
                return (z, zprev, zstep, maxi, outer, curvat)

            st = (z0m, z0m, jnp.zeros_like(z0m),
                  jnp.full(z0m.shape, maxiter, jnp.int32), frozen2,
                  jnp.ones(z0m.shape, bool))
            zf = jax.lax.while_loop(cond, body, st)[0]
            return zf if vec else zf[:, 0]

        def junctions(clvs, scalers, model, j_rows, a_rows, b_rows, za, zb,
                      tt):
            """N junction CLVs: scratch row j_i = combine(a_i via za_i,
            b_i via zb_i)."""
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            return self._g_junctions(clvs, scalers, gammas, eigns, eis,
                                     evs, j_rows, a_rows, b_rows, za, zb,
                                     tt, interpret, srs=srs)

        return batch_nr, junctions

    def _build_quartet_program(self):
        """N quartet topologies per dispatch: each lane hooks four tip
        rows to two per-lane scratch junction rows, runs the nniSmooth
        five-branch loop (quartets.c:170) with the vectorized NR state
        machine, and evaluates — the whole -f q inner loop in ONE device
        program instead of ~30 host syncs per topology."""
        M = self.n_models
        interpret = jax.default_backend() == 'cpu'
        batch_nr, junctions = self._make_wave_ops(interpret)

        def run(clvs, scalers, model, t1, t2, t3, t4, ja, jb, tt12, tt34,
                pad):
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            N = t1.shape[0]
            z = jnp.full((N, 5), C.DEFAULTZ, jnp.float32)
            tt0 = jnp.zeros(N, jnp.int32)

            def passes(carry):
                k, clvs, scalers, z, smoothed = carry
                frozen = pad | smoothed
                # orientations mirror nniSmooth's update_branch sequence:
                # (j1-j2), (j1-t1), (j1-t2), (j2-t3), (j2-t4)
                clvs, scalers = junctions(clvs, scalers, model, ja, t1,
                                          t2, z[:, 0], z[:, 1], tt12)
                clvs, scalers = junctions(clvs, scalers, model, jb, t3,
                                          t4, z[:, 2], z[:, 3], tt34)
                z5 = batch_nr(clvs, scalers, model, ja, jb, z[:, 4],
                              C.NEWZPERCYCLE, frozen)
                clvs, scalers = junctions(clvs, scalers, model, ja, t2,
                                          jb, z[:, 1], z5, tt0)
                z1 = batch_nr(clvs, scalers, model, ja, t1, z[:, 0],
                              C.NEWZPERCYCLE, frozen)
                clvs, scalers = junctions(clvs, scalers, model, ja, t1,
                                          jb, z1, z5, tt0)
                z2 = batch_nr(clvs, scalers, model, ja, t2, z[:, 1],
                              C.NEWZPERCYCLE, frozen)
                clvs, scalers = junctions(clvs, scalers, model, ja, t1,
                                          t2, z1, z2, tt12)
                clvs, scalers = junctions(clvs, scalers, model, jb, t4,
                                          ja, z[:, 3], z5, tt0)
                z3 = batch_nr(clvs, scalers, model, jb, t3, z[:, 2],
                              C.NEWZPERCYCLE, frozen)
                clvs, scalers = junctions(clvs, scalers, model, jb, t3,
                                          ja, z3, z5, tt0)
                z4 = batch_nr(clvs, scalers, model, jb, t4, z[:, 3],
                              C.NEWZPERCYCLE, frozen)
                zn = jnp.stack([z1, z2, z3, z4, z5], axis=1)
                moved = jnp.any(jnp.abs(zn - z) > C.DELTAZ, axis=1)
                smoothed = smoothed | ~moved
                z = jnp.where(frozen[:, None], z, zn)
                return (k + 1, clvs, scalers, z, smoothed)

            def cond(carry):
                k, _c, _s, _z, smoothed = carry
                return (k < 16) & ~jnp.all(pad | smoothed)

            k, clvs, scalers, z, smoothed = jax.lax.while_loop(
                cond, passes,
                (jnp.asarray(0, jnp.int32), clvs, scalers, z,
                 jnp.zeros(N, bool)))

            # final state: jb = view at j2 away from t4 (the last
            # junction of the pass); evaluate the (j2, t4) branch exactly
            # like the host's evaluate(q1.back.next.next)
            lhs = self._g_evaluate_batch_all(
                clvs, scalers, gammas, eigns, rate_weights, gwgts, jb,
                t4, z[:, 3][:, None], interpret)
            return clvs, scalers, jnp.sum(lhs, axis=0)

        return jax.jit(run, donate_argnums=(0, 1))

    def quartet_wave(self, topologies):
        """Log likelihood of N quartet topologies [(t1, t2, t3, t4), ...]
        (tip numbers; topology ((t1,t2),(t3,t4))) in ONE dispatch + ONE
        fetch. Lanes are padded to power-of-two buckets; each lane owns
        two scratch junction rows."""
        N = len(topologies)
        cap = self.n_scratch // 2
        assert N <= cap
        # power-of-two lane buckets capped at the scratch pool: EVERY
        # lane (padding included) gets its own junction row pair — pad
        # lanes still execute the junction writes, and sharing rows with
        # real lanes would corrupt them mid-loop
        L = 16
        while L < N:
            L *= 2
        L = min(L, cap)
        L = max(L, N)
        tr = self.tree
        t = np.ones((4, L), np.int32)          # pad lanes read tip row 1
        for i, (a, b, c, d) in enumerate(topologies):
            t[0, i], t[1, i], t[2, i], t[3, i] = a, b, c, d
        ja = np.arange(L, dtype=np.int32) * 2 + self.scratch_base
        jb = ja + 1
        pad = np.zeros(L, bool)
        pad[N:] = True
        tt12 = np.zeros(L, np.int32)
        tt34 = np.zeros(L, np.int32)
        for i, (a, b, c, d) in enumerate(topologies):
            tt12[i] = int(tr.is_tip(a) and tr.is_tip(b))
            tt34[i] = int(tr.is_tip(c) and tr.is_tip(d))
        fn = self._jit_cache.get('quartetprog')
        if fn is None:
            fn = self._build_quartet_program()
            self._jit_cache['quartetprog'] = fn
        model = self._wave_model()
        clvs, scalers, lhs = fn(
            tuple(self.clv), tuple(self.scaler), model,
            jnp.asarray(t[0]), jnp.asarray(t[1]), jnp.asarray(t[2]),
            jnp.asarray(t[3]), jnp.asarray(ja), jnp.asarray(jb),
            jnp.asarray(tt12), jnp.asarray(tt34), jnp.asarray(pad))
        self.clv = list(clvs)
        self.scaler = list(scalers)
        (lhs,) = self.fetch([lhs], kind='quartet_wave')
        return lhs[:N]

    def _build_thorough_program(self):
        M = self.n_models
        interpret = jax.default_backend() == 'cpu'
        batch_nr, junctions = self._make_wave_ops(interpret)

        def run(clvs, scalers, model, s_row, u_rows, v_rows, j_rows, z0,
                pad):
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            N = u_rows.shape[0]
            live = pad                         # frozen mask for batch_nr
            s_rows = jnp.broadcast_to(s_row.astype(jnp.int32), (N,))
            tt_uv = jnp.zeros(N, jnp.int32)    # junction rows: never tips
            defaultz = jnp.full(z0.shape, C.DEFAULTZ, z0.dtype)

            # insertBIG thorough: three independent NR optimizations from
            # the pre-insertion state (searchAlgo.c:495-536)
            zqr = batch_nr(clvs, scalers, model, u_rows, v_rows, z0,
                           C.ITERATIONS, live)
            zqs = batch_nr(clvs, scalers, model, u_rows, s_rows, defaultz,
                           C.ITERATIONS, live)
            zrs = batch_nr(clvs, scalers, model, v_rows, s_rows, defaultz,
                           C.ITERATIONS, live)

            lzqr = jnp.log(jnp.maximum(zqr, C.ZMIN))
            lzqs = jnp.log(jnp.maximum(zqs, C.ZMIN))
            lzrs = jnp.log(jnp.maximum(zrs, C.ZMIN))
            lzsum = 0.5 * (lzqr + lzqs + lzrs)
            lzq = lzsum - lzrs
            lzr = lzsum - lzqs
            lzs = lzsum - lzqr
            lzmax = math.log(C.ZMAX)
            cq = lzq > lzmax
            cr = ~cq & (lzr > lzmax)
            cs = ~cq & ~cr & (lzs > lzmax)
            lzq2 = jnp.where(cq, lzmax, jnp.where(cr, lzqr,
                             jnp.where(cs, lzqs, lzq)))
            lzr2 = jnp.where(cq, lzqr, jnp.where(cr, lzmax,
                             jnp.where(cs, lzrs, lzr)))
            lzs2 = jnp.where(cq, lzqs, jnp.where(cr, lzrs,
                             jnp.where(cs, lzmax, lzs)))
            e1 = jnp.exp(lzq2)                 # p.next  <-> u
            e2 = jnp.exp(lzr2)                 # p.next2 <-> v
            e3 = jnp.exp(lzs2)                 # p       <-> s

            # localSmooth rounds (searchAlgo.c localSmooth :270): three
            # branch updates per round, junction rebuilt between them
            def round_body(carry):
                k, clvs, scalers, e1, e2, e3, active = carry
                frozen = ~active
                # branch p<->s: junction toward s = combine(u e1, v e2)
                clvs, scalers = junctions(clvs, scalers, model, j_rows,
                                          u_rows, v_rows, e1, e2, tt_uv)
                e3n = batch_nr(clvs, scalers, model, j_rows, s_rows, e3,
                               C.NEWZPERCYCLE, frozen)
                # branch p.next<->u: junction toward u = (s e3, v e2)
                clvs, scalers = junctions(clvs, scalers, model, j_rows,
                                          s_rows, v_rows, e3n, e2, tt_uv)
                e1n = batch_nr(clvs, scalers, model, j_rows, u_rows, e1,
                               C.NEWZPERCYCLE, frozen)
                # branch p.next2<->v: junction toward v = (s e3, u e1)
                clvs, scalers = junctions(clvs, scalers, model, j_rows,
                                          s_rows, u_rows, e3n, e1n, tt_uv)
                e2n = batch_nr(clvs, scalers, model, j_rows, v_rows, e2,
                               C.NEWZPERCYCLE, frozen)
                moved = ((jnp.abs(e1n - e1) > C.DELTAZ)
                         | (jnp.abs(e2n - e2) > C.DELTAZ)
                         | (jnp.abs(e3n - e3) > C.DELTAZ))
                # allSmoothed over the branch classes (searchAlgo.c:278:
                # the candidate keeps smoothing while ANY class moved)
                active = active & jnp.any(moved, axis=-1)
                return (k + 1, clvs, scalers, e1n, e2n, e3n, active)

            def round_cond(carry):
                k, _c, _s, _1, _2, _3, active = carry
                return (k < C.SMOOTHINGS) & jnp.any(active)

            k, clvs, scalers, e1, e2, e3, active = jax.lax.while_loop(
                round_cond, round_body,
                (jnp.asarray(0, jnp.int32), clvs, scalers, e1, e2, e3,
                 ~pad))

            # final state: junction toward v (last rebuilt orientation in
            # localSmooth is toward v); evaluate at branch (junction, v)
            clvs, scalers = junctions(clvs, scalers, model, j_rows,
                                      s_rows, u_rows, e3, e1, tt_uv)
            if self.is_psr:
                lhs = self._g_evaluate_batch_all_psr(
                    clvs, scalers, eigns, gwgts, srs,
                    j_rows, v_rows, e2, interpret)
            else:
                lhs = self._g_evaluate_batch_all(
                    clvs, scalers, gammas, eigns, rate_weights, gwgts,
                    j_rows, v_rows, e2, interpret)
            # per-partition [M, N] — callers sum over partitions (the
            # fused apply path also needs per_partition_lh)
            import os
            if os.environ.get('EXAML_DEBUG_THOROUGH'):
                return (clvs, scalers, lhs, e1, e2, e3,
                        zqr, zqs, zrs)
            return clvs, scalers, lhs, e1, e2, e3

        return jax.jit(run, donate_argnums=(0, 1))

    def thorough_score_wave_lazy(self, s_row, u_rows, v_rows, j_rows, z0):
        """thorough_score_wave without the host sync: returns device
        handles (scores, e1, e2, e3); entries beyond len(u_rows) are
        shape-bucket padding (frozen lanes writing a spare scratch row)
        the caller must slice away."""
        import os
        dbg = bool(os.environ.get('EXAML_DEBUG_THOROUGH'))
        ck = 'thoroughprog_dbg' if dbg else 'thoroughprog'
        fn = self._jit_cache.get(ck)
        if fn is None:
            fn = self._build_thorough_program()
            self._jit_cache[ck] = fn
        # coarse power-of-two lane buckets: every distinct N would
        # otherwise recompile the whole program (measured 6 s per shape
        # through the remote tunnel, 29 shapes per search); padded lanes
        # start frozen and do no NR work
        N = len(u_rows)
        L = 16
        while L < N:
            L *= 2
        # pad lanes execute the junction writes unconditionally, so their
        # sink row must live OUTSIDE the wave-recorder scratch pool: a
        # truncated (pool-filling) recording legitimately allocates the
        # pool's last row as a real lane's junction, and a pad lane
        # writing the same row corrupts that lane's score (round-5 fix;
        # the dedicated sink rows beyond the pool exist for exactly this)
        spare = self.pad_sink_base
        ju = np.full(L, int(s_row), np.int32)
        ju[:N] = u_rows
        jv = np.full(L, int(s_row), np.int32)
        jv[:N] = v_rows
        jj = np.full(L, spare, np.int32)
        jj[:N] = j_rows
        B = self.num_branches
        z = np.full((L, B), C.DEFAULTZ, np.float32)
        z[:N] = np.reshape(np.asarray(z0, np.float32), (N, B))
        pad = np.zeros(L, bool)
        pad[N:] = True
        model = self._wave_model()
        clvs, scalers, scores, e1, e2, e3, *extra = fn(
            tuple(self.clv), tuple(self.scaler), model,
            jnp.asarray(s_row, dtype=jnp.int32),
            jnp.asarray(ju), jnp.asarray(jv), jnp.asarray(jj),
            jnp.asarray(z), jnp.asarray(pad))
        self.clv = list(clvs)
        self.scaler = list(scalers)
        if extra:
            return (scores, e1, e2, e3) + tuple(extra)
        return scores, e1, e2, e3

    def thorough_score_wave(self, s_row, u_rows, v_rows, j_rows, z0):
        """Scores + fitted junction branch lengths (e1 = junction-u,
        e2 = junction-v, e3 = junction-prunedSubtree) for N thorough SPR
        insertions in one dispatch. Rows index the CLV buffer (v_rows are
        proximal scratch CLVs written beforehand). Returns float64
        (scores, e1 [N, B], e2, e3)."""
        handles = self.thorough_score_wave_lazy(s_row, u_rows, v_rows,
                                                j_rows, z0)
        lhs, e1, e2, e3 = self.fetch(handles, kind='spr_thorough_wave')
        N = len(u_rows)
        return lhs[:, :N].sum(axis=0), e1[:N], e2[:N], e3[:N]

    def apply_thorough(self, p: Node, q: Node):
        """The thorough-insertion APPLY (insertBIG + localSmooth +
        evaluate, searchAlgo.c:495-536 + :270) as ONE dispatch + ONE
        fetch. Called with the tree still pruned (q.back is the junction
        partner r; p dangling with p.back = s). Returns
        (per_partition_lh [M], e1, e2, e3) with e* per-branch-class
        lists [B]; the caller performs the hookups with the fitted
        branch lengths and refreshes p's CLV."""
        tr = self.tree
        r = q.back
        s = p.back
        # the sequential path's makenewz calls refresh stale views first
        # (makenewzGeneric :1355); mirror that
        entries: List[TraversalEntry] = []
        for node in (q, r, s):
            if not tr.is_tip(node.number) and not node.x:
                entries += partial_traversal(tr, node)
        self._run_traversal(entries)
        # the real lane's junction row must NOT be the spare row the
        # shape-bucket padding lanes write (the grid runs lanes in order,
        # so pad lanes would overwrite the junction before localSmooth
        # reads it back) — use the first scratch row instead
        handles = self.thorough_score_wave_lazy(
            s.number, [q.number], [r.number], [self.scratch_base],
            [list(q.z)])
        lhs, e1, e2, e3 = self.fetch(handles, kind='apply_thorough')
        return (lhs[:, 0], [float(v) for v in e1[0]],
                [float(v) for v in e2[0]], [float(v) for v in e3[0]])

    # ------------------------------------------------------------------
    # Newton-Raphson branch-length optimization

    def _build_nr_loop_fn(self):
        """The entire topLevelMakenewz state machine as one on-device
        lax.while_loop around the Pallas derivative kernel — one dispatch
        per branch optimization instead of one per NR iteration (the
        reference pays an MPI allreduce per iteration here,
        makenewzGenericSpecial.c:1241-1248)."""
        _PK = self.PK  # nr_derivatives_pallas, nr_derivatives_pallas_psr
        n_models = self.n_models
        B = self.num_branches
        interpret = jax.default_backend() == 'cpu'

        def derivatives(clvs, scalers, jp, jq, eign, gamma, rate_weights,
                        gwgts, site_rates, core_lz):
            if not self.is_psr:
                return self._g_nr_derivs(clvs, scalers, gamma, eign,
                                         rate_weights, gwgts, jp, jq,
                                         core_lz, interpret)
            _PK = self.PK  # nr_derivatives_stacked_psr
            d1o, d2o = [], []
            for g, ms in enumerate(self.groups):
                if len(ms) == 1:
                    m = ms[0]
                    col = self._branch_col(m)
                    d1, d2 = _PK.nr_derivatives_pallas_psr(
                        clvs[g], scalers[g], jp, jq,
                        eign[m][0][None, :].astype(jnp.float32),
                        gwgts[g].astype(jnp.float32),
                        site_rates[g].astype(jnp.float32),
                        core_lz[col][None].astype(jnp.float32),
                        block_w=self._block_wg(g),
                        interpret=interpret)
                else:
                    cols = jnp.asarray(self._g_cols(ms))
                    d1, d2 = _PK.nr_derivatives_stacked_psr(
                        clvs[g], scalers[g], jp, jq,
                        jnp.stack([eign[m][0].astype(jnp.float32)
                                   for m in ms]),
                        gwgts[g].astype(jnp.float32),
                        site_rates[g].astype(jnp.float32),
                        core_lz[cols].astype(jnp.float32),
                        block_w=self._block_wg(g),
                        interpret=interpret)
                d1o.append(d1)
                d2o.append(d2)
            return (jnp.stack(self._unstack(d1o)),
                    jnp.stack(self._unstack(d2o)))

        def nr_loop(clvs, scalers, jp, jq, eign, gamma, rate_weights, wgts,
                    site_rates, z0, exec_mask, maxiter):
            z = z0
            zprev = z0
            zstep = jnp.zeros(B, z0.dtype)
            maxi = jnp.full(B, maxiter, jnp.int32)
            outer = jnp.zeros(B, bool)
            curvat = jnp.ones(B, bool)

            def cond(state):
                return ~jnp.all(state[4])

            def body(state):
                z, zprev, zstep, maxi, outer, curvat = state
                fresh = ~outer & curvat
                zprev = jnp.where(fresh, z, zprev)
                zstep = jnp.where(fresh,
                                  (1.0 - C.ZMAX) * z + C.ZMIN, zstep)
                curvat = curvat & ~fresh
                active = ~outer & ~curvat
                zc = jnp.clip(z, C.ZMIN, C.ZMAX)
                z = jnp.where(active, zc, z)
                core_lz = jnp.log(jnp.clip(z, C.ZMIN, C.ZMAX))

                d1m, d2m = derivatives(clvs, scalers, jp, jq, eign, gamma,
                                       rate_weights, wgts, site_rates,
                                       core_lz)
                if B == 1:
                    ex = exec_mask.astype(d1m.dtype)
                    d1 = jnp.sum(d1m * ex)[None]
                    d2 = jnp.sum(d2m * ex)[None]
                else:
                    d1 = d1m
                    d2 = d2m

                shorten = active & (d2 >= 0.0) & (z < C.ZMAX)
                zshort = 0.37 * z + 0.63
                z = jnp.where(shorten, zshort, z)
                zprev = jnp.where(shorten, zshort, zprev)
                curvat = curvat | (active & ~shorten)

                do_nr = active & ~shorten
                tantmp = -d1 / d2
                small = tantmp < 100.0
                zexp = z * jnp.exp(tantmp)
                zexp = jnp.maximum(zexp, C.ZMIN)
                cap = 0.25 * zprev + 0.75
                zexp = jnp.minimum(zexp, cap)
                znr = jnp.where((d2 < 0.0) & small, zexp,
                                jnp.where(d2 < 0.0, cap, z))
                znr = jnp.minimum(znr, C.ZMAX)
                z = jnp.where(do_nr, znr, z)
                maxi = jnp.where(do_nr, maxi - 1, maxi)
                moved = jnp.abs(z - zprev) > zstep
                give_up = do_nr & moved & (maxi < -20)
                z = jnp.where(give_up, z0, z)
                outer = jnp.where(do_nr,
                                  jnp.where(moved, give_up, True), outer)
                return (z, zprev, zstep, maxi, outer, curvat)

            state = (z, zprev, zstep, maxi, outer, curvat)
            state = jax.lax.while_loop(cond, body, state)
            return state[0]

        return jax.jit(nr_loop, static_argnames=())


    def _makenewz_dispatch(self, p_row, q_row, z0, maxiter, mask=False):
        """Dispatch the on-device NR while_loop on the CLVs at the given
        buffer ROWS (node rows or scratch versions); returns the optimized
        z as a DEVICE handle [B] (no host sync). Inputs are assumed
        already refreshed (x-flags honored by the caller)."""
        fn = self._jit_cache.get('pallas_nr_loop')
        if fn is None:
            fn = self._build_nr_loop_fn()
            self._jit_cache['pallas_nr_loop'] = fn
        # COPY the mask: jax CPU may alias host numpy buffers zero-copy,
        # and execute_model is mutated right after this dispatch — the
        # async program must not observe that (cost a load-dependent
        # flaky -M race to find)
        ex = (self.execute_model.copy() if mask
              else np.ones(self.n_models, dtype=bool))
        z = fn(tuple(self.clv), tuple(self.scaler),
               jnp.asarray([p_row], dtype=jnp.int32),
               jnp.asarray([q_row], dtype=jnp.int32),
               tuple(self.d_EIGN), tuple(self.d_gamma),
               tuple(self.d_rate_weights), tuple(self.g_wgt),
               tuple(self.g_site_rates),
               jnp.asarray(z0, dtype=self.dtype),
               jnp.asarray(ex), maxiter)
        self.execute_model[:] = True
        return z

    def makenewz_lazy(self, p: Node, q: Node, z0, maxiter: int):
        """makenewz with the optimized z left ON DEVICE: the speculative
        SPR driver feeds it straight into subsequent wave programs
        (branch substitution) and fetches it together with the batch
        scores — zero extra round trips per prune."""
        assert self.use_pallas
        tr = self.tree
        entries: List[TraversalEntry] = []
        if not p.x:
            entries += partial_traversal(tr, p)
        if not q.x:
            entries += partial_traversal(tr, q)
        self._run_traversal(entries)
        return self._makenewz_dispatch(p.number, q.number,
                                       np.array(z0, dtype=np.float64),
                                       maxiter)

    def speculation_supported(self) -> bool:
        """Whether the lazy/speculative SPR path can run: needs the fused
        Pallas traversal program (branch substitution lives there) at the
        full buffer row count."""
        if not self.use_pallas:
            return False
        key = 'spec_ok'
        ok = self._jit_cache.get(key)
        if ok is None:
            # worst-case plan: scratch rows in range -> n_rows = self.rows
            dummy = PackedTraversal(
                count=1,
                p_idx=np.array([self.rows - 1], np.int32),
                q_idx=np.array([1], np.int32),
                r_idx=np.array([2], np.int32),
                tip_tip=np.array([True]),
                qz=np.full((1, self.num_branches), C.DEFAULTZ),
                rz=np.full((1, self.num_branches), C.DEFAULTZ), n_exec=1)
            ok = self._fused_plan(dummy) is not None
            self._jit_cache[key] = ok
        return ok

    def makenewz(self, p: Node, q: Node, z0, maxiter: int,
                 mask: bool = False):
        """Optimize the branch (p, q) starting from z0
        (reference makenewzGeneric :1355 + topLevelMakenewz :1133)."""
        self._dense_only('branch-length optimization (makenewz)')
        tr = self.tree
        B = self.num_branches
        z0 = np.array(z0, dtype=np.float64)

        if mask:
            self.execute_model = ~self._converged_mask()
        entries: List[TraversalEntry] = []
        if not p.x:
            entries += partial_traversal(tr, p)
        if not q.x:
            entries += partial_traversal(tr, q)
        self._run_traversal(entries, self.execute_model if mask else None)

        if self.use_pallas:
            z = self._makenewz_dispatch(p.number, q.number, z0, maxiter,
                                        mask)
            self._count('makenewz_device')
            t0 = time.perf_counter()
            z = np.asarray(z, dtype=np.float64)
            self._time('makenewz_device', time.perf_counter() - t0)
            return z

        sum_fn = self._get_jit('sumtable', 0)
        sumtables, srels = sum_fn(tuple(self.clv), tuple(self.scaler),
                                  p.number, q.number)
        nr_fn = self._get_jit('nr_core', 0)

        # --- the NR loop state machine (topLevelMakenewz :1133-1349) ---
        z = z0.copy()
        zprev = z.copy()
        zstep = np.zeros(B)
        maxiters = np.full(B, maxiter)
        outer_converged = np.zeros(B, dtype=bool)
        curvat_ok = np.ones(B, dtype=bool)
        core_lz = np.zeros(B)

        while True:
            fresh = ~outer_converged & curvat_ok
            curvat_ok[fresh] = False
            zprev[fresh] = z[fresh]
            zstep[fresh] = (1.0 - C.ZMAX) * z[fresh] + C.ZMIN

            active = ~outer_converged & ~curvat_ok
            zc = np.clip(z[active], C.ZMIN, C.ZMAX)
            z[active] = zc
            core_lz[active] = np.log(zc)

            if self.use_pallas:
                d1, d2 = self._nr_pallas(p.number, q.number, core_lz)
            else:
                d1, d2 = nr_fn(sumtables, srels, tuple(self.d_EIGN),
                               tuple(self.d_gamma),
                               tuple(self.d_rate_weights),
                               tuple(self.wgts), tuple(self.d_site_rates),
                               jnp.asarray(core_lz, dtype=self.dtype))
            d1 = np.asarray(d1, dtype=np.float64)
            d2 = np.asarray(d2, dtype=np.float64)
            if B == 1:
                ex = self.execute_model if mask else np.ones(self.n_models,
                                                             dtype=bool)
                dlnLdlz = np.array([d1[ex].sum()])
                d2lnLdlz2 = np.array([d2[ex].sum()])
            else:
                dlnLdlz, d2lnLdlz2 = d1, d2

            for i in range(B):
                if outer_converged[i] or curvat_ok[i]:
                    continue
                if d2lnLdlz2[i] >= 0.0 and z[i] < C.ZMAX:
                    zprev[i] = z[i] = 0.37 * z[i] + 0.63  # bad curvature
                else:
                    curvat_ok[i] = True

            for i in range(B):
                if not (curvat_ok[i] and not outer_converged[i]):
                    continue
                if d2lnLdlz2[i] < 0.0:
                    tantmp = -dlnLdlz[i] / d2lnLdlz2[i]
                    if tantmp < 100:
                        z[i] *= math.exp(tantmp)
                        if z[i] < C.ZMIN:
                            z[i] = C.ZMIN
                        if z[i] > 0.25 * zprev[i] + 0.75:
                            z[i] = 0.25 * zprev[i] + 0.75
                    else:
                        z[i] = 0.25 * zprev[i] + 0.75
                if z[i] > C.ZMAX:
                    z[i] = C.ZMAX
                maxiters[i] -= 1
                if abs(z[i] - zprev[i]) > zstep[i]:
                    if maxiters[i] < -20:
                        z[i] = z0[i]
                        outer_converged[i] = True
                    else:
                        outer_converged[i] = False
                else:
                    outer_converged[i] = True

            if outer_converged.all():
                break

        self.execute_model[:] = True
        return z

    # ------------------------------------------------------------------
    # branch smoothing (reference searchAlgo.c update/smooth/treeEvaluate)

    def update_branch(self, p: Node):
        q = p.back
        z0 = list(q.z)
        z = self.makenewz(p, q, z0, C.NEWZPERCYCLE,
                          mask=self.num_branches > 1)
        for i in range(self.num_branches):
            if not self.partition_converged[i]:
                if abs(z[i] - z0[i]) > C.DELTAZ:
                    self.partition_smoothed[i] = False
                p.z[i] = q.z[i] = float(z[i])

    def _smooth(self, p: Node):
        self.update_branch(p)
        if not self.tree.is_tip(p.number):
            q = p.next
            while q is not p:
                self._smooth(q.back)
                q = q.next
            self.newview(p, masked=self.num_branches > 1)

    def smooth_tree(self, maxtimes: int):
        if self._smooth_tree_device(maxtimes):
            return
        tr = self.tree
        p = tr.start
        self.partition_converged[:] = False
        while maxtimes > 0:
            maxtimes -= 1
            self.partition_smoothed[:] = True
            self._smooth(p.back)
            if not tr.is_tip(p.number):
                q = p.next
                while q is not p:
                    self._smooth(q.back)
                    q = q.next
            if self._all_smoothed():
                break
        self.partition_converged[:] = False

    def _all_smoothed(self) -> bool:
        result = True
        for i in range(self.num_branches):
            if not self.partition_smoothed[i]:
                result = False
            else:
                self.partition_converged[i] = True
        return result

    def local_smooth(self, p: Node, maxtimes: int):
        if self.tree.is_tip(p.number):
            return
        self.partition_converged[:] = False
        while maxtimes > 0:
            maxtimes -= 1
            self.partition_smoothed[:] = True
            q = p
            while True:
                self.update_branch(q)
                q = q.next
                if q is p:
                    break
            if self._all_smoothed():
                break
        self.partition_smoothed[:] = False
        self.partition_converged[:] = False

    def tree_evaluate(self, smooth_factor: float) -> float:
        """treeEvaluate (searchAlgo.c:2635): smooth all branches, then a
        full-traversal evaluation rooted at tr.start. On the accelerator
        both steps run as ONE device program (one sync instead of two)."""
        self._dense_only('branch smoothing (treeEvaluate)')
        maxtimes = int(C.SMOOTHINGS * smooth_factor)
        lnl = self._tree_evaluate_device(maxtimes)
        if lnl is not None:
            return lnl
        self.smooth_tree(maxtimes)
        return self.evaluate(self.tree.start, full_traversal_=True)

    # ------------------------------------------------------------------
    # on-device whole-tree smoothing (accelerator path): the entire
    # smooth pass — per-branch Newton-Raphson plus the CLV reorientation
    # sweep — runs as ONE jitted device program with the branch lengths
    # as device state, instead of ~2 dispatches per branch per pass
    # (the reference pays an MPI allreduce per NR iteration here,
    # makenewzGenericSpecial.c:1241-1248)

    def _edge_index(self):
        """Map each branch to an index; returns (rec->e dict keyed by
        id(ring record), z0 [E, B])."""
        tr = self.tree
        emap = {}
        z0 = []
        for p in tr.branches():
            e = len(z0)
            emap[id(p)] = e
            emap[id(p.back)] = e
            z0.append(list(p.z))
        return emap, np.array(z0, dtype=np.float64)

    def _build_smooth_schedule(self, emap, vflags):
        """Simulate one engine._smooth sweep from tr.start.back over the
        given virtual x-flag state (dict id(record)->bool), appending ops:
        ('nv', p,q,r rows, eq, er, tt) and ('nr', p,q rows, e). Mutates
        vflags to the post-pass state. Mirrors the sequential traversal
        logic exactly (compute_traversal semantics)."""
        tr = self.tree
        ops = []

        def flag(rec):
            if tr.is_tip(rec.number):
                return True
            return vflags.get(id(rec), bool(rec.x))

        def orient(rec):
            vflags[id(rec)] = True
            s = rec.next
            while s is not rec:
                vflags[id(s)] = False
                s = s.next

        def sim_newview(p):            # recompute CLV toward p
            if tr.is_tip(p.number):
                return
            q = p.next.back
            r = p.next.next.back
            if tr.is_tip(r.number) and not tr.is_tip(q.number):
                q, r = r, q
            for child in (q, r):
                if not tr.is_tip(child.number) and not flag(child):
                    sim_newview(child)
            orient(p)
            ops.append(('nv', p.number, q.number, r.number,
                        emap[id(q)], emap[id(r)],
                        tr.is_tip(q.number) and tr.is_tip(r.number)))

        def sim_ensure(p):
            if not tr.is_tip(p.number) and not flag(p):
                sim_newview(p)

        def sim_smooth(p):
            sim_ensure(p)
            sim_ensure(p.back)
            ops.append(('nr', p.number, p.back.number, emap[id(p)]))
            if not tr.is_tip(p.number):
                q = p.next
                while q is not p:
                    sim_smooth(q.back)
                    q = q.next
                sim_newview(p)

        sim_smooth(tr.start.back)
        return ops

    def _pack_smooth_ops(self, ops):
        L = len(ops)
        t = np.zeros(L, np.int32)
        pr = np.zeros(L, np.int32)
        qr = np.zeros(L, np.int32)
        rr = np.zeros(L, np.int32)
        eq = np.zeros(L, np.int32)
        er = np.zeros(L, np.int32)
        tt = np.zeros(L, np.int32)
        for i, op in enumerate(ops):
            if op[0] == 'nv':
                _, p, q, r, e1, e2, is_tt = op
                t[i] = 0
                pr[i], qr[i], rr[i] = p, q, r
                eq[i], er[i] = e1, e2
                tt[i] = int(is_tt)
            else:
                _, p, q, e = op
                t[i] = 1
                pr[i], qr[i] = p, q
                eq[i] = e
        return tuple(jnp.asarray(x) for x in (t, pr, qr, rr, eq, er, tt))

    def _build_smooth_program(self, with_eval: bool = False):
        M = self.n_models
        interpret = jax.default_backend() == 'cpu'

        def nv_op(state, model, pr, qr, rr, eq, er, tt):
            clvs, scalers, z, smoothed = state
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            zq = z[eq]                             # scalar (B == 1)
            zr = z[er]
            out_c, out_s = self._g_junctions(
                clvs, scalers, gammas, eigns, eis, evs, pr[None],
                qr[None], rr[None], zq[None], zr[None], tt[None],
                interpret, srs=srs if self.is_psr else None)
            return (out_c, out_s, z, smoothed)

        def derivatives(clvs, scalers, model, jp, jq, core_lz):
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            if self.is_psr:
                # batched kernels with N = 1 (the non-batch NR helper is
                # GAMMA-only; coreGTRCAT semantics ride the PSR wave
                # kernels)
                d1m, d2m = self._g_nr_derivs_batch(
                    clvs, scalers, gammas, eigns, rate_weights, gwgts,
                    jp, jq, core_lz[None], interpret, srs=srs)
                d1m = d1m[:, 0]
                d2m = d2m[:, 0]
            else:
                d1m, d2m = self._g_nr_derivs(
                    clvs, scalers, gammas, eigns, rate_weights, gwgts,
                    jp, jq, core_lz[None], interpret)
            d1t = 0.0
            d2t = 0.0
            for m in range(M):
                d1t = d1t + d1m[m]
                d2t = d2t + d2m[m]
            return d1t, d2t

        def nr_op(state, model, pr, qr, rr, eq, er, tt):
            # topLevelMakenewz state machine for ONE branch, maxiter =
            # NEWZPERCYCLE (= 1), B == 1 (engine.makenewz semantics)
            clvs, scalers, z, smoothed = state
            jp = pr[None]
            jq = qr[None]
            z0 = z[eq]

            def cond(st):
                return ~st[4]

            def body(st):
                zc, zprev, zstep, maxi, outer, curvat = st
                fresh = ~outer & curvat
                zprev = jnp.where(fresh, zc, zprev)
                zstep = jnp.where(fresh, (1.0 - C.ZMAX) * zc + C.ZMIN,
                                  zstep)
                curvat = curvat & ~fresh
                active = ~outer & ~curvat
                zcl = jnp.clip(zc, C.ZMIN, C.ZMAX)
                zc = jnp.where(active, zcl, zc)
                core_lz = jnp.log(jnp.clip(zc, C.ZMIN, C.ZMAX))
                d1, d2 = derivatives(clvs, scalers, model, jp, jq, core_lz)
                shorten = active & (d2 >= 0.0) & (zc < C.ZMAX)
                zshort = 0.37 * zc + 0.63
                zc = jnp.where(shorten, zshort, zc)
                zprev = jnp.where(shorten, zshort, zprev)
                curvat = curvat | (active & ~shorten)
                do_nr = active & ~shorten
                tantmp = -d1 / d2
                small = tantmp < 100.0
                zexp = jnp.maximum(zc * jnp.exp(tantmp), C.ZMIN)
                cap = 0.25 * zprev + 0.75
                zexp = jnp.minimum(zexp, cap)
                znr = jnp.where((d2 < 0.0) & small, zexp,
                                jnp.where(d2 < 0.0, cap, zc))
                znr = jnp.minimum(znr, C.ZMAX)
                zc = jnp.where(do_nr, znr, zc)
                maxi = jnp.where(do_nr, maxi - 1, maxi)
                moved = jnp.abs(zc - zprev) > zstep
                give_up = do_nr & moved & (maxi < -20)
                zc = jnp.where(give_up, z0, zc)
                outer = jnp.where(do_nr,
                                  jnp.where(moved, give_up, True), outer)
                return (zc, zprev, zstep, maxi, outer, curvat)

            st = (z0, z0, jnp.zeros_like(z0),
                  jnp.asarray(C.NEWZPERCYCLE, jnp.int32),
                  jnp.asarray(False), jnp.asarray(True))
            znew = jax.lax.while_loop(cond, body, st)[0]
            smoothed = smoothed & (jnp.abs(znew - z0) <= C.DELTAZ)
            z = z.at[eq].set(znew)
            return (clvs, scalers, z, smoothed)

        def run_ops(state, model, packed_ops):
            t, pr, qr, rr, eq, er, tt = packed_ops
            L = t.shape[0]

            def body(i, state):
                return jax.lax.cond(
                    t[i] == 0,
                    lambda s: nv_op(s, model, pr[i], qr[i], rr[i], eq[i],
                                    er[i], tt[i]),
                    lambda s: nr_op(s, model, pr[i], qr[i], rr[i], eq[i],
                                    er[i], tt[i]),
                    state)

            return jax.lax.fori_loop(0, L, body, state)

        def smooth(clvs, scalers, z, model, ops1, ops2, maxtimes):
            # pass 1 uses the entry x-flag schedule
            clvs, scalers, z, smoothed = run_ops(
                (clvs, scalers, z, jnp.asarray(True)), model, ops1)

            def cond(carry):
                k, clvs, scalers, z, smoothed = carry
                return (k < maxtimes) & ~smoothed

            def body(carry):
                k, clvs, scalers, z, _ = carry
                clvs, scalers, z, smoothed = run_ops(
                    (clvs, scalers, z, jnp.asarray(True)), model, ops2)
                return (k + 1, clvs, scalers, z, smoothed)

            k, clvs, scalers, z, smoothed = jax.lax.while_loop(
                cond, body, (jnp.asarray(1, jnp.int32), clvs, scalers, z,
                             smoothed))
            return clvs, scalers, z, smoothed, k

        if not with_eval:
            return jax.jit(smooth, donate_argnums=(0, 1),
                           static_argnums=())

        def smooth_eval(clvs, scalers, z, model, ops1, ops2, maxtimes,
                        ops3, p_row, q_row, e_root):
            # treeEvaluate = smooth + full-traversal evaluate
            # (searchAlgo.c:2635) in ONE program: the final z's never
            # visit the host between the smooth and the evaluation
            clvs, scalers, z, smoothed, k = smooth(
                clvs, scalers, z, model, ops1, ops2, maxtimes)
            clvs, scalers, z, _ = run_ops(
                (clvs, scalers, z, jnp.asarray(True)), model, ops3)
            gammas, eigns, eis, evs, rate_weights, gwgts, srs = model
            lhs = self._g_evaluate_all(
                clvs, scalers, gammas, eigns, rate_weights, gwgts,
                p_row, q_row, z[e_root][None], interpret,
                srates=srs if self.is_psr else None)
            return clvs, scalers, z, smoothed, k, lhs

        return jax.jit(smooth_eval, donate_argnums=(0, 1),
                       static_argnums=())

    def _smooth_schedules(self, maxtimes: int):
        """(emap, z0, ops1, ops2, vflags) for the device smoothing
        program, or None when the device path is unsupported."""
        if (not self.use_pallas or self.num_branches != 1
                or maxtimes < 1):
            return None
        emap, z0 = self._edge_index()
        vflags = {}
        ops1 = self._build_smooth_schedule(emap, vflags)
        end_of_p1 = dict(vflags)
        ops2 = self._build_smooth_schedule(emap, vflags)
        # the sweep must be closed: every later pass repeats the pass-2
        # ops and every pass ends in the same orientation state (so the
        # host-side flag restore below is exact however many passes ran)
        if end_of_p1 != vflags:
            return None
        if self._build_smooth_schedule(emap, dict(vflags)) != ops2:
            return None
        return emap, z0, ops1, ops2, vflags

    def _apply_smooth_result(self, tr, emap, vflags, znew):
        for p in tr.branches():
            e = emap[id(p)]
            p.z = [float(znew[e])]
            p.back.z = [float(znew[e])]
        # apply the simulated x-flag end state to the real records
        # (identical after every pass — checked in _smooth_schedules)
        for i in range(tr.mxtips + 1, 2 * tr.mxtips - 1):
            base = tr.nodep[i]
            if base is None:
                continue
            for rec in (base, base.next, base.next.next):
                if id(rec) in vflags:
                    rec.x = 1 if vflags[id(rec)] else 0
        self.partition_smoothed[:] = True
        self.partition_converged[:] = False

    def tree_evaluate_lazy(self, smooth_factor: float, maxtimes=None):
        """Dispatch the fused smooth+evaluate program WITHOUT fetching:
        returns a spec dict with device handles (z, lhs) and the edge map
        needed by tree_evaluate_finish, or None when the device path is
        unsupported. The BestList re-evaluation scans funnel a whole set
        of candidate trees through ONE fetch this way."""
        if maxtimes is None:
            maxtimes = int(C.SMOOTHINGS * smooth_factor)
        sched = self._smooth_schedules(maxtimes)
        if sched is None:
            return None
        tr = self.tree
        emap, z0, ops1, ops2, vflags = sched
        # post-smooth flag state must be live BEFORE planning the final
        # full traversal (the sequential path runs it after smoothing)
        for i in range(tr.mxtips + 1, 2 * tr.mxtips - 1):
            base = tr.nodep[i]
            if base is None:
                continue
            for rec in (base, base.next, base.next.next):
                if id(rec) in vflags:
                    rec.x = 1 if vflags[id(rec)] else 0
        q = tr.start.back
        entries = full_traversal(tr, q)
        pair2e = {}
        for p in tr.branches():
            pair2e[frozenset((p.number, p.back.number))] = emap[id(p)]
        ops3 = [('nv', e.p_number, e.q_number, e.r_number,
                 pair2e[frozenset((e.p_number, e.q_number))],
                 pair2e[frozenset((e.p_number, e.r_number))],
                 e.tip_case == TIP_TIP) for e in entries]
        e_root = pair2e[frozenset((tr.start.number, q.number))]

        fn = self._jit_cache.get('smoothevalprog')
        if fn is None:
            fn = self._build_smooth_program(with_eval=True)
            self._jit_cache['smoothevalprog'] = fn
        p1 = self._pack_smooth_ops(ops1)
        p2 = self._pack_smooth_ops(ops2)
        p3 = self._pack_smooth_ops(ops3)
        model = (tuple(self.d_gamma), tuple(self.d_EIGN),
                 tuple(self.d_EI), tuple(self.d_EV),
                 tuple(self.d_rate_weights), tuple(self.g_wgt),
                 tuple(self._gsr(g) for g in range(self.n_groups)))
        clvs, scalers, z, smoothed, k, lhs = fn(
            tuple(self.clv), tuple(self.scaler),
            jnp.asarray(z0[:, 0], dtype=jnp.float32), model, p1, p2,
            jnp.asarray(maxtimes, jnp.int32), p3,
            jnp.asarray([tr.start.number], jnp.int32),
            jnp.asarray([q.number], jnp.int32),
            jnp.asarray(e_root, jnp.int32))
        self.clv = list(clvs)
        self.scaler = list(scalers)
        # flags were already set (vflags, then full_traversal's
        # orientations — same order as the sequential path); only the
        # fitted branch lengths remain to apply after the fetch
        return dict(z=z, lhs=lhs, emap=emap)

    def tree_evaluate_finish(self, spec, znew, lhs) -> float:
        """Apply a fetched tree_evaluate_lazy result to the CURRENT tree
        (the caller must have the same topology restored; the edge map is
        keyed by ring-record identity, which recall preserves)."""
        tr = self.tree
        emap = spec['emap']
        for p in tr.branches():
            e = emap[id(p)]
            p.z = [float(znew[e])]
            p.back.z = [float(znew[e])]
        self.partition_smoothed[:] = True
        self.partition_converged[:] = False
        lhs = np.where(self.execute_model, lhs, self.per_partition_lh)
        self.per_partition_lh = lhs
        self.likelihood = float(lhs.sum())
        return self.likelihood

    def _tree_evaluate_device(self, maxtimes: int):
        """treeEvaluate as ONE dispatch + ONE fetch: the smoothing
        program plus the final full-traversal root evaluation composed in
        a single jitted program (the host path costs two separate syncs).
        Returns the likelihood, or None when unsupported."""
        spec = self.tree_evaluate_lazy(0.0, maxtimes=maxtimes)
        if spec is None:
            return None
        znew, lhs = self.fetch([spec['z'], spec['lhs']],
                               kind='tree_eval_device')
        return self.tree_evaluate_finish(spec, znew, lhs)

    def _smooth_tree_device(self, maxtimes: int) -> bool:
        """Whole smooth_tree as one device dispatch (accelerator,
        single branch class; GAMMA and PSR). Returns False when
        unsupported."""
        sched = self._smooth_schedules(maxtimes)
        if sched is None:
            return False
        tr = self.tree
        emap, z0, ops1, ops2, vflags = sched

        fn = self._jit_cache.get('smoothprog')
        if fn is None:
            fn = self._build_smooth_program()
            self._jit_cache['smoothprog'] = fn
        p1 = self._pack_smooth_ops(ops1)
        p2 = self._pack_smooth_ops(ops2)
        model = (tuple(self.d_gamma), tuple(self.d_EIGN),
                 tuple(self.d_EI), tuple(self.d_EV),
                 tuple(self.d_rate_weights), tuple(self.g_wgt),
                 tuple(self._gsr(g) for g in range(self.n_groups)))
        clvs, scalers, z, smoothed, k = fn(
            tuple(self.clv), tuple(self.scaler),
            jnp.asarray(z0[:, 0], dtype=jnp.float32), model, p1, p2,
            jnp.asarray(maxtimes, jnp.int32))
        self.clv = list(clvs)
        self.scaler = list(scalers)
        self._count('smooth_device')
        t0 = time.perf_counter()
        znew = np.asarray(z, dtype=np.float64)
        self._time('smooth_device', time.perf_counter() - t0)
        self._apply_smooth_result(tr, emap, vflags, znew)
        return True
