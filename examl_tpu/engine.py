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
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .datatypes import DataType, ProtModel, info_for
from .io.bytefile import Alignment
from .kernels import reference_jnp as K
from .models.eigen import make_eigen
from .models.gamma import make_gamma_cats
from .models.protein import prot_rates_freqs, wag_rates
from .traversal import (PackedTraversal, full_traversal, partial_traversal,
                        pack_traversal, TraversalEntry)
from .tree import Node, Tree


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
                 max_categories: int = 25):
        assert rate_het in ('GAMMA', 'PSR')
        self.aln = alignment
        self.tree = tree
        self.rate_het = rate_het
        self.use_median = use_median
        self.num_branches = num_branches
        self.mesh = sharding            # optional jax Mesh over axis 'sites'
        if self.mesh is not None:
            n_dev = int(np.prod(self.mesh.devices.shape))
            pad = max(pad, n_dev)
            pad = pad * n_dev // math.gcd(pad, n_dev)
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
        if self.use_pallas and jax.default_backend() != 'cpu':
            # Mosaic DMA slices must be lane-tile aligned
            self.pad = max(self.pad, 128)

        self.mxtips = tree.mxtips
        # CLV rows: [0..2*mxtips-1] node rows (2*mxtips-1 is the traversal
        # dummy-padding row) + a scratch pool for batched SPR scoring
        # (proximal/junction CLVs of a candidate wave; searchAlgo.c pays one
        # evaluateGeneric dispatch per insertion candidate instead,
        # searchAlgo.c:682-777)
        self.scratch_base = 2 * self.mxtips
        self.n_scratch = min(256, max(64, 2 * self.mxtips))
        self.rows = self.scratch_base + self.n_scratch
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

        self._jit_cache = {}
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

    def _build_buffers(self):
        self.widths = []        # padded widths
        self.real_widths = []
        self.tip_codes = []     # [mxtips+1, W] int32 per partition
        self.host_tip_codes = []    # host copies (multi-process safe)
        self.wgts = []          # [W] dtype
        self.wgts_i = []        # [W] int32
        for m, meta in enumerate(self.aln.partitions):
            w = meta.width
            W = max(self.pad, ((w + self.pad - 1) // self.pad) * self.pad)
            inf = info_for(meta.data_type)
            codes = np.full((self.mxtips + 1, W), inf.undetermined,
                            dtype=np.int32)
            codes[1:, :w] = self.aln.codes[:, meta.lower:meta.upper]
            wgt = np.zeros(W, dtype=np.int64)
            wgt[:w] = self.aln.weights[meta.lower:meta.upper]
            self.widths.append(W)
            self.real_widths.append(w)
            self.host_tip_codes.append(codes)
            self.tip_codes.append(self._put(jnp.asarray(codes), 'codes'))
            self.wgts.append(self._put(jnp.asarray(wgt, dtype=self.dtype),
                                       'sites'))
            self.wgts_i.append(self._put(jnp.asarray(wgt, dtype=jnp.int32),
                                         'sites'))
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

        # CLV buffers and per-(category, site) scale counters
        self.clv = []
        self.scaler = []
        for m in range(self.n_models):
            S = self.partitions[m].states
            self.clv.append(self._put(jnp.zeros(
                (self.rows, self.n_cats, S, self.widths[m]),
                dtype=self.dtype), 'clv'))
            self.scaler.append(self._put(jnp.zeros(
                (self.rows, self.n_cats, self.widths[m]), dtype=jnp.int32),
                'scaler'))

    def _put(self, arr, kind):
        """Place an array on the device mesh with the sites axis sharded
        (the analogue of the reference's per-rank site slices,
        examl/partitionAssignment.c + byteFile.c readMyData). When the
        mesh spans multiple processes, each process materializes only its
        addressable shards."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.distributed import put_global
        spec = {
            'clv': P(None, None, None, 'sites'),
            'scaler': P(None, None, 'sites'),
            'sites': P('sites'),
            'codes': P(None, 'sites'),
        }[kind]
        return put_global(arr, NamedSharding(self.mesh, spec))

    def host_sites(self, arr) -> np.ndarray:
        """Materialize a per-site device array on the host in global site
        order (process_allgather over DCN when multi-process — replacing
        the reference's Gatherv + master reorder, communication.c:120-182)."""
        from .parallel.distributed import host_gather
        return host_gather(arr)

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
                self.d_EIGN[m] = jnp.asarray(eign, dtype=self.dtype)
                self.d_EI[m] = jnp.asarray(
                    np.stack([es.EI for es in systems]), dtype=self.dtype)
                self.d_EV[m] = jnp.asarray(
                    np.stack([es.EV for es in systems]), dtype=self.dtype)
                self.d_tipvec[m] = jnp.asarray(
                    np.stack([es.tip_vector for es in systems]),
                    dtype=self.dtype)
            else:
                es = make_eigen(pm.subst_rates, pm.frequencies,
                                inf.bit_vectors)
                pm_gamma = (np.ones(1) if self.is_psr else
                            make_gamma_cats(pm.alpha, C_, self.use_median))
                self.d_EIGN[m] = jnp.asarray(
                    np.tile(es.EIGN, (C_, 1)), dtype=self.dtype)
                self.d_EI[m] = jnp.asarray(
                    np.tile(es.EI, (C_, 1, 1)), dtype=self.dtype)
                self.d_EV[m] = jnp.asarray(
                    np.tile(es.EV, (C_, 1, 1)), dtype=self.dtype)
                self.d_tipvec[m] = jnp.asarray(
                    np.tile(es.tip_vector, (C_, 1, 1)), dtype=self.dtype)
            self.d_gamma[m] = jnp.asarray(pm_gamma, dtype=self.dtype)
            self._refresh_tip_rows(m)

    def update_gamma(self, models):
        """Alpha changed only: refresh discrete rates."""
        if self.is_psr:
            return
        for m in models:
            pm = self.partitions[m]
            self.d_gamma[m] = jnp.asarray(
                make_gamma_cats(pm.alpha, self.n_cats, self.use_median),
                dtype=self.dtype)

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

    def _refresh_tip_rows(self, m):
        """Materialize tip CLVs = tipVector[code] per category. The gather
        runs on the host (numpy) and only a plain slice-set touches the
        device buffer — no XLA gather program."""
        tipvec = np.asarray(self.d_tipvec[m])           # [C, codes, S]
        codes = self.host_tip_codes[m]                  # [T+1, W]
        tips = tipvec[:, codes, :]                      # [C, T+1, W, S]
        tips = np.ascontiguousarray(tips.transpose(1, 0, 3, 2))
        fn = self._get_jit('tip_set', m)
        self.clv[m] = fn(self.clv[m],
                         self._put(jnp.asarray(tips, dtype=self.dtype),
                                   'clv'))

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

    def evaluate_batch(self, p_rows, q_rows, zs) -> np.ndarray:
        """Log likelihood of N branches in one wave: candidate i is the
        branch of length zs[i] (per branch class) between the CLVs in
        buffer rows p_rows[i] and q_rows[i]. Returns [N] summed over
        partitions. Rows may be scratch rows written by a synthetic
        traversal (see SprSearch batched scoring)."""
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
        if self.use_pallas:
            lhs = self._evaluate_batch_pallas(jp, jq, z)
        else:
            fn = self._get_jit('evaluate_batch', L)
            lhs = fn(tuple(self.clv), tuple(self.scaler),
                     tuple(self.d_EIGN), tuple(self.d_gamma),
                     tuple(self.d_rate_weights), tuple(self.wgts),
                     tuple(self.d_site_rates),
                     jnp.asarray(jp), jnp.asarray(jq),
                     jnp.asarray(z, dtype=self.dtype))
        lhs = np.asarray(lhs, dtype=np.float64)
        return lhs[:, :N].sum(axis=0)

    def _evaluate_batch_pallas(self, jp, jq, zs):
        from .kernels.pallas_newview import (evaluate_batch_gamma,
                                             evaluate_batch_psr)
        interpret = jax.default_backend() == 'cpu'
        fn = self._jit_cache.get('pallas_eval_batch')
        if fn is None:
            fn = jax.jit(evaluate_batch_psr if self.is_psr
                         else evaluate_batch_gamma,
                         static_argnames=('block_w', 'log_min_scale',
                                          'interpret'))
            self._jit_cache['pallas_eval_batch'] = fn
        jpd = jnp.asarray(jp)
        jqd = jnp.asarray(jq)
        out = []
        for m in range(self.n_models):
            col = self._branch_col(m)
            lzs = jnp.asarray(np.log(np.maximum(zs[:, col], C.ZMIN)),
                              dtype=jnp.float32)
            if self.is_psr:
                out.append(fn(self.clv[m], self.scaler[m], jpd, jqd, lzs,
                              self.d_EIGN[m][0].astype(jnp.float32),
                              self.wgts[m].astype(jnp.float32),
                              self.d_site_rates[m].astype(jnp.float32),
                              block_w=min(8192, self.widths[m]),
                              log_min_scale=self.log_min_scale,
                              interpret=interpret))
            else:
                out.append(fn(self.clv[m], self.scaler[m], jpd, jqd, lzs,
                              self.d_EIGN[m].astype(jnp.float32),
                              self.d_gamma[m].astype(jnp.float32),
                              self.d_rate_weights[m].astype(jnp.float32),
                              self.wgts[m].astype(jnp.float32),
                              block_w=min(8192, self.widths[m]),
                              log_min_scale=self.log_min_scale,
                              interpret=interpret))
        return np.stack([np.asarray(o) for o in out])

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
        from .kernels.pallas_newview import per_site_lnl_pallas
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
        saved_clv = self.clv
        saved_scaler = self.scaler
        saved_rates = self.d_site_rates
        self.clv = [jnp.array(c) for c in self.clv]     # scratch copies
        self.scaler = [jnp.array(s) for s in self.scaler]
        self.d_site_rates = [jnp.asarray(r, dtype=self.dtype)
                             for r in rates_list]
        try:
            self._run_traversal_pallas(entries, None)
            lfn = self._jit_cache.get('pallas_pslnl')
            if lfn is None:
                lfn = jax.jit(per_site_lnl_pallas,
                              static_argnames=('block_w', 'log_min_scale',
                                               'interpret'))
                self._jit_cache['pallas_pslnl'] = lfn
            jp = jnp.asarray([p.number], dtype=jnp.int32)
            jq = jnp.asarray([q.number], dtype=jnp.int32)
            out = []
            for m in range(self.n_models):
                col = self._branch_col(m)
                lz = math.log(max(q.z[col], C.ZMIN))
                out.append(np.asarray(lfn(
                    self.clv[m], self.scaler[m], jp, jq,
                    self.d_EIGN[m][0][None, :].astype(jnp.float32),
                    self.d_site_rates[m].astype(jnp.float32),
                    jnp.asarray([lz], dtype=jnp.float32),
                    block_w=min(8192, self.widths[m]),
                    log_min_scale=self.log_min_scale,
                    interpret=interpret), dtype=np.float64))
        finally:
            self.clv = saved_clv
            self.scaler = saved_scaler
            self.d_site_rates = saved_rates
        return out

    # ------------------------------------------------------------------
    # generic operations (host API mirroring the reference entry points)

    def _run_traversal_pallas(self, entries, exec_mask):
        """Level-batched traversal through the fused Pallas newview kernel
        (one in-place gather/compute/scatter pass per level per
        partition). Level node counts are padded to powers of two (dummy
        updates land in the scratch row) to bound the number of compiled
        programs."""
        from .kernels.pallas_newview import (make_p_batch,
                                             newview_level_pallas,
                                             newview_level_pallas_psr)
        from .traversal import chunk_entries
        tr = self.tree
        # fixed chunk size => one compiled kernel shape for every traversal
        chunk = 16 if len(entries) > 4 else 4
        levels = chunk_entries(tr, entries, chunk)
        interpret = jax.default_backend() == 'cpu'
        fn = self._jit_cache.get('pallas_nv')
        if fn is None:
            if self.is_psr:
                def level_update(clv, scaler, jp, jq, jr, jt, zq, zr,
                                 site_rates, eign, ei, ev, *, block_w,
                                 min_scale, inv_min_scale, interpret):
                    lamq = eign[0][None, :] * K.log_z(zq)[:, None]
                    lamr = eign[0][None, :] * K.log_z(zr)[:, None]
                    return newview_level_pallas_psr(
                        clv, scaler, jp, jq, jr, jt,
                        lamq.astype(jnp.float32),
                        lamr.astype(jnp.float32), ei[0], ev[0], site_rates,
                        block_w=block_w, min_scale=min_scale,
                        inv_min_scale=inv_min_scale, interpret=interpret)
            else:
                def level_update(clv, scaler, jp, jq, jr, jt, zq, zr,
                                 gamma, eign, ei, ev, *, block_w, min_scale,
                                 inv_min_scale, interpret):
                    pls, prs = make_p_batch(zq, zr, gamma, eign, ei)
                    return newview_level_pallas(
                        clv, scaler, jp, jq, jr, jt, pls, prs, ev,
                        block_w=block_w, min_scale=min_scale,
                        inv_min_scale=inv_min_scale, interpret=interpret)

            fn = jax.jit(level_update,
                         static_argnames=('block_w', 'min_scale',
                                          'inv_min_scale', 'interpret'),
                         donate_argnums=(0, 1))
            self._jit_cache['pallas_nv'] = fn

        for lv in levels:
            qz = lv.qz
            rz = lv.rz
            jp = jnp.asarray(lv.p_idx)
            jq = jnp.asarray(lv.q_idx)
            jr = jnp.asarray(lv.r_idx)
            jt = jnp.asarray(lv.tip_tip.astype(np.int32))
            for m in range(self.n_models):
                if exec_mask is not None and not exec_mask[m]:
                    continue
                col = self._branch_col(m)
                zq = jnp.asarray(qz[:, col], dtype=self.dtype)
                zr = jnp.asarray(rz[:, col], dtype=self.dtype)
                third = (self.d_site_rates[m] if self.is_psr
                         else self.d_gamma[m])
                self.clv[m], self.scaler[m] = fn(
                    self.clv[m], self.scaler[m], jp, jq, jr, jt, zq, zr,
                    third, self.d_EIGN[m], self.d_EI[m],
                    self.d_EV[m], block_w=min(8192, self.widths[m]),
                    min_scale=self.min_scale,
                    inv_min_scale=self.inv_min_scale,
                    interpret=interpret)

    def _run_traversal(self, entries: List[TraversalEntry],
                       exec_mask: Optional[np.ndarray] = None):
        if not entries:
            return
        if self.use_pallas:
            self._run_traversal_pallas(entries, exec_mask)
            return
        packed = pack_traversal(self.tree, entries)
        if exec_mask is None:
            exec_mask = np.ones(self.n_models, dtype=bool)
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

    def newview(self, p: Node, masked: bool = False):
        """Recompute the CLV at p (reference newviewGeneric :1523)."""
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
        lhs = np.asarray(lhs, dtype=np.float64)
        # per-partition execute mask: keep stored values for masked entries
        lhs = np.where(self.execute_model, lhs, self.per_partition_lh)
        self.per_partition_lh = lhs
        self.likelihood = float(lhs.sum())
        return self.likelihood

    def _evaluate_pallas(self, p_row, q_row, qz):
        from .kernels.pallas_newview import (evaluate_pallas,
                                             evaluate_pallas_psr)
        interpret = jax.default_backend() == 'cpu'
        fn = self._jit_cache.get('pallas_eval')
        if fn is None:
            fn = jax.jit(evaluate_pallas_psr if self.is_psr
                         else evaluate_pallas,
                         static_argnames=('block_w', 'log_min_scale',
                                          'interpret'))
            self._jit_cache['pallas_eval'] = fn
        jp = jnp.asarray([p_row], dtype=jnp.int32)
        jq = jnp.asarray([q_row], dtype=jnp.int32)
        out = []
        for m in range(self.n_models):
            col = self._branch_col(m)
            lz = math.log(max(qz[col], C.ZMIN))
            if self.is_psr:
                lam = (self.d_EIGN[m][0] * lz)[None, :]
                out.append(fn(self.clv[m], self.scaler[m], jp, jq,
                              lam.astype(jnp.float32),
                              self.wgts[m].astype(jnp.float32),
                              self.d_site_rates[m].astype(jnp.float32),
                              block_w=min(8192, self.widths[m]),
                              log_min_scale=self.log_min_scale,
                              interpret=interpret))
            else:
                diag = jnp.exp(self.d_EIGN[m] * self.d_gamma[m][:, None]
                               * lz)
                out.append(fn(self.clv[m], self.scaler[m], jp, jq,
                              diag.astype(jnp.float32),
                              self.d_rate_weights[m].astype(jnp.float32),
                              self.wgts[m].astype(jnp.float32),
                              block_w=min(8192, self.widths[m]),
                              log_min_scale=self.log_min_scale,
                              interpret=interpret))
        return np.array([float(o) for o in out])

    def _nr_pallas(self, p_row, q_row, core_lz):
        from .kernels.pallas_newview import (nr_derivatives_pallas,
                                             nr_derivatives_pallas_psr)
        interpret = jax.default_backend() == 'cpu'
        fn = self._jit_cache.get('pallas_nrd')
        if fn is None:
            statics = (('block_w', 'interpret') if self.is_psr
                       else ('block_w', 'log_min_scale', 'interpret'))
            fn = jax.jit(nr_derivatives_pallas_psr if self.is_psr
                         else nr_derivatives_pallas,
                         static_argnames=statics)
            self._jit_cache['pallas_nrd'] = fn
        jp = jnp.asarray([p_row], dtype=jnp.int32)
        jq = jnp.asarray([q_row], dtype=jnp.int32)
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
                            block_w=min(8192, self.widths[m]),
                            interpret=interpret)
            else:
                lam = self.d_EIGN[m] * self.d_gamma[m][:, None]
                d = (self.d_rate_weights[m][:, None]
                     * jnp.exp(lam * core_lz[col])).astype(jnp.float32)
                d1, d2 = fn(self.clv[m], self.scaler[m], jp, jq,
                            lam.astype(jnp.float32), d,
                            self.wgts[m].astype(jnp.float32),
                            block_w=min(8192, self.widths[m]),
                            log_min_scale=self.log_min_scale,
                            interpret=interpret)
            d1s[m] = float(d1)
            d2s[m] = float(d2)
        return d1s, d2s

    # ------------------------------------------------------------------
    # Newton-Raphson branch-length optimization

    def _build_nr_loop_fn(self):
        """The entire topLevelMakenewz state machine as one on-device
        lax.while_loop around the Pallas derivative kernel — one dispatch
        per branch optimization instead of one per NR iteration (the
        reference pays an MPI allreduce per iteration here,
        makenewzGenericSpecial.c:1241-1248)."""
        from .kernels.pallas_newview import (nr_derivatives_pallas,
                                             nr_derivatives_pallas_psr)
        n_models = self.n_models
        B = self.num_branches
        interpret = jax.default_backend() == 'cpu'

        def derivatives(clvs, scalers, jp, jq, eign, gamma, rate_weights,
                        wgts, site_rates, core_lz):
            d1s, d2s = [], []
            for m in range(n_models):
                col = self._branch_col(m)
                if self.is_psr:
                    d1, d2 = nr_derivatives_pallas_psr(
                        clvs[m], scalers[m], jp, jq,
                        eign[m][0][None, :].astype(jnp.float32),
                        wgts[m].astype(jnp.float32),
                        site_rates[m].astype(jnp.float32),
                        core_lz[col][None].astype(jnp.float32),
                        block_w=min(8192, self.widths[m]),
                        interpret=interpret)
                else:
                    lam = eign[m] * gamma[m][:, None]
                    d = (rate_weights[m][:, None]
                         * jnp.exp(lam * core_lz[col])).astype(jnp.float32)
                    d1, d2 = nr_derivatives_pallas(
                        clvs[m], scalers[m], jp, jq,
                        lam.astype(jnp.float32), d,
                        wgts[m].astype(jnp.float32),
                        block_w=min(8192, self.widths[m]),
                        log_min_scale=self.log_min_scale,
                        interpret=interpret)
                d1s.append(d1)
                d2s.append(d2)
            return jnp.stack(d1s), jnp.stack(d2s)

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


    def makenewz(self, p: Node, q: Node, z0, maxiter: int,
                 mask: bool = False):
        """Optimize the branch (p, q) starting from z0
        (reference makenewzGeneric :1355 + topLevelMakenewz :1133)."""
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
            fn = self._jit_cache.get('pallas_nr_loop')
            if fn is None:
                fn = self._build_nr_loop_fn()
                self._jit_cache['pallas_nr_loop'] = fn
            ex = (self.execute_model if mask
                  else np.ones(self.n_models, dtype=bool))
            z = fn(tuple(self.clv), tuple(self.scaler),
                   jnp.asarray([p.number], dtype=jnp.int32),
                   jnp.asarray([q.number], dtype=jnp.int32),
                   tuple(self.d_EIGN), tuple(self.d_gamma),
                   tuple(self.d_rate_weights), tuple(self.wgts),
                   tuple(self.d_site_rates),
                   jnp.asarray(z0, dtype=self.dtype),
                   jnp.asarray(ex), maxiter)
            self.execute_model[:] = True
            return np.asarray(z, dtype=np.float64)

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
        full-traversal evaluation rooted at tr.start."""
        self.smooth_tree(int(C.SMOOTHINGS * smooth_factor))
        return self.evaluate(self.tree.start, full_traversal_=True)
