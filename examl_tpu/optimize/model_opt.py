"""Model-parameter optimization: Brent's method over linked partition groups.

Faithful port of the reference optimizer stack (reference:
examl/optimizeModel.c — optParamGeneric :1283, brakGeneric :800,
brentGeneric :582, evaluateChange :464, changeModelParameters :419,
optRatesGeneric :1634, optBaseFreqs :1501, optAlphasGeneric :1136,
modOpt :2963). The bracketing/Brent state machines are vectorized across
linkage groups exactly like the reference so optimization trajectories (and
hence final parameters) match.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np

from .. import constants as C
from ..datatypes import DataType, ProtModel
from ..engine import LikelihoodEngine

MNBRAK_GOLD = 1.618034
MNBRAK_TINY = 1.e-20
MNBRAK_GLIMIT = 100.0
BRENT_ZEPS = 1.e-5
BRENT_CGOLD = 0.3819660

ALPHA_F, RATE_F, FREQ_F, LXRATE_F, LXWEIGHT_F = 0, 1, 2, 3, 4


def _sign(a, b):
    return abs(a) if b > 0.0 else -abs(a)


@dataclasses.dataclass
class LinkageGroup:
    partitions: List[int]
    valid: bool = True


class LinkageList:
    def __init__(self, groups: List[LinkageGroup]):
        self.groups = groups

    @property
    def entries(self):
        return len(self.groups)

    def set_all_valid(self):
        for g in self.groups:
            g.valid = True


def init_linkage_list(link_ids: List[int]) -> LinkageList:
    """link_ids[i] = group id of partition i (optimizeModel.c:126)."""
    n_groups = max(link_ids) + 1
    groups = []
    for g in range(n_groups):
        groups.append(LinkageGroup(
            [i for i, l in enumerate(link_ids) if l == g]))
    return LinkageList(groups)


def init_linkage_list_gtr(engine: LikelihoodEngine) -> LinkageList:
    """All AA partitions under GTR share one group; anything else is
    unlinked (optimizeModel.c initLinkageListGTR :259)."""
    n = engine.n_models
    first_aa = n + 2
    count_gtr = 0
    for i, pm in enumerate(engine.partitions):
        if pm.data_type == DataType.AA and pm.prot_model == ProtModel.GTR:
            first_aa = min(first_aa, i)
            count_gtr += 1
    links = []
    for i, pm in enumerate(engine.partitions):
        if count_gtr > 0 and pm.data_type == DataType.AA:
            links.append(first_aa)
        else:
            links.append(i)
    return init_linkage_list(links)


class ModelOptimizer:
    def __init__(self, engine: LikelihoodEngine,
                 auto_prot_selection: str = 'ml'):
        self.engine = engine
        self.auto_prot_selection = auto_prot_selection
        self._cat_opt = 0   # PSR categorization passes (max 3 per modOpt)
        self._dev_opt = None  # lazy DeviceParamOptimizer (accelerator)

    def _device_opt_for(self, which, ll: LinkageList):
        """The on-device brak+brent path when the engine and parameter
        type support it (optimize/device_opt.py): returns
        (optimizer, lane_of) or None. lane_of maps partition -> valid-
        group lane in _evaluate_change's ordering."""
        import os
        eng = self.engine
        if not eng.use_pallas or eng.compact:
            # the device probe programs drive the dense fused traversal;
            # compacted engines probe through the host Brent path with
            # full induced evaluates
            return None
        if os.environ.get('EXAML_DEVICE_OPT', '1') == '0':
            return None
        lane_of = [-1] * eng.n_models
        pos = 0
        for group in ll.groups:
            if not group.valid:
                continue
            for k in group.partitions:
                lane_of[k] = pos
            pos += 1
        if self._dev_opt is None:
            from .device_opt import DeviceParamOptimizer
            self._dev_opt = DeviceParamOptimizer(eng)
        if not self._dev_opt.supported(which, lane_of):
            return None
        return self._dev_opt, tuple(lane_of)

    # ------------------------------------------------------------------

    def _change_parameter(self, index: int, rate_number: int, value: float,
                          which: int):
        eng = self.engine
        pm = eng.partitions[index]
        if which == RATE_F:
            states = pm.states
            num_rates = states * (states - 1) // 2
            if pm.data_type == DataType.DNA:
                assert 0 <= rate_number < num_rates - 1
            assert C.RATE_MIN <= value <= C.RATE_MAX
            pm.subst_rates[rate_number] = value
            eng.update_eigen([index])
        elif which == ALPHA_F:
            pm.alpha = value
            eng.update_gamma([index])
        elif which == FREQ_F:
            pm.freq_exponents[rate_number] = value
            w = np.exp(pm.freq_exponents)
            pm.frequencies = w / w.sum()
            eng.update_eigen([index])
        elif which == LXRATE_F:
            pm.gamma_rates[rate_number] = value
            eng.update_eigen([index])    # re-applies scaleLG4X_EIGN
        elif which == LXWEIGHT_F:
            pm.weight_exponents[rate_number] = value
            w = np.exp(pm.weight_exponents)
            pm.lg4x_weights = w / w.sum()
            eng.update_eigen([index])
        else:
            raise AssertionError(which)

    def _evaluate_change(self, rate_number, values, converged, which,
                         ll: LinkageList):
        """Apply proposals and evaluate; returns -lnL per valid group
        (evaluateChange :464)."""
        eng = self.engine
        pos = 0
        for group in ll.groups:
            if group.valid:
                if converged[pos]:
                    for k in group.partitions:
                        eng.execute_model[k] = False
                else:
                    for k in group.partitions:
                        self._change_parameter(k, rate_number, values[pos],
                                               which)
                pos += 1
            else:
                for k in group.partitions:
                    eng.execute_model[k] = False

        eng.evaluate(eng.tree.start, full_traversal_=True)

        result = np.zeros(pos)
        pos = 0
        for group in ll.groups:
            if group.valid:
                for k in group.partitions:
                    result[pos] -= eng.per_partition_lh[k]
                pos += 1
            for k in group.partitions:
                eng.execute_model[k] = True
        return result

    # ------------------------------------------------------------------
    # bracketing (brakGeneric :800)

    def _brak(self, ax, bx, cx, fa, fb, fc, lim_inf, lim_sup, n,
              rate_number, which, ll):
        param = np.zeros(n)
        u = np.zeros(n)
        ulim = np.zeros(n)
        state = np.zeros(n, dtype=int)
        end_state = np.zeros(n, dtype=int)
        converged = np.zeros(n, dtype=bool)

        def clamp(arr, i):
            arr[i] = min(max(arr[i], lim_inf[i]), lim_sup[i])

        for i in range(n):
            param[i] = ax[i]
            clamp(param, i)
            ax[i] = param[i]
        fa[:] = self._evaluate_change(rate_number, param, converged, which, ll)

        for i in range(n):
            param[i] = bx[i]
            clamp(param, i)
            bx[i] = param[i]
        fb[:] = self._evaluate_change(rate_number, param, converged, which, ll)

        for i in range(n):
            if fb[i] > fa[i]:
                ax[i], bx[i] = bx[i], ax[i]
                fa[i], fb[i] = fb[i], fa[i]
            cx[i] = bx[i] + MNBRAK_GOLD * (bx[i] - ax[i])
            param[i] = cx[i]
            clamp(param, i)
            cx[i] = param[i]
        fc[:] = self._evaluate_change(rate_number, param, converged, which, ll)

        while True:
            if converged.all():
                for i in range(n):
                    clamp(ax, i)
                    clamp(bx, i)
                    clamp(cx, i)
                return

            for i in range(n):
                if converged[i]:
                    continue
                if state[i] == 0:
                    end_state[i] = 0
                    if not (fb[i] > fc[i]):
                        converged[i] = True
                    else:
                        clamp(ax, i)
                        clamp(bx, i)
                        clamp(cx, i)
                        r = (bx[i] - ax[i]) * (fb[i] - fc[i])
                        q = (bx[i] - cx[i]) * (fb[i] - fa[i])
                        u[i] = bx[i] - ((bx[i] - cx[i]) * q
                                        - (bx[i] - ax[i]) * r) / (
                            2.0 * _sign(max(abs(q - r), MNBRAK_TINY), q - r))
                        ulim[i] = bx[i] + MNBRAK_GLIMIT * (cx[i] - bx[i])
                        clamp(u, i)
                        clamp(ulim, i)
                        if (bx[i] - u[i]) * (u[i] - cx[i]) > 0.0:
                            param[i] = u[i]
                            clamp(param, i)
                            u[i] = param[i]
                            end_state[i] = 1
                        elif (cx[i] - u[i]) * (u[i] - ulim[i]) > 0.0:
                            param[i] = u[i]
                            clamp(param, i)
                            u[i] = param[i]
                            end_state[i] = 2
                        elif (u[i] - ulim[i]) * (ulim[i] - cx[i]) >= 0.0:
                            u[i] = ulim[i]
                            param[i] = u[i]
                            clamp(param, i)
                            u[i] = ulim[i] = param[i]
                            end_state[i] = 0
                        else:
                            u[i] = cx[i] + MNBRAK_GOLD * (cx[i] - bx[i])
                            param[i] = u[i]
                            clamp(param, i)
                            u[i] = param[i]
                            end_state[i] = 0
                elif state[i] == 1:
                    end_state[i] = 0
                elif state[i] == 2:
                    end_state[i] = 3
                else:
                    raise AssertionError

            temp = self._evaluate_change(rate_number, param, converged,
                                         which, ll)

            for i in range(n):
                if converged[i]:
                    continue
                if end_state[i] == 0:
                    fu = temp[i]
                    ax[i], bx[i], cx[i] = bx[i], cx[i], u[i]
                    fa[i], fb[i], fc[i] = fb[i], fc[i], fu
                    state[i] = 0
                elif end_state[i] == 1:
                    fu = temp[i]
                    if fu < fc[i]:
                        ax[i] = bx[i]
                        bx[i] = u[i]
                        fa[i] = fb[i]
                        fb[i] = fu
                        converged[i] = True
                    elif fu > fb[i]:
                        cx[i] = u[i]
                        fc[i] = fu
                        converged[i] = True
                    else:
                        u[i] = cx[i] + MNBRAK_GOLD * (cx[i] - bx[i])
                        param[i] = u[i]
                        clamp(param, i)
                        u[i] = param[i]
                        state[i] = 1
                elif end_state[i] == 2:
                    fu = temp[i]
                    if fu < fc[i]:
                        bx[i], cx[i] = cx[i], u[i]
                        u[i] = cx[i] + MNBRAK_GOLD * (cx[i] - bx[i])
                        fb[i], fc[i] = fc[i], fu
                        state[i] = 2
                    else:
                        state[i] = 0
                        ax[i], bx[i], cx[i] = bx[i], cx[i], u[i]
                        fa[i], fb[i], fc[i] = fb[i], fc[i], fu
                elif end_state[i] == 3:
                    fb[i], fc[i], fu = fc[i], temp[i], temp[i]
                    ax[i], bx[i], cx[i] = bx[i], cx[i], u[i]
                    fa[i], fb[i], fc[i] = fb[i], fc[i], fu
                    state[i] = 0
                else:
                    raise AssertionError

    # ------------------------------------------------------------------
    # Brent (brentGeneric :582)

    def _brent(self, ax, bx, cx, fb, tol, xmin, result, n, which,
               rate_number, ll, lim_inf, lim_sup):
        a = np.minimum(ax, cx)
        b = np.maximum(ax, cx)
        x = bx.copy()
        w = bx.copy()
        v = bx.copy()
        fw = fb.copy()
        fv = fb.copy()
        fx = fb.copy()
        d = np.zeros(n)
        e = np.zeros(n)
        u = np.zeros(n)
        fu = np.zeros(n)
        converged = np.zeros(n, dtype=bool)

        for _ in range(C.ITMAX):
            if converged.all():
                return
            for i in range(n):
                if converged[i]:
                    continue
                xm = 0.5 * (a[i] + b[i])
                tol1 = tol * abs(x[i]) + BRENT_ZEPS
                tol2 = 2.0 * tol1
                if abs(x[i] - xm) <= tol2 - 0.5 * (b[i] - a[i]):
                    result[i] = -fx[i]
                    xmin[i] = x[i]
                    converged[i] = True
                    continue
                if abs(e[i]) > tol1:
                    r = (x[i] - w[i]) * (fx[i] - fv[i])
                    q = (x[i] - v[i]) * (fx[i] - fw[i])
                    p = (x[i] - v[i]) * q - (x[i] - w[i]) * r
                    q = 2.0 * (q - r)
                    if q > 0.0:
                        p = -p
                    q = abs(q)
                    etemp = e[i]
                    e[i] = d[i]
                    if (abs(p) >= abs(0.5 * q * etemp) or p <= q * (a[i] - x[i])
                            or p >= q * (b[i] - x[i])):
                        e[i] = a[i] - x[i] if x[i] >= xm else b[i] - x[i]
                        d[i] = BRENT_CGOLD * e[i]
                    else:
                        d[i] = p / q
                        u[i] = x[i] + d[i]
                        if u[i] - a[i] < tol2 or b[i] - u[i] < tol2:
                            d[i] = _sign(tol1, xm - x[i])
                else:
                    e[i] = a[i] - x[i] if x[i] >= xm else b[i] - x[i]
                    d[i] = BRENT_CGOLD * e[i]
                u[i] = (x[i] + d[i] if abs(d[i]) >= tol1
                        else x[i] + _sign(tol1, d[i]))

            fu[:len(u)] = self._evaluate_change(rate_number, u, converged,
                                                which, ll)

            for i in range(n):
                if converged[i]:
                    continue
                if fu[i] <= fx[i]:
                    if u[i] >= x[i]:
                        a[i] = x[i]
                    else:
                        b[i] = x[i]
                    v[i], w[i], x[i] = w[i], x[i], u[i]
                    fv[i], fw[i], fx[i] = fw[i], fx[i], fu[i]
                else:
                    if u[i] < x[i]:
                        a[i] = u[i]
                    else:
                        b[i] = u[i]
                    if fu[i] <= fw[i] or w[i] == x[i]:
                        v[i] = w[i]
                        w[i] = u[i]
                        fv[i] = fw[i]
                        fw[i] = fu[i]
                    elif fu[i] <= fv[i] or v[i] == x[i] or v[i] == w[i]:
                        v[i] = u[i]
                        fv[i] = fu[i]
        raise RuntimeError('Too many iterations in BRENT')

    # ------------------------------------------------------------------
    # generic single-parameter optimization (optParamGeneric :1283)

    def _opt_param_generic(self, model_epsilon, ll: LinkageList, n,
                           rate_number, lim_inf_s, lim_sup_s, which):
        eng = self.engine
        dev = self._device_opt_for(which, ll)
        if dev is None:
            # host path only: the device program evaluates the start
            # point itself (one fewer round trip per parameter)
            eng.evaluate(eng.tree.start, full_traversal_=True)

        start_values = np.zeros(n)
        start_lh = np.zeros(n)
        lim_inf = np.zeros(n)
        lim_sup = np.zeros(n)
        pos = 0
        for group in ll.groups:
            if not group.valid:
                continue
            for k in group.partitions:
                pm = eng.partitions[k]
                if dev is None:
                    start_lh[pos] += eng.per_partition_lh[k]
                if which == ALPHA_F:
                    lim_inf[pos] = lim_inf_s
                    lim_sup[pos] = lim_sup_s
                    start_values[pos] = pm.alpha
                elif which == RATE_F:
                    lim_inf[pos] = lim_inf_s
                    lim_sup[pos] = lim_sup_s
                    start_values[pos] = pm.subst_rates[rate_number]
                elif which == FREQ_F:
                    lim_inf[pos] = self._min_freq(k, rate_number, lim_inf_s)
                    lim_sup[pos] = self._max_freq(k, rate_number, lim_sup_s)
                    start_values[pos] = pm.freq_exponents[rate_number]
                elif which == LXRATE_F:
                    lim_inf[pos] = lim_inf_s
                    lim_sup[pos] = lim_sup_s
                    start_values[pos] = pm.gamma_rates[rate_number]
                elif which == LXWEIGHT_F:
                    lim_inf[pos] = lim_inf_s
                    lim_sup[pos] = lim_sup_s
                    start_values[pos] = pm.weight_exponents[rate_number]
                else:
                    raise AssertionError(which)
            pos += 1
        assert pos == n

        if dev is not None:
            opt, lane_of = dev
            x, end_lh, start_lh = opt.optimize(
                which, rate_number, lane_of, n, start_values, lim_inf,
                lim_sup, model_epsilon)
        else:
            a = np.clip(start_values + 0.1, lim_inf, lim_sup)
            b = np.clip(start_values - 0.1, lim_inf, lim_sup)
            c = np.zeros(n)
            fa = np.zeros(n)
            fb = np.zeros(n)
            fc = np.zeros(n)
            x = np.zeros(n)
            end_lh = np.full(n, C.UNLIKELY)

            self._brak(a, b, c, fa, fb, fc, lim_inf, lim_sup, n,
                       rate_number, which, ll)
            self._brent(a, b, c, fb, model_epsilon, x, end_lh, n, which,
                        rate_number, ll, lim_inf, lim_sup)

        pos = 0
        for group in ll.groups:
            if not group.valid:
                continue
            value = (start_values[pos] if start_lh[pos] > end_lh[pos]
                     else x[pos])
            for k in group.partitions:
                self._change_parameter(k, rate_number, value, which)
            pos += 1

    def _min_freq(self, index, which_freq, absolute_min):
        pm = self.engine.partitions[index]
        c = sum(math.exp(w) for i, w in enumerate(pm.freq_exponents)
                if i != which_freq)
        mn = (math.log(C.FREQ_MIN) + math.log(c)
              - math.log(1.0 - C.FREQ_MIN))
        return max(mn, absolute_min)

    def _max_freq(self, index, which_freq, absolute_max):
        pm = self.engine.partitions[index]
        states = pm.states
        c = sum(math.exp(w) for i, w in enumerate(pm.freq_exponents)
                if i != which_freq)
        mx = (math.log(1.0 - (states - 1) * C.FREQ_MIN) + math.log(c)
              - math.log((states - 1) * C.FREQ_MIN))
        return min(mx, absolute_max)

    # ------------------------------------------------------------------
    # per-parameter-family drivers

    def opt_rates_generic(self, model_epsilon, ll: LinkageList):
        eng = self.engine
        dna_groups = 0
        states = -1
        for g in ll.groups:
            dt = eng.partitions[g.partitions[0]].data_type
            if dt == DataType.DNA:
                states = eng.partitions[g.partitions[0]].states
                g.valid = True
                dna_groups += 1
            else:
                g.valid = False
        if dna_groups > 0:
            self._opt_rates(model_epsilon, ll, dna_groups, states)

        if self._aa_is_gtr():
            aa_groups = 0
            for g in ll.groups:
                dt = eng.partitions[g.partitions[0]].data_type
                if dt == DataType.AA:
                    states = eng.partitions[g.partitions[0]].states
                    g.valid = True
                    aa_groups += 1
                else:
                    g.valid = False
            assert aa_groups == 1
            self._opt_rates(model_epsilon, ll, aa_groups, states)

        ll.set_all_valid()

    def _aa_is_gtr(self):
        count = 0
        for pm in self.engine.partitions:
            if pm.data_type == DataType.AA:
                count += 1
                if pm.prot_model != ProtModel.GTR:
                    return False
        return count > 0

    def _opt_rates(self, model_epsilon, ll, n, states):
        num_rates = states * (states - 1) // 2 - 1
        dev = self._device_opt_for(RATE_F, ll)
        if dev is not None:
            # whole-sweep device program: all rate indices optimized and
            # applied on device, ONE host sync for the sweep
            opt, lane_of = dev
            winners = opt.optimize_rates_sweep(
                lane_of, n, num_rates, C.RATE_MIN, C.RATE_MAX,
                model_epsilon)
            pos = 0
            for group in ll.groups:
                if not group.valid:
                    continue
                for k in group.partitions:
                    pm = self.engine.partitions[k]
                    pm.subst_rates[:num_rates] = winners[:, pos]
                    self.engine.update_eigen([k])
                pos += 1
            return
        for rate_number in range(num_rates):
            self._opt_param_generic(model_epsilon, ll, n, rate_number,
                                    C.RATE_MIN, C.RATE_MAX, RATE_F)

    def opt_base_freqs(self, model_epsilon, ll: LinkageList):
        eng = self.engine
        for want in (DataType.DNA, DataType.AA, DataType.BINARY):
            count = 0
            for g in ll.groups:
                pm = eng.partitions[g.partitions[0]]
                if (pm.data_type == want
                        and pm.optimize_base_frequencies):
                    g.valid = True
                    count += 1
                else:
                    g.valid = False
            if count > 0:
                # each frequency exponent is optimized in turn
                # (optFreqs :1488)
                states = None
                for g in ll.groups:
                    if g.valid:
                        states = eng.partitions[g.partitions[0]].states
                dev = self._device_opt_for(FREQ_F, ll)
                if dev is not None:
                    # whole-sweep device program: all exponents
                    # optimized and applied on device, ONE host sync
                    opt, lane_of = dev
                    winners = opt.optimize_freqs_sweep(
                        lane_of, count, states, -1000000.0, 200.0,
                        model_epsilon)
                    pos = 0
                    for group in ll.groups:
                        if not group.valid:
                            continue
                        for k in group.partitions:
                            pm = eng.partitions[k]
                            pm.freq_exponents[:states] = winners[:, pos]
                            w = np.exp(pm.freq_exponents)
                            pm.frequencies = w / w.sum()
                            eng.update_eigen([k])
                        pos += 1
                else:
                    for rate_number in range(states):
                        self._opt_param_generic(model_epsilon, ll, count,
                                                rate_number, -1000000.0,
                                                200.0, FREQ_F)
        ll.set_all_valid()

    def opt_alphas_generic(self, model_epsilon, ll: LinkageList):
        eng = self.engine
        non_lg4x = 0
        for g in ll.groups:
            pm = eng.partitions[g.partitions[0]]
            if (pm.data_type == DataType.AA
                    and pm.prot_model == ProtModel.LG4X):
                g.valid = False
            else:
                g.valid = True
                non_lg4x += 1
        if non_lg4x > 0:
            self._opt_param_generic(model_epsilon, ll, non_lg4x, -1,
                                    C.ALPHA_MIN, C.ALPHA_MAX, ALPHA_F)

        lg4x = 0
        for g in ll.groups:
            pm = eng.partitions[g.partitions[0]]
            g.valid = (pm.data_type == DataType.AA
                       and pm.prot_model == ProtModel.LG4X)
            lg4x += int(g.valid)
        if lg4x > 0:
            self._opt_lg4x(model_epsilon, ll, lg4x)
        ll.set_all_valid()

    def _opt_lg4x(self, model_epsilon, ll, n):
        """optLG4X :1116 — the four free LG4X category rates, each followed
        by a full weight re-optimization pass."""
        for i in range(4):
            self._opt_param_generic(model_epsilon, ll, n, i,
                                    C.LG4X_RATE_MIN, C.LG4X_RATE_MAX,
                                    LXRATE_F)
            self._optimize_weights(model_epsilon, ll, n)

    def _optimize_weights(self, model_epsilon, ll, n):
        """optimizeWeights :389."""
        eng = self.engine
        eng.evaluate(eng.tree.start, full_traversal_=True)
        initial = eng.likelihood
        for i in range(4):
            self._opt_param_generic(model_epsilon, ll, n, i,
                                    -1000000.0, 200.0, LXWEIGHT_F)
        eng.evaluate(eng.tree.start, full_traversal_=True)
        assert eng.likelihood >= initial - 1e-6

    # ------------------------------------------------------------------
    # the outer modOpt loop (modOpt :2963)


    def _smooth(self, factor):
        """treeEvaluate between optimizer stages (modOpt :3032-3127);
        under -S compaction branch lengths are held fixed and the
        smoothing step is a full re-evaluation instead."""
        eng = self.engine
        if eng.compact:
            eng.evaluate(eng.tree.start, full_traversal_=True)
            return
        eng.tree_evaluate(factor)

    def mod_opt(self, likelihood_epsilon, checkpointer=None):
        eng = self.engine
        prev_ctx = eng.op_context
        eng.op_context = 'modopt:'
        try:
            return self._mod_opt(likelihood_epsilon, checkpointer)
        finally:
            eng.op_context = prev_ctx

    def _mod_opt(self, likelihood_epsilon, checkpointer=None):
        eng = self.engine
        model_epsilon = 0.0001

        unlinked = list(range(eng.n_models))
        alpha_list = init_linkage_list(unlinked)
        freq_list = init_linkage_list(unlinked)
        rate_list = init_linkage_list_gtr(eng)

        eng.tree.start = eng.tree.nodep[1]
        eng.evaluate(eng.tree.start, full_traversal_=True)

        while True:
            if checkpointer is not None:
                checkpointer()
            current = eng.likelihood

            self.opt_rates_generic(model_epsilon, rate_list)
            eng.evaluate(eng.tree.start, full_traversal_=True)

            self.auto_protein(self.auto_prot_selection)

            self._smooth(0.0625)
            eng.evaluate(eng.tree.start, full_traversal_=True)

            self.opt_base_freqs(model_epsilon, freq_list)
            eng.evaluate(eng.tree.start, full_traversal_=True)
            self._smooth(0.0625)

            if eng.is_psr:
                if self._cat_opt < 3:
                    from .rates_cat import optimize_rate_categories
                    eng.evaluate(eng.tree.start, full_traversal_=True)
                    optimize_rate_categories(eng, eng.max_categories)
                    self._cat_opt += 1
            else:
                self.opt_alphas_generic(model_epsilon, alpha_list)
                eng.evaluate(eng.tree.start, full_traversal_=True)
                self._smooth(0.1)

            self._check_tolerance(eng.likelihood, current)
            if abs(current - eng.likelihood) <= likelihood_epsilon:
                break

    def _opt_model_sweep(self, empirical_freqs: bool):
        """Score every candidate matrix for all AUTO partitions
        (optimizeModel.c optModel :2606). Returns (best_index, best_score)
        per partition."""
        eng = self.engine
        n = eng.n_models
        best_index = np.full(n, -1)
        best_score = np.full(n, C.UNLIKELY)
        from ..models.protein import AUTO_CANDIDATES
        for i, cand in enumerate(AUTO_CANDIDATES):
            for m, pm in enumerate(eng.partitions):
                if pm.prot_model == ProtModel.AUTO:
                    pm.prot_freqs = not empirical_freqs
                    assert not pm.optimize_base_frequencies
                    pm.auto_prot_model = cand
                    eng.update_eigen([m])
            eng.reset_branches()
            eng.evaluate(eng.tree.start, full_traversal_=True)
            self._smooth(0.5)
            for m, pm in enumerate(eng.partitions):
                if (pm.prot_model == ProtModel.AUTO
                        and eng.per_partition_lh[m] > best_score[m]):
                    best_score[m] = eng.per_partition_lh[m]
                    best_index[m] = i
        return best_index, best_score

    def auto_protein(self, selection_type: str = 'ml'):
        """Protein AUTO model selection (optimizeModel.c autoProtein
        :2669): score all 19 empirical matrices with fixed and with
        empirical frequencies, select per ML/BIC/AIC/AICc."""
        from ..models.protein import AUTO_CANDIDATES
        from ..search.topologies import snapshot_tree, restore_snapshot
        eng = self.engine
        autos = [m for m, pm in enumerate(eng.partitions)
                 if pm.prot_model == ProtModel.AUTO]
        if not autos:
            return

        snap = snapshot_tree(eng.tree, eng.likelihood)
        eng.evaluate(eng.tree.start, full_traversal_=True)
        start_lh = eng.likelihood
        old_index = [eng.partitions[m].auto_prot_model for m in autos]
        old_freqs = [eng.partitions[m].prot_freqs for m in autos]

        best_idx_fixed, best_lh_fixed = self._opt_model_sweep(False)
        best_idx_emp, best_lh_emp = self._opt_model_sweep(True)

        for m in autos:
            pm = eng.partitions[m]
            samples = pm.partition_weight
            free_fixed = 2.0 * eng.tree.ntips - 3
            free_emp = free_fixed + 19.0
            free_fixed += 1.0   # GAMMA alpha
            free_emp += 1.0
            lf, le = best_lh_fixed[m], best_lh_emp[m]
            if selection_type == 'ml':
                use_fixed = lf > le
            elif selection_type == 'bic':
                use_fixed = (-2 * lf + free_fixed * math.log(samples)
                             < -2 * le + free_emp * math.log(samples))
            elif selection_type == 'aic':
                use_fixed = 2 * (free_fixed - lf) < 2 * (free_emp - le)
            elif selection_type == 'aicc':
                def aicc(free, lh):
                    if abs(samples - free - 1.0) < 0.5:
                        return 0.0
                    return (2 * (free - lh)
                            + 2 * free * (free + 1.0) / (samples - free - 1.0))
                use_fixed = aicc(free_fixed, lf) < aicc(free_emp, le)
            else:
                raise ValueError(selection_type)
            if use_fixed:
                pm.auto_prot_model = AUTO_CANDIDATES[int(best_idx_fixed[m])]
                pm.prot_freqs = True
            else:
                pm.auto_prot_model = AUTO_CANDIDATES[int(best_idx_emp[m])]
                pm.prot_freqs = False
            eng.update_eigen([m])

        eng.reset_branches()
        eng.evaluate(eng.tree.start, full_traversal_=True)
        self._smooth(2.0)

        if eng.likelihood < start_lh:
            for m, oi, of in zip(autos, old_index, old_freqs):
                pm = eng.partitions[m]
                pm.auto_prot_model = oi
                pm.prot_freqs = of
                eng.update_eigen([m])
            restore_snapshot(eng.tree, snap)
            eng.evaluate(eng.tree.start, full_traversal_=True)
        assert eng.likelihood >= start_lh - 1e-6

    @staticmethod
    def _check_tolerance(l1, l2):
        if l1 < l2:
            tolerance = abs(max(l1, l2) * 1e-12)
            if abs(l1 - l2) > min(0.1, tolerance):
                raise AssertionError(
                    f'likelihood regressed in model optimization: {l1} {l2}')
