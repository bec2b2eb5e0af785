"""On-device model-parameter optimization for the accelerator path.

The host optimizer (model_opt.py) pays one device->host round trip per
bracketing/Brent probe — ~2,000 syncs per testData/49 search, the single
largest cost through a remote runtime. This module compiles the WHOLE
optParamGeneric pipeline for one parameter (reference:
examl/optimizeModel.c — optParamGeneric :1283, brakGeneric :800,
brentGeneric :582, evaluateChange :464) into ONE jitted device program:

  probe value -> rebuild the affected model tensors on device
  (models/device_model.py) -> refresh tip CLV rows -> full fused
  traversal -> per-partition root lnL -> linkage-group sums

runs inside lax.while_loop state machines that are lane-for-lane ports of
the numpy ones in model_opt.py (vectorized over linkage groups exactly
like the reference). One dispatch + one fetch per parameter instead of
~30 synchronous probes. Because linkage groups own disjoint partitions,
re-applying a frozen lane's value never perturbs another lane's
likelihood — the same property the reference's vectorization relies on.

Supported parameter types: ALPHA (Γ shape; rates from gamma_cats_dev;
LG4M too — its four eigensystems are constants), RATE (GTR
exchangeabilities; eigensystem from make_eigen_dev, the rate index a
traced argument so one compiled program serves every rate), FREQ
(base-frequency exponents, optimizeModel.c optBaseFreqs :1501: softmax
over the exponent vector feeds the same device eigensystem rebuild),
and the LG4X free parameters (optLG4X :1116): category rates and
weight exponents only rescale the CONSTANT four-matrix eigensystem
(scaleLG4X_EIGN, optimizeModel.c:341) and the rate weights, so an
LG4X probe costs two dot products and an EIGN scale on device."""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..datatypes import ProtModel, info_for
from ..models.device_model import gamma_cats_dev, make_eigen_dev
from ..traversal import full_traversal, pack_traversal

MNBRAK_GOLD = 1.618034
MNBRAK_TINY = 1.e-20
MNBRAK_GLIMIT = 100.0
BRENT_ZEPS = 1.e-5
BRENT_CGOLD = 0.3819660

ALPHA_F, RATE_F, FREQ_F, LXRATE_F, LXWEIGHT_F = 0, 1, 2, 3, 4


def _sign(a, b):
    return jnp.where(b >= 0.0, jnp.abs(a), -jnp.abs(a))


class DeviceParamOptimizer:
    """Builds and caches the per-(which, linkage-layout) device programs
    and exposes a host API mirroring (_brak + _brent)."""

    def __init__(self, engine):
        self.eng = engine

    # ------------------------------------------------------------------

    def supported(self, which, lane_of) -> bool:
        eng = self.eng
        if not eng.use_pallas or eng.is_psr:
            return False
        if which not in (ALPHA_F, RATE_F, FREQ_F, LXRATE_F,
                         LXWEIGHT_F):
            return False
        if not eng.speculation_supported():     # fused program must plan
            return False
        states = None
        for m, lane in enumerate(lane_of):
            if lane < 0:
                continue
            pm = eng.partitions[m]
            if pm.prot_model == ProtModel.LG4X:
                # LG4X rate heterogeneity is its own free-parameter set
                if which not in (LXRATE_F, LXWEIGHT_F):
                    return False
            elif pm.prot_model == ProtModel.LG4M:
                if which != ALPHA_F:
                    return False
            elif which in (LXRATE_F, LXWEIGHT_F):
                return False
            if which in (RATE_F, FREQ_F):
                if states is None:
                    states = pm.states
                elif pm.states != states:
                    # one rebuild shape per compiled program
                    return False
        return True

    # ------------------------------------------------------------------

    def _bits_matrix(self, pm):
        inf = info_for(pm.data_type)
        S = pm.states
        return np.array([[(int(v) >> s) & 1 for s in range(S)]
                         for v in inf.bit_vectors], dtype=np.float64)

    def _build(self, which, lane_of, n, sweep=False):
        eng = self.eng
        M = eng.n_models
        n_cats = eng.n_cats
        use_median = eng.use_median
        interpret = jax.default_backend() == 'cpu'
        dtype = eng.dtype

        # full-traversal shapes are fixed for the engine's tree: resolve
        # the fused plan once at build time
        entries = full_traversal(eng.tree, eng.tree.start.back)
        packed = eng._pack_fused(entries)
        plan = eng._fused_plan(packed)
        assert plan is not None
        n_rows, bws = plan
        traverse = eng._make_traverse(n_rows, bws, interpret)

        bits = {m: jnp.asarray(self._bits_matrix(eng.partitions[m]))
                for m in range(M) if lane_of[m] >= 0}
        pads = {m: eng._padded_states(m) - eng.partitions[m].states
                for m in range(M) if lane_of[m] >= 0}

        def rebuild(m, value, rn, base_m, model_m):
            gamma_m, eign_m, ei_m, ev_m, tv_m, rw_m = model_m
            if which == ALPHA_F:
                g = gamma_cats_dev(value, n_cats, use_median)
                return (g.astype(dtype), eign_m, ei_m, ev_m, tv_m, rw_m)
            rates_m, freqs_m, fexp_m, gr_m, wexp_m = base_m
            if which in (LXRATE_F, LXWEIGHT_F):
                # scaleLG4X_EIGN: the four eigensystems are constant;
                # only the 1/dot(weights, rates) EIGN scale and the rate
                # weights move (update_eigen LG4X branch / _change_parameter)
                w0 = jnp.exp(wexp_m)
                w0 = w0 / w0.sum()
                acc0 = jnp.dot(w0, gr_m)
                if which == LXRATE_F:
                    gr2 = gr_m.at[rn].set(value)
                    w2 = w0
                else:
                    wexp2 = wexp_m.at[rn].set(value)
                    w2 = jnp.exp(wexp2)
                    w2 = w2 / w2.sum()
                    gr2 = gr_m
                acc2 = jnp.dot(w2, gr2)
                eign2 = eign_m * (acc0 / acc2).astype(eign_m.dtype)
                return (gr2.astype(dtype), eign2, ei_m, ev_m, tv_m,
                        w2.astype(dtype))
            if which == FREQ_F:
                # exponent-space proposal -> softmax frequencies
                # (_change_parameter FREQ_F / optimizeModel.c:431-449)
                w = jnp.exp(fexp_m.at[rn].set(value))
                freqs_m = w / w.sum()
                rates2 = rates_m
            else:
                rates2 = rates_m.at[rn].set(value)
            del gr_m, wexp_m
            EIGN, EV, EI, tv = make_eigen_dev(rates2, freqs_m, bits[m])
            p = pads[m]
            EIGN = jnp.pad(EIGN, (0, p))
            EV = jnp.pad(EV, ((0, p), (0, p)))
            EI = jnp.pad(EI, ((0, p), (0, p)))
            tv = jnp.pad(tv, ((0, 0), (0, p)))

            def tile(a):
                return jnp.broadcast_to(a[None], (n_cats,) + a.shape)

            return (gamma_m, tile(EIGN).astype(dtype),
                    tile(EI).astype(dtype), tile(EV).astype(dtype),
                    tile(tv).astype(dtype), rw_m)

        def make_f(ev_args):
            (jpw, jqw, jrw, jtw, lzqw, lzrw, subw, zqrw, nexw, p_row,
             q_row, qz, codes, rate_weights, wgts, rn, base,
             model) = ev_args
            gammas, eigns, eis, evs, tipvecs = model

            def f(values, clvs, scalers):
                g2 = list(gammas)
                ei2 = list(eigns)
                eei2 = list(eis)
                ev2 = list(evs)
                tv2 = list(tipvecs)
                rw2 = list(rate_weights)
                for m in range(M):
                    lane = lane_of[m]
                    if lane < 0:
                        continue
                    model_m = (gammas[m], eigns[m], eis[m], evs[m],
                               tipvecs[m], rate_weights[m])
                    out = rebuild(m, values[lane], rn, base[m], model_m)
                    g2[m], ei2[m], eei2[m], ev2[m], tv2[m], rw2[m] = out
                if which in (RATE_F, FREQ_F):
                    # stacked groups refresh every member (non-lane
                    # members rewrite identical tip rows — a no-op)
                    clvs = eng._g_tip_rows(
                        clvs, codes, tuple(tv2), interpret,
                        refresh=[lane_of[m] >= 0 for m in range(M)])
                clvs, scalers = traverse(clvs, scalers,
                                         jnp.ones(M, bool), jpw, jqw,
                                         jrw, jtw, lzqw, lzrw, subw,
                                         zqrw, nexw, tuple(g2),
                                         tuple(ei2), tuple(eei2),
                                         tuple(ev2))
                lhs = eng._g_evaluate_all(
                    clvs, scalers, tuple(g2), tuple(ei2), tuple(rw2),
                    wgts, p_row, q_row, qz, interpret,
                    only=[lane_of[m] >= 0 for m in range(M)])
                res = jnp.zeros(n, values.dtype)
                for m in range(M):
                    lane = lane_of[m]
                    if lane < 0:
                        continue
                    res = res.at[lane].add(-lhs[m].astype(values.dtype))
                return res, clvs, scalers

            return f

        # ---------------- brakGeneric (optimizeModel.c:800) ------------

        def brak(f, ax, bx, lim_inf, lim_sup, clvs, scalers):
            def clamp(x):
                return jnp.clip(x, lim_inf, lim_sup)

            ax = clamp(ax)
            fa, clvs, scalers = f(ax, clvs, scalers)
            bx = clamp(bx)
            fb, clvs, scalers = f(bx, clvs, scalers)
            sw = fb > fa
            ax, bx = jnp.where(sw, bx, ax), jnp.where(sw, ax, bx)
            fa, fb = jnp.where(sw, fb, fa), jnp.where(sw, fa, fb)
            cx = clamp(bx + MNBRAK_GOLD * (bx - ax))
            fc, clvs, scalers = f(cx, clvs, scalers)
            param = cx

            def cond(st):
                return ~jnp.all(st[0])

            def body(st):
                (converged, state, ax, bx, cx, fa, fb, fc, param, u,
                 clvs, scalers) = st
                act = ~converged
                s0 = act & (state == 0)
                converged = converged | (s0 & ~(fb > fc))
                work = s0 & (fb > fc)
                ax = jnp.where(work, clamp(ax), ax)
                bx = jnp.where(work, clamp(bx), bx)
                cx = jnp.where(work, clamp(cx), cx)
                r_ = (bx - ax) * (fb - fc)
                q_ = (bx - cx) * (fb - fa)
                u0 = bx - ((bx - cx) * q_ - (bx - ax) * r_) / (
                    2.0 * _sign(jnp.maximum(jnp.abs(q_ - r_),
                                            MNBRAK_TINY), q_ - r_))
                ul0 = clamp(bx + MNBRAK_GLIMIT * (cx - bx))
                u0 = clamp(u0)
                c1 = (bx - u0) * (u0 - cx) > 0.0
                c2 = ~c1 & ((cx - u0) * (u0 - ul0) > 0.0)
                c3 = ~c1 & ~c2 & ((u0 - ul0) * (ul0 - cx) >= 0.0)
                c4 = ~c1 & ~c2 & ~c3
                u_w = jnp.where(c3, ul0, u0)
                u_w = jnp.where(c4, clamp(cx + MNBRAK_GOLD * (cx - bx)),
                                u_w)
                param = jnp.where(work, u_w, param)
                u = jnp.where(work, u_w, u)
                end = jnp.where(
                    work, jnp.where(c1, 1, jnp.where(c2, 2, 0)),
                    jnp.where(act & (state == 2), 3, 0)).astype(jnp.int32)

                fu, clvs, scalers = f(param, clvs, scalers)

                a2 = ~converged
                e0 = a2 & (end == 0)
                e1 = a2 & (end == 1)
                e2 = a2 & (end == 2)
                e3 = a2 & (end == 3)
                e1_lo = e1 & (fu < fc)
                e1_hi = e1 & ~e1_lo & (fu > fb)
                e1_more = e1 & ~e1_lo & ~e1_hi
                e2_more = e2 & (fu < fc)
                shift = e0 | (e2 & ~e2_more) | e3
                # e3 pre-step (host: fb,fc,fu = fc,temp,temp before shift)
                fb_pre = jnp.where(e3, fc, fb)
                fc_pre = jnp.where(e3, fu, fc)

                ax_n = jnp.where(e1_lo, bx, ax)
                bx_n = jnp.where(e1_lo, u, bx)
                fa_n = jnp.where(e1_lo, fb, fa)
                fb_n = jnp.where(e1_lo, fu, fb_pre)
                cx_n = jnp.where(e1_hi, u, cx)
                fc_n = jnp.where(e1_hi, fu, fc_pre)
                bx_n = jnp.where(e2_more, cx, bx_n)
                cx_n = jnp.where(e2_more, u, cx_n)
                fb_n = jnp.where(e2_more, fc, fb_n)
                fc_n = jnp.where(e2_more, fu, fc_n)
                ax_n = jnp.where(shift, bx, ax_n)
                bx_n = jnp.where(shift, cx, bx_n)
                cx_n = jnp.where(shift, u, cx_n)
                fa_n = jnp.where(shift, fb_pre, fa_n)
                fb_n = jnp.where(shift, fc_pre, fb_n)
                fc_n = jnp.where(shift, fu, fc_n)

                # golden continuations: e1 clamps AND re-aims param; e2
                # only advances u — param keeps re-evaluating the stale
                # probe (reference quirk, optimizeModel.c:1059-1072)
                gold = cx_n + MNBRAK_GOLD * (cx_n - bx_n)
                u = jnp.where(e1_more, clamp(gold),
                              jnp.where(e2_more, gold, u))
                param = jnp.where(e1_more, clamp(gold), param)
                converged = converged | e1_lo | e1_hi
                state_n = jnp.where(
                    e1_more, 1, jnp.where(e2_more, 2, 0)).astype(jnp.int32)
                state = jnp.where(a2, state_n, state)
                return (converged, state, ax_n, bx_n, cx_n, fa_n, fb_n,
                        fc_n, param, u, clvs, scalers)

            st = (jnp.zeros(n, bool), jnp.zeros(n, jnp.int32), ax, bx,
                  cx, fa, fb, fc, param, jnp.zeros_like(ax), clvs,
                  scalers)
            st = jax.lax.while_loop(cond, body, st)
            ax, bx, cx, fa, fb, fc = st[2:8]
            return (clamp(ax), clamp(bx), clamp(cx), fa, fb, fc, st[10],
                    st[11])

        # ---------------- brentGeneric (optimizeModel.c:582) ------------

        def brent(f, ax, bx, cx, fb0, tol, lim_inf, lim_sup, clvs,
                  scalers):
            a = jnp.minimum(ax, cx)
            b = jnp.maximum(ax, cx)
            zero = jnp.zeros_like(ax)

            def cond(st):
                return (st[0] < C.ITMAX) & ~jnp.all(st[1])

            def body(st):
                (it, converged, a, b, x, w, v, fx, fw, fv, d, e, xmin,
                 result, clvs, scalers) = st
                act = ~converged
                xm = 0.5 * (a + b)
                tol1 = tol * jnp.abs(x) + BRENT_ZEPS
                tol2 = 2.0 * tol1
                done = act & (jnp.abs(x - xm) <= tol2 - 0.5 * (b - a))
                result = jnp.where(done, -fx, result)
                xmin = jnp.where(done, x, xmin)
                converged = converged | done
                act = act & ~done

                use_para = jnp.abs(e) > tol1
                r_ = (x - w) * (fx - fv)
                q_ = (x - v) * (fx - fw)
                p_ = (x - v) * q_ - (x - w) * r_
                q2 = 2.0 * (q_ - r_)
                p_ = jnp.where(q2 > 0.0, -p_, p_)
                q2 = jnp.abs(q2)
                etemp = e
                e_para = d
                bad = ((jnp.abs(p_) >= jnp.abs(0.5 * q2 * etemp))
                       | (p_ <= q2 * (a - x)) | (p_ >= q2 * (b - x)))
                e_gold = jnp.where(x >= xm, a - x, b - x)
                d_gold = BRENT_CGOLD * e_gold
                d_para = p_ / jnp.where(q2 == 0.0, 1.0, q2)
                u_para = x + d_para
                d_para = jnp.where(
                    (u_para - a < tol2) | (b - u_para < tol2),
                    _sign(tol1, xm - x), d_para)
                para = use_para & ~bad
                d_n = jnp.where(para, d_para, d_gold)
                e_n = jnp.where(para, e_para, e_gold)
                u = jnp.where(jnp.abs(d_n) >= tol1, x + d_n,
                              x + _sign(tol1, d_n))
                d = jnp.where(act, d_n, d)
                e = jnp.where(act, e_n, e)
                u = jnp.where(act, u, x)        # frozen lanes re-probe x

                fu, clvs, scalers = f(u, clvs, scalers)

                better = act & (fu <= fx)
                a = jnp.where(better & (u >= x), x, a)
                b = jnp.where(better & (u < x), x, b)
                worse = act & ~better
                a = jnp.where(worse & (u < x), u, a)
                b = jnp.where(worse & (u >= x), u, b)
                v_n = jnp.where(better, w, v)
                w_n = jnp.where(better, x, w)
                x_n = jnp.where(better, u, x)
                fv_n = jnp.where(better, fw, fv)
                fw_n = jnp.where(better, fx, fw)
                fx_n = jnp.where(better, fu, fx)
                wcase = worse & ((fu <= fw) | (w == x))
                v_n = jnp.where(wcase, w_n, v_n)
                w_n = jnp.where(wcase, u, w_n)
                fv_n = jnp.where(wcase, fw_n, fv_n)
                fw_n = jnp.where(wcase, fu, fw_n)
                vcase = (worse & ~wcase
                         & ((fu <= fv) | (v == x) | (v == w)))
                v_n = jnp.where(vcase, u, v_n)
                fv_n = jnp.where(vcase, fu, fv_n)
                return (it + 1, converged, a, b, x_n, w_n, v_n, fx_n,
                        fw_n, fv_n, d, e, xmin, result, clvs, scalers)

            st = (jnp.asarray(0, jnp.int32), jnp.zeros(n, bool), a, b,
                  bx, bx, bx, fb0, fb0, fb0, zero, zero,
                  jnp.zeros_like(ax),
                  # UNLIKELY (-1e300) overflows f32; the dtype's own min
                  # finite value is the same "worst possible lnL" sentinel
                  jnp.full(n, jnp.finfo(ax.dtype).min, ax.dtype),
                  clvs, scalers)
            st = jax.lax.while_loop(cond, body, st)
            return st[12], st[13], st[1], st[14], st[15]

        def run(clvs, scalers, trav_desc, p_row, q_row, qz, codes, base,
                rn, sv, av, bv, lim_inf, lim_sup, tol, model,
                rate_weights, wgts):
            f = make_f(tuple(trav_desc) + (p_row, q_row, qz, codes,
                                           rate_weights, wgts, rn, base,
                                           model))
            # start-point lnL on device (the host path's entry
            # evaluateGeneric, optimizeModel.c:1385): the winner guard's
            # reference value, computed with the SAME arithmetic as the
            # probes so no separate host-side evaluate round trip is
            # needed
            res0, clvs, scalers = f(sv, clvs, scalers)
            ax, bx, cx, fa, fb, fc, clvs, scalers = brak(
                f, av, bv, lim_inf, lim_sup, clvs, scalers)
            xmin, result, conv, clvs, scalers = brent(
                f, ax, bx, cx, fb, tol, lim_inf, lim_sup, clvs, scalers)
            return clvs, scalers, xmin, result, conv, -res0

        if not sweep:
            return jax.jit(run, donate_argnums=(0, 1))

        # representative partition per lane (value source for the
        # sweep's per-rate start points)
        rep = [0] * n
        for m in range(M):
            if lane_of[m] >= 0:
                rep[lane_of[m]] = m

        # which parameter-vector component of `base` the sweep evolves:
        # RATE_F -> subst_rates (base[m][0]); FREQ_F -> the frequency
        # exponents (base[m][2])
        state_idx = {RATE_F: 0, FREQ_F: 2}[which]
        # FREQ limits depend on the OTHER exponents' current values
        # (optBaseFreqs via _min_freq/_max_freq, optimizeModel.c:1488)
        # and must therefore be recomputed on device per index
        rep_states = (eng.partitions[rep[0]].states
                      if which == FREQ_F else 0)

        def run_sweep(clvs, scalers, trav_desc, p_row, q_row, qz, codes,
                      base, num_rates, lim_inf0, lim_sup0, tol, model,
                      rate_weights, wgts):
            """A WHOLE parameter-family sweep (optRatesGeneric
            :1634 / optBaseFreqs :1501) in one program: lax.fori over the
            parameter index, each step evaluating the start point,
            bracketing, Brent-optimizing and applying the guarded winner
            to the device-resident parameter state before the next index
            sees it."""
            st0 = tuple(base[m][state_idx] for m in range(M))
            Rmax = max(st0[rep[l]].shape[0] for l in range(n))
            fdt = lim_inf0.dtype

            def body(rn, carry):
                clvs, scalers, st, winners, endl, conv = carry
                basei = tuple(base[m][:state_idx] + (st[m],)
                              + base[m][state_idx + 1:] for m in range(M))
                f = make_f(tuple(trav_desc) + (p_row, q_row, qz, codes,
                                               rate_weights, wgts, rn,
                                               basei, model))
                v0 = jnp.stack([st[rep[l]][rn].astype(fdt)
                                for l in range(n)])
                if which == FREQ_F:
                    # per-index exponent bounds from the rep partition's
                    # current exponents (host _min_freq/_max_freq)
                    fm = C.FREQ_MIN
                    S = rep_states
                    c = jnp.stack([
                        jnp.exp(st[rep[l]]).sum()
                        - jnp.exp(st[rep[l]][rn])
                        for l in range(n)]).astype(fdt)
                    logc = jnp.log(c)
                    lim_inf = jnp.maximum(
                        math.log(fm) + logc - math.log(1.0 - fm),
                        lim_inf0)
                    lim_sup = jnp.minimum(
                        math.log(1.0 - (S - 1) * fm) + logc
                        - math.log((S - 1) * fm), lim_sup0)
                else:
                    lim_inf, lim_sup = lim_inf0, lim_sup0

                def clampv(x):
                    return jnp.clip(x, lim_inf, lim_sup)

                res0, clvs, scalers = f(v0, clvs, scalers)
                start_lh = -res0
                ax, bx, cx, fa, fb, fc, clvs, scalers = brak(
                    f, clampv(v0 + 0.1), clampv(v0 - 0.1), lim_inf,
                    lim_sup, clvs, scalers)
                xmin, result, cfl, clvs, scalers = brent(
                    f, ax, bx, cx, fb, tol, lim_inf, lim_sup, clvs,
                    scalers)
                w = jnp.where(start_lh > result, v0, xmin)
                st = tuple(
                    st[m].at[rn].set(w[lane_of[m]].astype(st[m].dtype))
                    if lane_of[m] >= 0 else st[m] for m in range(M))
                winners = winners.at[rn].set(w)
                endl = endl.at[rn].set(jnp.maximum(start_lh, result))
                conv = conv & jnp.all(cfl)
                return (clvs, scalers, st, winners, endl, conv)

            carry = (clvs, scalers, st0,
                     jnp.zeros((Rmax, n), fdt), jnp.zeros((Rmax, n), fdt),
                     jnp.asarray(True))
            clvs, scalers, st, winners, endl, conv = jax.lax.fori_loop(
                0, num_rates, body, carry)
            return clvs, scalers, winners, endl, conv

        return jax.jit(run_sweep, donate_argnums=(0, 1))

    # ------------------------------------------------------------------

    def optimize(self, which, rate_number, lane_of, n, start_values,
                 lim_inf, lim_sup, tol):
        """Run brak+brent for one parameter on device. Returns
        (xmin [n], end_lh [n], start_lh [n]) with ONE host sync —
        start_lh is the start-point lnL per lane, computed in-program so
        callers need no separate entry evaluate. The engine's CLV
        buffers afterwards hold the state of the LAST probe — callers
        must re-apply the winning values and re-evaluate (the host
        path's _opt_param_generic epilogue does exactly that)."""
        eng = self.eng
        key = ('devopt', which, tuple(lane_of), n)
        fn = eng._jit_cache.get(key)
        if fn is None:
            fn = self._build(which, lane_of, n)
            eng._jit_cache[key] = fn
            fn = eng._jit_cache[key]

        tr = eng.tree
        p = tr.start
        q = p.back
        entries = full_traversal(tr, q)
        packed = eng._pack_fused(entries)
        trav_desc = eng._trav_args(packed)[:9]
        base = tuple(
            (jnp.asarray(eng.partitions[m].subst_rates),
             jnp.asarray(eng.partitions[m].frequencies),
             jnp.asarray(eng.partitions[m].freq_exponents),
             jnp.asarray(eng.partitions[m].gamma_rates),
             jnp.asarray(eng.partitions[m].weight_exponents))
            for m in range(eng.n_models))
        model = (tuple(eng.d_gamma), tuple(eng.d_EIGN), tuple(eng.d_EI),
                 tuple(eng.d_EV), tuple(eng.d_tipvec))
        fdtype = (np.float64 if jax.config.jax_enable_x64
                  else np.float32)
        sv = np.asarray(start_values, fdtype)
        clvs, scalers, xmin, result, conv, start0 = fn(
            tuple(eng.clv), tuple(eng.scaler), trav_desc,
            jnp.asarray([p.number], jnp.int32),
            jnp.asarray([q.number], jnp.int32),
            jnp.asarray(np.array(q.z), dtype=eng.dtype),
            tuple(eng.g_codes), base,
            jnp.asarray(rate_number, jnp.int32),
            jnp.asarray(sv, fdtype),
            jnp.asarray(np.clip(sv + 0.1, lim_inf, lim_sup), fdtype),
            jnp.asarray(np.clip(sv - 0.1, lim_inf, lim_sup), fdtype),
            jnp.asarray(lim_inf, fdtype), jnp.asarray(lim_sup, fdtype),
            jnp.asarray(tol, fdtype), model, tuple(eng.d_rate_weights),
            tuple(eng.g_wgt))
        eng.clv = list(clvs)
        eng.scaler = list(scalers)
        xmin, result, conv, start0 = eng.fetch(
            [xmin, result, conv, start0], kind='devopt_param')
        if not bool(np.all(conv)):
            raise RuntimeError('Too many iterations in BRENT')
        return (np.asarray(xmin, np.float64),
                np.asarray(result, np.float64),
                np.asarray(start0, np.float64))

    def optimize_rates_sweep(self, lane_of, n, num_rates, lim_inf,
                             lim_sup, tol):
        """Run the whole optRatesGeneric sweep (all num_rates rate
        indices, winners applied on device between rates) with ONE host
        sync. Returns the guarded winners [num_rates, n]."""
        return self._optimize_sweep(RATE_F, lane_of, n, num_rates,
                                    lim_inf, lim_sup, tol)

    def optimize_freqs_sweep(self, lane_of, n, states, lim_inf, lim_sup,
                             tol):
        """Run the whole optBaseFreqs exponent sweep (all `states`
        frequency exponents, winners applied on device between indices,
        per-index bounds from the evolving exponents) with ONE host
        sync. Returns the guarded winners [states, n]."""
        return self._optimize_sweep(FREQ_F, lane_of, n, states,
                                    lim_inf, lim_sup, tol)

    def _optimize_sweep(self, which, lane_of, n, num_rates, lim_inf,
                        lim_sup, tol):
        eng = self.eng
        key = ('devoptsweep', which, tuple(lane_of), n)
        fn = eng._jit_cache.get(key)
        if fn is None:
            fn = self._build(which, lane_of, n, sweep=True)
            eng._jit_cache[key] = fn
            fn = eng._jit_cache[key]

        tr = eng.tree
        p = tr.start
        q = p.back
        entries = full_traversal(tr, q)
        packed = eng._pack_fused(entries)
        trav_desc = eng._trav_args(packed)[:9]
        fdtype = (np.float64 if jax.config.jax_enable_x64
                  else np.float32)
        base = tuple(
            (jnp.asarray(eng.partitions[m].subst_rates, fdtype),
             jnp.asarray(eng.partitions[m].frequencies, fdtype),
             jnp.asarray(eng.partitions[m].freq_exponents, fdtype),
             jnp.asarray(eng.partitions[m].gamma_rates, fdtype),
             jnp.asarray(eng.partitions[m].weight_exponents, fdtype))
            for m in range(eng.n_models))
        model = (tuple(eng.d_gamma), tuple(eng.d_EIGN), tuple(eng.d_EI),
                 tuple(eng.d_EV), tuple(eng.d_tipvec))
        clvs, scalers, winners, endl, conv = fn(
            tuple(eng.clv), tuple(eng.scaler), trav_desc,
            jnp.asarray([p.number], jnp.int32),
            jnp.asarray([q.number], jnp.int32),
            jnp.asarray(np.array(q.z), dtype=eng.dtype),
            tuple(eng.g_codes), base,
            jnp.asarray(num_rates, jnp.int32),
            jnp.asarray(np.full(n, lim_inf), fdtype),
            jnp.asarray(np.full(n, lim_sup), fdtype),
            jnp.asarray(tol, fdtype), model, tuple(eng.d_rate_weights),
            tuple(eng.g_wgt))
        eng.clv = list(clvs)
        eng.scaler = list(scalers)
        winners, conv = eng.fetch([winners, conv], kind='devopt_sweep')
        if not bool(np.all(conv)):
            raise RuntimeError('Too many iterations in BRENT')
        return np.asarray(winners, np.float64)[:num_rates]
