"""PSR (per-site rate) category optimization.

Port of the reference CAT pipeline (reference: examl/optimizeModel.c
optimizeRateCategories :2403, optRateCatPthreads :1792,
categorizeTheRates :2171, categorizePartition :1690, updatePerSiteRates
:2060, checkPerSiteRates :1997), with one structural change: the per-site
1-D rate hill climb runs *vectorized across all sites simultaneously* on
the device (each probe step is one CLV traversal with per-site rates)
instead of one site at a time through evaluatePartialGeneric.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..engine import LikelihoodEngine


def _vectorized_rate_climb(eng: LikelihoodEngine, lower_spacing,
                           upper_spacing):
    """optRateCatPthreads, all sites at once. Updates eng.patrat/lhs.
    Per-site likelihoods are pattern-weight scaled, exactly like
    evaluatePartialGeneric's `term * w` (evaluatePartialGenericSpecial.c
    :249) — the weight matters for the convergence epsilon here and for
    the category ranking later."""
    epsilon = 0.00001
    wgts = [eng.host_sites(eng.wgts_i[m]).astype(np.float64)
            for m in range(eng.n_models)]

    def weighted_lnl(rates):
        vals = eng.psr_per_site_lnl(rates)
        return [v * w for v, w in zip(vals, wgts)]

    init_rates = [p.copy() for p in eng.patrat]
    init_lnl = weighted_lnl(init_rates)

    best_rate = [r.copy() for r in init_rates]
    best_lnl = [l.copy() for l in init_lnl]

    for direction, spacing in ((-1.0, lower_spacing), (+1.0, upper_spacing)):
        side_rate = [r.copy() for r in init_rates]
        side_lnl = [l.copy() for l in init_lnl]
        active = [np.ones(len(r), dtype=bool) for r in init_rates]
        k = 1
        while True:
            cand = [r + direction * k * spacing for r in init_rates]
            if direction < 0:
                for m in range(eng.n_models):
                    active[m] &= cand[m] > 0.0001
            if not any(a.any() for a in active):
                break
            probe = [np.where(active[m], cand[m], side_rate[m])
                     for m in range(eng.n_models)]
            vals = weighted_lnl(probe)
            for m in range(eng.n_models):
                better = (active[m] & (vals[m] > side_lnl[m])
                          & (np.abs(side_lnl[m] - vals[m]) > epsilon))
                side_lnl[m] = np.where(better, vals[m], side_lnl[m])
                side_rate[m] = np.where(better, cand[m], side_rate[m])
                active[m] = better
            k += 1
            if k > 10000:
                break
        for m in range(eng.n_models):
            improved = side_lnl[m] > best_lnl[m]
            best_lnl[m] = np.where(improved, side_lnl[m], best_lnl[m])
            best_rate[m] = np.where(improved, side_rate[m], best_rate[m])

    for m in range(eng.n_models):
        improved = best_lnl[m] > init_lnl[m]
        eng.patrat[m] = np.where(improved, best_rate[m], init_rates[m])
        eng.lhs[m] = np.where(improved, best_lnl[m], init_lnl[m])


def _categorize_partition(rates_sorted, patrat, width):
    """categorizePartition :1690: assign each site the closest category.
    Vectorized over sites: [w, n_cats] distance table; first-within-0.001
    (argmax over the bool mask = first True) else nearest (argmin = first
    minimum), both matching the reference's scan order."""
    diffs = np.abs(patrat[:, None] - rates_sorted[None, :])
    close = diffs < 0.001
    first_close = np.argmax(close, axis=1)
    return np.where(close.any(axis=1), first_close,
                    np.argmin(diffs, axis=1)).astype(np.int32)


def _merge_rate_clusters(patrat, lnls):
    """The categorizeTheRates :2188-2216 merge loop, vectorized.

    Sequential semantics: scan sites in order; a site's rate joins the
    FIRST existing cluster representative within 0.001, else becomes a new
    representative. Equivalent vectorized form: dedupe to unique values in
    first-appearance order (all occurrences of one value always land on
    the same representative — the leader list only grows), then one
    assignment round per leader: all still-unassigned values within 0.001
    of the round's leader join it (a value unassigned after leader j
    cannot match any earlier leader, so "first match" holds). Cluster
    likelihoods accumulate in site order via np.add.at, preserving the
    reference's float summation order."""
    vals, first_idx, inverse = np.unique(patrat, return_index=True,
                                         return_inverse=True)
    order = np.argsort(first_idx, kind='stable')
    rank = np.empty(order.size, dtype=np.int64)
    rank[order] = np.arange(order.size)
    uvals = vals[order]                      # first-appearance order
    uidx = rank[inverse]                     # site -> unique-value index

    leader_of = np.full(uvals.size, -1, dtype=np.int64)
    leaders: List[float] = []
    while True:
        unassigned = np.flatnonzero(leader_of < 0)
        if unassigned.size == 0:
            break
        u = uvals[unassigned[0]]
        grab = unassigned[np.abs(uvals[unassigned] - u) < 0.001]
        leader_of[grab] = len(leaders)
        leaders.append(u)

    rc_rates = np.asarray(leaders)
    rc_acc = np.zeros(rc_rates.size)
    np.add.at(rc_acc, leader_of[uidx], lnls)
    return rc_rates, rc_acc


def _categorize_the_rates(eng: LikelihoodEngine, max_categories):
    """categorizeTheRates :2171 (single-host: the global gather is a no-op
    beyond concatenating the partitions' local arrays)."""
    for m in range(eng.n_models):
        w = eng.real_widths[m]
        patrat = eng.patrat[m][:w]
        lnls = eng.lhs[m][:w]

        rc_rates, rc_acc = _merge_rate_clusters(patrat, lnls)

        order = np.argsort(rc_acc, kind='stable')
        rates_sorted = rc_rates[order]
        n_cats = min(len(rc_rates), max_categories)
        rates_kept = rates_sorted[:n_cats]

        cats = np.zeros(eng.widths[m], dtype=np.int32)
        cats[:w] = _categorize_partition(rates_kept, patrat, w)
        eng.set_psr_state(m, num_categories=n_cats,
                          per_site_rates=rates_kept, rate_category=cats)


def update_per_site_rates(eng: LikelihoodEngine):
    """Rescale rates so the (weighted) mean rate is 1
    (updatePerSiteRates :2060)."""
    wsum = np.zeros(eng.n_models)
    wrate = np.zeros(eng.n_models)
    for m in range(eng.n_models):
        w = eng.real_widths[m]
        wgt = eng.host_sites(eng.wgts_i[m])[:w].astype(np.float64)
        rates = eng.psr_rates[m][eng.rate_category[m][:w]]
        wsum[m] = wgt.sum()
        wrate[m] = (wgt * rates).sum()

    if eng.num_branches > 1:
        for m in range(eng.n_models):
            scaler = wsum[m] / wrate[m]
            eng.set_psr_state(m, per_site_rates=(
                eng.psr_rates[m][:eng.num_categories[m]] * scaler))
    else:
        scaler = wsum.sum() / wrate.sum()
        for m in range(eng.n_models):
            eng.set_psr_state(m, per_site_rates=(
                eng.psr_rates[m][:eng.num_categories[m]] * scaler))
    check_per_site_rates(eng)


def check_per_site_rates(eng: LikelihoodEngine):
    """Mean-rate-one invariant (checkPerSiteRates :1997)."""
    acc_rat = 0.0
    acc_wgt = 0.0
    per_part = []
    for m in range(eng.n_models):
        w = eng.real_widths[m]
        wgt = eng.host_sites(eng.wgts_i[m])[:w].astype(np.float64)
        rates = eng.psr_rates[m][eng.rate_category[m][:w]]
        per_part.append((wgt * rates).sum() / wgt.sum())
        acc_rat += (wgt * rates).sum()
        acc_wgt += wgt.sum()
    if eng.num_branches > 1:
        for r in per_part:
            assert abs(r - 1.0) < 1e-5
    else:
        assert abs(acc_rat / acc_wgt - 1.0) < 1e-5


def optimize_rate_categories(eng: LikelihoodEngine, max_categories=25):
    """The full PSR cycle (optimizeRateCategories :2403)."""
    assert eng.is_psr
    if max_categories == 1:
        return

    inv = eng.optimize_rate_category_invocations
    if inv == 1:
        lower_spacing = 0.5 / inv
        upper_spacing = 1.0 / inv
    else:
        lower_spacing = 0.05 / inv
        upper_spacing = 0.1 / inv
    lower_spacing = max(lower_spacing, 0.001)
    upper_spacing = max(upper_spacing, 0.001)
    eng.optimize_rate_category_invocations += 1

    initial_lh = eng.evaluate(eng.tree.start, full_traversal_=True)

    backup = [(eng.num_categories[m], eng.psr_rates[m].copy(),
               eng.rate_category[m].copy(), eng.patrat[m].copy())
              for m in range(eng.n_models)]

    _vectorized_rate_climb(eng, lower_spacing, upper_spacing)
    _categorize_the_rates(eng, max_categories)
    update_per_site_rates(eng)

    lnl = eng.evaluate(eng.tree.start, full_traversal_=True)
    if lnl < initial_lh:
        for m, (nc, rates, cats, patrat) in enumerate(backup):
            eng.patrat[m] = patrat
            eng.set_psr_state(m, num_categories=nc,
                              per_site_rates=rates[:nc], rate_category=cats)
        check_per_site_rates(eng)
        eng.evaluate(eng.tree.start, full_traversal_=True)
