"""Benchmark: likelihood-kernel throughput on one chip.

Primary metric (unchanged across rounds): CLV-update throughput of the
fused whole-traversal DNA GTR+GAMMA wave (newview over every inner node
of a random 64-taxon tree, 65536 sites, f32) — the engine's hot kernel.
Baseline: the reference's AVX build does 33.9M CLV site-updates/s/core on
this machine (642 patterns x 47 nodes x 200 full-traversal evaluations in
0.178 s, f64; instrumented build, see BASELINE.md). vs_baseline is the
ratio against that per-core number; the round target is >= 5.

Extra rows (VERDICT r2 weak #2: the bench was one synthetic shape):
20-state (AA) newview, root evaluate, NR derivatives, and the
partition-stacked evaluate — each reported as median site-updates/s (or
site-terms/s for reductions) over >= 5 repetitions with relative spread,
so tunnel noise is visible instead of silently folded into a best-of.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "spread", "rows": {...}}
"""
import json
import statistics
import sys
import time

import numpy as np

REF_AVX_UPDATES_PER_SEC = 33.9e6
# AA per-core reference (VERDICT r3 weak #3): instrumented AVX build,
# testData/140 full-traversal evaluate, 1059 patterns x 138 inner nodes
# x 20 iters in 1.31 s (lnL matches the golden -129959.350016)
REF_AVX_AA_UPDATES_PER_SEC = 2.23e6

N_TAXA = 64
SITES = 1 << 16
ITERS = 60
REPS = 5


def _measure(step, sync, iters, reps):
    """Median + relative spread of `iters` pipelined steps, `reps` times.
    One value fetch per repetition is the only rigorous sync through the
    device tunnel (block_until_ready under-reports; BASELINE.md r2)."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            step()
        sync()
        times.append(time.time() - t0)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med > 0 else 0.0
    return med, spread


def main():
    import os
    os.makedirs('/root/repo/.jax_cache', exist_ok=True)
    import jax
    # the axon remote-compile path is slow for large XLA programs; persist
    # compiled executables so repeat runs start instantly
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    import jax.numpy as jnp
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import _synthetic
    from examl_tpu.kernels import pallas_newview as PK

    interpret = jax.default_backend() == 'cpu'
    global ITERS, REPS
    if interpret:
        ITERS, REPS = 2, 3          # off-hardware smoke run only
    rows_out = {}

    args, consts, level_args = _synthetic(n_taxa=N_TAXA, sites=SITES,
                                          dtype=jnp.float32)
    a = args
    # folded Pallas layout: [rows, C*S, W] CLVs, [rows, W] counters
    rows, C_, S_, W_ = a['clv'].shape
    a['clv'] = a['clv'].reshape(rows, C_ * S_, W_)
    a['scaler'] = a['scaler'][:, :1, :]
    K = C_ * S_

    # ---- primary row: fused DNA GAMMA whole-traversal wave -------------
    jp = a['p_idx'].astype(jnp.int32)
    jq = a['q_idx'].astype(jnp.int32)
    jr = a['r_idx'].astype(jnp.int32)
    jt = a['tip_tip'].astype(jnp.int32)
    lzq = jnp.log(jnp.maximum(a['qz'], 1e-15)).astype(jnp.float32)
    lzr = jnp.log(jnp.maximum(a['rz'], 1e-15)).astype(jnp.float32)
    lam = PK.fold_lam(a['eign'], a['gamma']).astype(jnp.float32)[None, :]
    ei_bd = PK.blockdiag(a['ei']).astype(jnp.float32)
    ev_bd = PK.blockdiag(a['ev']).astype(jnp.float32)
    n_real = int(np.sum(np.asarray(a['p_idx']) != rows - 1))

    # VMEM plan (engine._fused_plan): rows*(C*S+1)*bw*4*2 <= ~12MB
    fn = jax.jit(PK.traversal_fused_pallas,
                 static_argnames=('n_exec', 'n_rows', 'block_w', 'group',
                                  'min_scale', 'inv_min_scale', 'interpret'),
                 donate_argnums=(0, 1))

    state = [a['clv'], a['scaler']]

    def wave_step():
        state[0], state[1] = fn(
            state[0], state[1], jp, jq, jr, jt, lzq, lzr, lam, ei_bd,
            ev_bd, n_exec=n_real, n_rows=rows, block_w=512,
            min_scale=consts['min_scale'],
            inv_min_scale=consts['inv_min_scale'], interpret=interpret)

    def wave_sync():
        float(jnp.sum(state[0][2, 0, :8]))

    wave_step()
    wave_sync()                                    # compile + warmup
    med, spread = _measure(wave_step, wave_sync, ITERS, REPS)
    rate = SITES * n_real * ITERS / med
    rows_out['newview_dna_gamma'] = dict(
        value=rate, unit='site-updates/s', spread=round(spread, 3))

    # ---- 20-state (AA) GAMMA newview level wave -------------------------
    rng = np.random.default_rng(1)
    SA, WA, NA = 24, 1 << 14, 16            # padded states, sites, nodes/level
    KA = 4 * SA
    rows_a = 48
    clv_a = jnp.asarray(rng.uniform(0.1, 1.0, (rows_a, KA, WA)),
                        jnp.float32)
    sc_a = jnp.zeros((rows_a, 1, WA), jnp.int32)
    pa = jnp.asarray(rng.integers(32, rows_a, NA), jnp.int32)
    qa = jnp.asarray(rng.integers(1, 32, NA), jnp.int32)
    ra = jnp.asarray(rng.integers(1, 32, NA), jnp.int32)
    ta = jnp.zeros(NA, jnp.int32)
    pls = jnp.asarray(rng.uniform(0.0, 0.2, (NA, KA, KA)), jnp.float32)
    prs = jnp.asarray(rng.uniform(0.0, 0.2, (NA, KA, KA)), jnp.float32)
    ev_a = jnp.asarray(rng.uniform(0.0, 0.2, (KA, KA)), jnp.float32)
    fn_a = jax.jit(PK.newview_level_pallas,
                   static_argnames=('block_w', 'min_scale', 'inv_min_scale',
                                    'interpret'), donate_argnums=(0, 1))
    st_a = [clv_a, sc_a]

    def aa_step():
        st_a[0], st_a[1] = fn_a(st_a[0], st_a[1], pa, qa, ra, ta, pls, prs,
                                ev_a, block_w=1024,
                                min_scale=consts['min_scale'],
                                inv_min_scale=consts['inv_min_scale'],
                                interpret=interpret)

    def aa_sync():
        float(jnp.sum(st_a[0][33, 0, :8]))

    aa_step()
    aa_sync()
    med_a, spread_a = _measure(aa_step, aa_sync, 20, REPS)
    rows_out['newview_aa_gamma'] = dict(
        value=WA * NA * 20 / med_a, unit='site-updates/s',
        vs_baseline=round(WA * NA * 20 / med_a
                          / REF_AVX_AA_UPDATES_PER_SEC, 1),
        spread=round(spread_a, 3))

    # ---- reduction rows: device-resident loops --------------------------
    # Each iteration of a tiny scalar-output kernel dispatched from the
    # host is queue-throttled through the remote tunnel (spreads 0.6-1.2
    # in rounds 2-3, and per-op cost grows with queue depth); the loop
    # therefore runs ON DEVICE in one program, with the accumulator fed
    # back into an input so XLA cannot hoist the repeated computation.
    wgt = jnp.ones(SITES, jnp.float32)
    dw = jnp.asarray(rng.uniform(0.1, 0.5, (1, K)), jnp.float32)
    p_row = jnp.asarray([2], jnp.int32)
    q_row = jnp.asarray([3], jnp.int32)
    it_dev = 400 if not interpret else 2

    def device_loop(step1):
        def run(*operands):
            def body(_, acc):
                return acc + step1(acc, *operands)
            return jax.lax.fori_loop(0, it_dev, body,
                                     jnp.asarray(0.0, jnp.float32))
        return jax.jit(run)

    def red_row(name, fn_loop, operands, terms):
        out = [None]

        def step():
            out[0] = fn_loop(*operands)

        def sync():
            float(out[0])

        step()
        sync()
        med, spread = _measure(step, sync, 2, REPS)
        rows_out[name] = dict(
            value=terms * it_dev * 2 / med, unit='site-reductions/s',
            spread=round(spread, 3))

    def ev1(acc, clv, scaler):
        return PK.evaluate_pallas(
            clv, scaler, p_row, q_row, dw + 0.0 * acc, wgt,
            block_w=8192, log_min_scale=consts['log_min_scale'],
            interpret=interpret)

    red_row('evaluate_dna', device_loop(ev1), (state[0], state[1]), SITES)

    lam_flat = lam.astype(jnp.float32)
    d_vec = jnp.asarray(rng.uniform(0.1, 0.5, (1, K)), jnp.float32)

    def nr1(acc, clv, scaler):
        d1, d2 = PK.nr_derivatives_pallas(
            clv, scaler, p_row, q_row, lam_flat, d_vec + 0.0 * acc, wgt,
            block_w=8192, log_min_scale=consts['log_min_scale'],
            interpret=interpret)
        return d1 + d2

    red_row('nr_derivatives_dna', device_loop(nr1), (state[0], state[1]),
            SITES)

    P_, WS = 4, 1 << 14
    clv_s = jnp.asarray(rng.uniform(0.1, 1.0, (P_, 16, K, WS)), jnp.float32)
    sc_s = jnp.zeros((P_, 16, 1, WS), jnp.int32)
    wgt_s = jnp.ones((P_, WS), jnp.float32)
    dw_s = jnp.asarray(rng.uniform(0.1, 0.5, (P_, 1, K)), jnp.float32)

    def st1(acc, clv, scaler):
        return jnp.sum(PK.evaluate_stacked(
            clv, scaler, p_row, q_row, dw_s + 0.0 * acc, wgt_s,
            block_w=8192, log_min_scale=consts['log_min_scale'],
            interpret=interpret))

    red_row('evaluate_stacked_4x', device_loop(st1), (clv_s, sc_s),
            P_ * WS)

    primary = rows_out['newview_dna_gamma']
    print(json.dumps({
        'metric': 'clv_site_updates_per_sec_per_chip',
        'value': primary['value'],
        'unit': 'site-updates/s',
        'vs_baseline': primary['value'] / REF_AVX_UPDATES_PER_SEC,
        'spread': primary['spread'],
        'rows': rows_out,
    }))


if __name__ == '__main__':
    main()
