"""Benchmark: CLV-update throughput (site-updates/sec/chip).

Runs level-batched CLV waves (newview over every inner node of a random
64-taxon tree, 65536 DNA sites, GTR+GAMMA, f32) using the fused Pallas
kernel on one chip. Baseline: the reference's AVX build does 33.9M CLV
site-updates/s/core on this machine (642 patterns x 47 nodes x 200
full-traversal evaluations in 0.178 s, f64; measured with the
instrumented build in .refbuild). vs_baseline is the ratio against that
per-core number; the round target is >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

REF_AVX_UPDATES_PER_SEC = 33.9e6

N_TAXA = 64
SITES = 1 << 16
ITERS = 60


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
    from examl_tpu.kernels.pallas_newview import (blockdiag, fold_lam,
                                                  traversal_fused_pallas)

    args, consts, level_args = _synthetic(n_taxa=N_TAXA, sites=SITES,
                                          dtype=jnp.float32)
    a = args
    # folded Pallas layout: [rows, C*S, W] CLVs, [rows, W] counters
    rows, C_, S_, W_ = a['clv'].shape
    a['clv'] = a['clv'].reshape(rows, C_ * S_, W_)
    a['scaler'] = a['scaler'][:, :1, :]

    # the engine's accelerator path: the WHOLE traversal is one Mosaic
    # kernel (P matrices built on the fly from log branch lengths), one
    # device dispatch per wave (engine._build_pallas_program); only the
    # real ops execute (n_exec skips the bucketed descriptor padding)
    jp = a['p_idx'].astype(jnp.int32)
    jq = a['q_idx'].astype(jnp.int32)
    jr = a['r_idx'].astype(jnp.int32)
    jt = a['tip_tip'].astype(jnp.int32)
    lzq = jnp.log(jnp.maximum(a['qz'], 1e-15)).astype(jnp.float32)
    lzr = jnp.log(jnp.maximum(a['rz'], 1e-15)).astype(jnp.float32)
    lam = fold_lam(a['eign'], a['gamma']).astype(jnp.float32)[None, :]
    ei_bd = blockdiag(a['ei']).astype(jnp.float32)
    ev_bd = blockdiag(a['ev']).astype(jnp.float32)
    n_real = int(np.sum(np.asarray(a['p_idx']) != rows - 1))

    # VMEM plan (engine._fused_plan): rows*(C*S+1)*bw*4*2 <= ~12MB
    bw = 512
    fn = jax.jit(traversal_fused_pallas,
                 static_argnames=('n_exec', 'n_rows', 'block_w', 'group',
                                  'min_scale', 'inv_min_scale', 'interpret'),
                 donate_argnums=(0, 1))

    def full_wave(clv, scaler):
        return fn(clv, scaler, jp, jq, jr, jt, lzq, lzr, lam, ei_bd, ev_bd,
                  n_exec=n_real, n_rows=rows, block_w=bw,
                  min_scale=consts['min_scale'],
                  inv_min_scale=consts['inv_min_scale'])

    clv, scaler = full_wave(a['clv'], a['scaler'])   # compile + warmup
    # a value fetch is the only rigorous sync through the device tunnel
    # (block_until_ready alone under-reports; see BASELINE.md round-2 notes)
    float(jnp.sum(clv[2, 0, :8]))

    n_updates = n_real             # count only REAL CLV updates
    # per-process tunnel state is noisy for the first seconds after the
    # chip claim; take the best of several measured repetitions
    best_dt = float('inf')
    for _ in range(4):
        t0 = time.time()
        for _ in range(ITERS):
            clv, scaler = full_wave(clv, scaler)
        float(jnp.sum(clv[2, 0, :8]))
        best_dt = min(best_dt, time.time() - t0)

    rate = SITES * n_updates * ITERS / best_dt
    print(json.dumps({
        'metric': 'clv_site_updates_per_sec_per_chip',
        'value': rate,
        'unit': 'site-updates/s',
        'vs_baseline': rate / REF_AVX_UPDATES_PER_SEC,
    }))


if __name__ == '__main__':
    main()
