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
    from examl_tpu.kernels.pallas_newview import (blockdiag, make_p_batch,
                                                  newview_level_pallas)

    args, consts, level_args = _synthetic(n_taxa=N_TAXA, sites=SITES,
                                          dtype=jnp.float32)
    a = args
    # folded Pallas layout: [rows, C*S, W] CLVs, [rows, W] counters
    rows, C_, S_, W_ = a['clv'].shape
    a['clv'] = a['clv'].reshape(rows, C_ * S_, W_)
    a['scaler'] = a['scaler'][:, :1, :]

    pbatches = []
    for (p_idx, q_idx, r_idx, tt, qz, rz) in level_args:
        pls, prs = make_p_batch(qz, rz, a['gamma'], a['eign'], a['ei'])
        pbatches.append((p_idx, q_idx, r_idx, tt.astype(jnp.int32),
                         pls, prs))

    ev_bd = blockdiag(a['ev'])
    fn = jax.jit(newview_level_pallas,
                 static_argnames=('block_w', 'min_scale', 'inv_min_scale',
                                  'interpret'),
                 donate_argnums=(0, 1))

    def full_wave(clv, scaler):
        for (p_idx, q_idx, r_idx, tt, pls, prs) in pbatches:
            clv, scaler = fn(clv, scaler, p_idx, q_idx, r_idx, tt, pls, prs,
                             ev_bd, block_w=8192,
                             min_scale=consts['min_scale'],
                             inv_min_scale=consts['inv_min_scale'])
        return clv, scaler

    clv, scaler = full_wave(a['clv'], a['scaler'])   # compile + warmup
    jax.block_until_ready(clv)

    n_updates = sum(pb[0].shape[0] for pb in pbatches)
    t0 = time.time()
    for _ in range(ITERS):
        clv, scaler = full_wave(clv, scaler)
    # a value fetch is the only rigorous sync through the device tunnel
    # (block_until_ready alone under-reports; see BASELINE.md round-2 notes)
    float(jnp.sum(clv[2, 0, :8]))
    dt = time.time() - t0

    rate = SITES * n_updates * ITERS / dt
    print(json.dumps({
        'metric': 'clv_site_updates_per_sec_per_chip',
        'value': rate,
        'unit': 'site-updates/s',
        'vs_baseline': rate / REF_AVX_UPDATES_PER_SEC,
    }))


if __name__ == '__main__':
    main()
