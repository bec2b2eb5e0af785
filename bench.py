"""Benchmark: CLV-update throughput (site-updates/sec/chip).

Runs the packed CLV traversal wave (newview over every inner node of a
random tree) on a large synthetic DNA alignment and reports site-updates
per second on one chip. Baseline: the reference's AVX build does 33.9M
CLV site-updates/s/core on this machine (642 patterns x 47 nodes x 200
full-traversal evaluations in 0.178 s, GTR+GAMMA f64; measured via the
instrumented build in .refbuild). vs_baseline is the ratio against that
per-core number; the round target is >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import math
import sys
import time

import numpy as np

REF_AVX_UPDATES_PER_SEC = 33.9e6

N_TAXA = 64
SITES = 1 << 16
ITERS = 30


def main():
    import jax
    # the axon remote-compile path is slow; persist compiled executables so
    # repeat runs (e.g. the driver's) start instantly
    import os
    os.makedirs('/root/repo/.jax_cache', exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    import jax.numpy as jnp
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import _synthetic
    from examl_tpu.functional import level_wave

    args, consts, level_args = _synthetic(n_taxa=N_TAXA, sites=SITES,
                                          dtype=jnp.float32)

    fn = jax.jit(
        lambda clv, scaler, eign, ei, ev, gamma:
        level_wave(clv, scaler, eign, ei, ev, gamma, level_args,
                   consts['min_scale'], consts['inv_min_scale']),
        donate_argnums=(0, 1))

    a = args
    # warmup/compile
    clv, scaler = fn(a['clv'], a['scaler'], a['eign'], a['ei'], a['ev'],
                     a['gamma'])
    jax.block_until_ready(clv)

    n_updates_per_iter = sum(lv[0].shape[0] for lv in level_args)
    t0 = time.time()
    for _ in range(ITERS):
        clv, scaler = fn(clv, scaler, a['eign'], a['ei'], a['ev'], a['gamma'])
    jax.block_until_ready(clv)
    dt = time.time() - t0

    rate = SITES * n_updates_per_iter * ITERS / dt
    print(json.dumps({
        'metric': 'clv_site_updates_per_sec_per_chip',
        'value': rate,
        'unit': 'site-updates/s',
        'vs_baseline': rate / REF_AVX_UPDATES_PER_SEC,
    }))


if __name__ == '__main__':
    main()
