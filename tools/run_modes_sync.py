"""Sync-count measurement for the previously host-sequential modes:
full testData/49 `-f d` searches under PSR (-m PSR) and per-partition
branch lengths (-M), on the accelerator (Pallas f32) code path. The
host-sync count is platform-independent (each op_stats entry is one
device->host value fetch), so the CPU interpret run measures exactly
what a hardware run would pay per sync.

Usage: python tools/run_modes_sync.py [psr|pergene|aa ...]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update('jax_platforms', 'cpu')   # sync counts are platform-
#                                             independent; never contend
#                                             for the chip

DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'


def measure(tag, binary, treefile, **kw):
    from examl_tpu.io.bytefile import read_bytefile
    from examl_tpu.run import run_search
    aln = read_bytefile(str(binary))
    t0 = time.time()
    res = run_search(aln, open(treefile).read(), verbose=False,
                     dtype=jax.numpy.float32, use_pallas=True, pad=128,
                     **kw)
    dt = time.time() - t0
    stats = res.engine.op_stats
    syncs = sum(v for k, v in stats.items()
                if not k.startswith('compile:'))
    print(f'{tag}: lnL={res.likelihood:.6f} wall={dt:.1f}s '
          f'syncs={syncs}', flush=True)
    print(f'{tag} op_stats:',
          dict(sorted(stats.items(), key=lambda kv: -kv[1])), flush=True)


if __name__ == '__main__':
    which = sys.argv[1:] or ['psr', 'pergene']
    ref49 = '/root/reference/testData/49.tree'
    if 'gamma' in which:
        measure('G49', DATA / '49.binary', ref49)
    if 'psr' in which:
        measure('PSR49', DATA / '49.binary', ref49, rate_het='PSR',
                max_categories=25)
    if 'pergene' in which:
        from examl_tpu.io.bytefile import read_bytefile
        nb = len(read_bytefile(str(DATA / '49.binary')).partitions)
        measure('M49', DATA / '49.binary', ref49, num_branches=nb)
    if 'aa' in which:
        measure('AA140', DATA / '140.binary',
                '/root/reference/testData/140.tree')

# note: 'gamma' measures the baseline GAMMA -f d sync count (the 380 of
# BASELINE.md round 2; the modOpt sweep work targets < 300)
