"""Trajectory-divergence isolation harness (VERDICT r2, weak #1).

Runs the full testData/49 `-f d` search in one of four configurations and
prints the final lnL + RF vs the reference result topology, to separate
the two candidate causes of the f32 accelerator path's 0.3–0.5 lnL
shortfall: numeric precision (f32 vs f64) vs trajectory mechanics
(batched/speculative waves vs the reference's sequential walk).

  python tools/dbg_traj.py f64-seq      # baseline (matches reference)
  python tools/dbg_traj.py f64-batch    # f64 math, batched waves
  python tools/dbg_traj.py f32-seq      # f32 Pallas, sequential walk
  python tools/dbg_traj.py f32-batch    # f32 Pallas, batched (default HW)
"""
import os
import pathlib
import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.io.bytefile import read_bytefile          # noqa: E402
from examl_tpu.io.newick import parse_newick             # noqa: E402
from examl_tpu.run import run_search                     # noqa: E402
from examl_tpu.tree import Tree                          # noqa: E402
import examl_tpu.search.spr as spr_mod                   # noqa: E402

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'


def main(mode):
    want_batch = mode.endswith('batch')
    f32 = mode.startswith('f32')

    orig_init = spr_mod.SprSearch.__init__
    trace_path = os.environ.get('DBG_TRACE')
    trace = open(trace_path, 'w', buffering=1) if trace_path else None

    def patched(self, engine, **kw):
        kw['batch_lazy'] = want_batch
        orig_init(self, engine, **kw)
        self.trace = trace
        if not want_batch:
            self.batch_thorough = False
            self.speculate = False

    spr_mod.SprSearch.__init__ = patched

    kwargs = {}
    if f32:
        kwargs.update(dtype=jax.numpy.float32, use_pallas=True, pad=128)

    aln = read_bytefile(str(DATA / '49.binary'))
    t0 = time.time()
    res = run_search(aln, (REF / '49.tree').read_text(), verbose=False,
                     **kwargs)
    dt = time.time() - t0

    from examl_tpu.native import rf_distance
    ref_tree = Tree(aln.taxon_names)
    parse_newick((DATA / '49_ref_result.tree').read_text(), ref_tree)
    rf = rf_distance(res.engine.tree, ref_tree)
    print(f'MODE={mode} lnL={res.likelihood:.6f} RF={rf} wall={dt:.1f}s',
          flush=True)


if __name__ == '__main__':
    main(sys.argv[1])
