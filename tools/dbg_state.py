"""Find the first engine-STATE divergence between the sequential and
batched drivers: after every rearrange_big, emit per-row CLV/scaler sums
(main rows only) + the x-ownership vector. Scores can match while the
persistent state drifts; this pins where.

  python tools/dbg_state.py seq   > /tmp/traj/state_seq.txt
  python tools/dbg_state.py batch > /tmp/traj/state_batch.txt
"""
import pathlib
import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np                                        # noqa: E402
import jax.numpy as jnp                                   # noqa: E402
from examl_tpu.io.bytefile import read_bytefile           # noqa: E402
from examl_tpu.run import run_search                      # noqa: E402
import examl_tpu.search.spr as spr_mod                    # noqa: E402

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'

want_batch = sys.argv[1] == 'batch'
count = [0]

orig_rearrange = spr_mod.SprSearch.rearrange_big


def state_sig(self):
    eng = self.eng
    nb = eng.scratch_base
    rows = []
    for c, s in zip(eng.clv, eng.scaler):
        rows.append(np.asarray(
            jnp.sum(c[:nb].astype(jnp.float64), axis=tuple(
                range(1, c.ndim)))))
        rows.append(np.asarray(jnp.sum(s[:nb], axis=tuple(
            range(1, s.ndim)))).astype(np.float64))
    xs = []
    tr = self.tr
    for i in range(tr.mxtips + 1, 2 * tr.mxtips - 1):
        p = tr.nodep[i]
        xs.append(0 if p.x else (1 if p.next.x else 2))
    return hash((tuple(np.concatenate(rows).round(6).tolist()),
                 tuple(xs)))


def patched(self, p, mintrav, maxtrav):
    r = orig_rearrange(self, p, mintrav, maxtrav)
    count[0] += 1
    print(f'N {count[0]} p={p.number} r={r} sig={state_sig(self):x} '
          f'end={self.end_lh:.9f}', flush=True)
    return r


spr_mod.SprSearch.rearrange_big = patched

orig_init = spr_mod.SprSearch.__init__


def patched_init(self, engine, **kw):
    kw['batch_lazy'] = want_batch
    orig_init(self, engine, **kw)
    if not want_batch:
        self.batch_thorough = False
    self.speculate = False


spr_mod.SprSearch.__init__ = patched_init

aln = read_bytefile(str(DATA / '49.binary'))
res = run_search(aln, (REF / '49.tree').read_text(), verbose=False)
print('final', res.likelihood)
