import os
import sys

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import pathlib
import time

if 'nodev' in sys.argv:
    os.environ['EXAML_DEVICE_OPT'] = '0'

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.run import run_search

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path('tests/data')

aln = read_bytefile(str(DATA / '49.binary'))
t0 = time.time()
res = run_search(aln, (REF / '49.tree').read_text(),
                 dtype=jax.numpy.float32, use_pallas=True, pad=128)
print('final', res.likelihood, 'wall', round(time.time() - t0, 1),
      flush=True)
print('tree', res.tree[:400])
