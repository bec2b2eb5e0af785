"""Multi-process execution: two jax.distributed processes (4 virtual CPU
devices each) form one 8-device 'sites' mesh and run the real engine on
testData/49 — the TPU-native analogue of the reference's MPI ranks
(communication.c, evaluateGenericSpecial.c:966-973). The distributed lnL
must match the single-process value."""
import pathlib
import subprocess
import sys

import pytest

DATA = pathlib.Path(__file__).resolve().parent / 'data'
REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r'''
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
pid = int(sys.argv[1])
port = sys.argv[2]
from examl_tpu.parallel import distributed as D
D.initialize(coordinator_address=f'localhost:{port}', num_processes=2,
             process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8

import numpy as np
from jax.sharding import Mesh
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

mesh = Mesh(np.array(jax.devices()), ('sites',))
aln = read_bytefile(sys.argv[3])
tree = Tree(aln.taxon_names)
parse_newick(open(sys.argv[4]).read(), tree)
eng = LikelihoodEngine(aln, tree, sharding=mesh)
lnl = eng.evaluate(tree.start, full_traversal_=True)
# one NR branch optimization exercises the derivative psum too
p = tree.start
z = eng.makenewz(p, p.back, list(p.z), 32)
print(f'RESULT {pid} {lnl:.9f} {float(z[0]):.9f}', flush=True)
'''


SLICE_WORKER = r'''
import os, sys
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
pid = int(sys.argv[1])
port = sys.argv[2]
from examl_tpu.parallel import distributed as D
D.initialize(coordinator_address=f'localhost:{port}', num_processes=2,
             process_id=pid)

import numpy as np
from jax.sharding import Mesh
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile, LazyTipCodes
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

mesh = Mesh(np.array(jax.devices()), ('sites',))
aln = read_bytefile(sys.argv[3], mmap=True)
assert aln.codes is None and aln.codes_mm is not None
tree = Tree(aln.taxon_names)
parse_newick(open(sys.argv[4]).read(), tree)
eng = LikelihoodEngine(aln, tree, sharding=mesh)
lnl = eng.evaluate(tree.start, full_traversal_=True)
full = sum(h.shape[0] * h.shape[1] * 4 for h in eng.host_tip_codes)
lazy = sum(h.materialized for h in eng.host_tip_codes
           if isinstance(h, LazyTipCodes))
n_lazy = sum(isinstance(h, LazyTipCodes) for h in eng.host_tip_codes)
print(f'SLICE {pid} {lnl:.9f} {lazy} {full} {n_lazy}', flush=True)
'''


def _run_two(tmp_path, worker_src, extra_args, port):
    wf = tmp_path / 'worker.py'
    wf.write_text(worker_src)
    args = [sys.executable, str(wf)]
    import os
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = str(REPO)
    procs = [subprocess.Popen(
        args + [str(i), port] + extra_args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


@pytest.mark.slow
def test_two_process_slice_ingestion(tmp_path):
    """Per-process byte-file slice ingestion (readMyData,
    byteFile.c:278-382): with read_bytefile(mmap=True) on a 2-process
    mesh, each process materializes only its shard's tip-code columns —
    O(1/P) of the alignment — and the distributed lnL still matches the
    single-process golden."""
    tree = '/root/reference/testData/49.tree'
    if not pathlib.Path(tree).exists():
        tree = str(DATA / '49_alt.tree')
    outs = _run_two(tmp_path, SLICE_WORKER,
                    [str(DATA / '49.binary'), tree], '19843')
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith('SLICE')]
        assert lines, out[-3000:]
        _, pid, lnl, lazy, full, n_lazy = lines[0].split()
        results.append((float(lnl), int(lazy), int(full), int(n_lazy)))
    assert results[0][0] == results[1][0]
    assert results[0][0] == pytest.approx(-19685.568214, abs=1e-4)
    for lnl, lazy, full, n_lazy in results:
        assert n_lazy > 0, 'lazy staging must engage on the mesh'
        # each process owns half the columns; allow slack for padding
        assert lazy < 0.75 * full, (lazy, full)


@pytest.mark.slow
def test_two_process_engine(tmp_path):
    wf = tmp_path / 'worker.py'
    wf.write_text(WORKER)
    port = '19841'
    tree = '/root/reference/testData/49.tree'
    if not pathlib.Path(tree).exists():
        tree = str(DATA / '49_alt.tree')
    args = [sys.executable, str(wf)]
    env = dict(PYTHONPATH=str(REPO), PATH='/usr/bin:/bin:/usr/local/bin')
    import os
    env.update({k: v for k, v in os.environ.items()
                if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')})
    env['PYTHONPATH'] = str(REPO)
    procs = [subprocess.Popen(
        args + [str(i), port, str(DATA / '49.binary'), tree],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith('RESULT')]
        assert lines, out[-3000:]
        _, pid, lnl, z = lines[0].split()
        results.append((float(lnl), float(z)))
    # both processes agree, and match the single-process golden
    assert results[0] == results[1]
    assert results[0][0] == pytest.approx(-19685.568214, abs=1e-4)
