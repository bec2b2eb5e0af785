"""Hardware measurement: testData/49 -f d on the TPU chip with the
stale-exact verdict-round engine. Prints final lnL, RF vs the reference
result topology, wall time, and the host-sync distribution."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.run import run_search
from examl_tpu.tree import Tree

DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'

aln = read_bytefile(str(DATA / '49.binary'))
t0 = time.time()
res = run_search(aln, open('/root/reference/testData/49.tree').read(),
                 verbose=False)
dt = time.time() - t0

from examl_tpu.native import rf_distance
ref = Tree(aln.taxon_names)
parse_newick((DATA / '49_ref_result.tree').read_text(), ref)
rf = rf_distance(res.engine.tree, ref)
stats = res.engine.op_stats
syncs = sum(v for k, v in stats.items()
            if not k.startswith('compile:'))
print(f'HW49 lnL={res.likelihood:.6f} RF={rf} wall={dt:.1f}s '
      f'syncs~{syncs}', flush=True)
print('op_stats:', dict(sorted(stats.items(), key=lambda kv: -kv[1])),
      flush=True)
