"""One-shot AA full-search hardware smoke: testData/140 -f d on the TPU
chip (f32 Pallas engine, default accelerator configuration). Prints final
lnL, RF vs the reference result topology, and wall time."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.run import run_search
from examl_tpu.tree import Tree

DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'

aln = read_bytefile(str(DATA / '140.binary'))
t0 = time.time()
res = run_search(aln, open('/root/reference/testData/140.tree').read(),
                 verbose=True)
dt = time.time() - t0

from examl_tpu.native import rf_distance
ref = Tree(aln.taxon_names)
parse_newick((DATA / '140_ref_result.tree').read_text(), ref)
rf = rf_distance(res.engine.tree, ref)
print(f'HW140 lnL={res.likelihood:.6f} RF={rf} wall={dt:.1f}s', flush=True)
