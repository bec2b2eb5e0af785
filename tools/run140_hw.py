"""AA full-search hardware run: testData/140 -f d on the TPU chip (f32
Pallas engine, default accelerator configuration), with -R-style
checkpointing so an interrupted run resumes across sessions. Prints the
(t, lnL) trajectory, final lnL, RF vs the reference result topology, and
wall time."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.run import run_search
from examl_tpu.tree import Tree

DATA = pathlib.Path(__file__).resolve().parents[1] / 'tests' / 'data'
WORKDIR = '/tmp/run140_hw'
pathlib.Path(WORKDIR).mkdir(exist_ok=True)

aln = read_bytefile(str(DATA / '140.binary'))
t0 = time.time()
res = run_search(aln, open('/root/reference/testData/140.tree').read(),
                 verbose=True,
                 checkpoint_run_id='HW140',
                 checkpoint_workdir=WORKDIR,
                 resume_from_checkpoint=True)
dt = time.time() - t0

from examl_tpu.io.newick import write_newick
from examl_tpu.native import rf_distance
ref = Tree(aln.taxon_names)
parse_newick((DATA / '140_ref_result.tree').read_text(), ref)
rf = rf_distance(res.engine.tree, ref)
with open(WORKDIR + '/final.tree', 'w') as f:
    f.write(write_newick(res.engine.tree))
print(f'HW140 lnL={res.likelihood:.6f} RF={rf} wall={dt:.1f}s', flush=True)
