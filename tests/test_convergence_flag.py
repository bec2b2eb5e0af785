"""-D (RF convergence criterion) behavioral test: with the criterion on,
the search stops as soon as two consecutive cycles' bipartition sets are
within 1% relative RF (searchAlgo.c convergenceCriterion path
:2160-2220); the run must do no worse than a small fixed lnL tolerance
vs the unconverged search while doing fewer cycles."""
import pathlib

import pytest

from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.run import run_search

DATA = pathlib.Path(__file__).resolve().parent / 'data'


@pytest.mark.slow
def test_rf_convergence_stops_early():
    aln = read_bytefile(str(DATA / 'bin12.binary'))
    nwk = (DATA / 'bin12.tree').read_text()

    import examl_tpu.search.spr as spr_mod
    calls = {'with': 0, 'without': 0}
    orig = spr_mod.SprSearch.tree_optimize_rapid

    def make_counter(key):
        def counter(self, mn, mx, bt):
            calls[key] += 1
            return orig(self, mn, mx, bt)
        return counter

    spr_mod.SprSearch.tree_optimize_rapid = make_counter('with')
    try:
        res_d = run_search(aln, nwk, search_convergence=True)
    finally:
        spr_mod.SprSearch.tree_optimize_rapid = orig

    spr_mod.SprSearch.tree_optimize_rapid = make_counter('without')
    try:
        res = run_search(aln, nwk, search_convergence=False)
    finally:
        spr_mod.SprSearch.tree_optimize_rapid = orig

    # -D converges no later than the plain run and lands within a small
    # tolerance of its likelihood (identical for this dataset)
    assert calls['with'] <= calls['without']
    assert res_d.likelihood == pytest.approx(res.likelihood, abs=0.1)
