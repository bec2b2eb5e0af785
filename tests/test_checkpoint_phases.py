"""Kill-and-resume coverage for the checkpoint phases added in round 2:
MOD_OPT (-f e, optimizeModel.c:3034-3043), QUARTETS with output truncation
(quartets.c:329-342, 398-405), REARR_SETTING (searchAlgo.c:1769-1824), the
restart command-line compatibility check (searchAlgo.c:1383-1500), and RF
convergence state restore (searchAlgo.c:1196-1212)."""
import pathlib

import numpy as np
import pytest

from examl_tpu.checkpoint import Checkpointer, check_cmd_compatibility
from examl_tpu.io.bytefile import read_bytefile

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


class Stop(Exception):
    pass


def test_cmd_compatibility_check():
    import json
    saved = json.dumps(dict(mode='search', rate_het='GAMMA', categories=25))
    check_cmd_compatibility(saved, dict(mode='search', rate_het='GAMMA'))
    with pytest.raises(ValueError, match='rate_het'):
        check_cmd_compatibility(saved, dict(mode='search', rate_het='PSR'))
    with pytest.raises(ValueError, match='categories'):
        check_cmd_compatibility(saved, dict(categories=40))
    check_cmd_compatibility(None, dict(mode='search'))  # legacy: no echo


def test_rf_state_restore():
    from examl_tpu.engine import LikelihoodEngine
    from examl_tpu.io.newick import parse_newick, write_newick
    from examl_tpu.search.spr import SprSearch
    from examl_tpu.tree import Tree

    aln = read_bytefile(str(DATA / 'bin12.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((DATA / 'bin12.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree)
    eng.evaluate(tree.start, full_traversal_=True)
    s1 = SprSearch(eng, search_convergence=True)
    assert not s1._rf_converged(0)
    nwk0 = s1.rf_newicks[0]
    assert nwk0

    s2 = SprSearch(eng, search_convergence=True)
    s2.restore_rf_state(nwk0, '')
    assert s2.rf_slots[0] == s1.rf_slots[0]
    assert s2.rf_slots[1] is None
    # the restored slot drives convergence: same tree again -> converged
    assert s2._rf_converged(1)


@pytest.mark.slow
def test_mod_opt_resume(tmp_path):
    """-f e interrupted mid-modOpt resumes to the uninterrupted result."""
    from examl_tpu.run import run_tree_evaluation

    aln = read_bytefile(str(DATA / 'bin12.binary'))
    nwk = (DATA / 'bin12.tree').read_text()
    eps = 1e-5          # tight epsilon -> several modOpt cycles

    full = run_tree_evaluation(aln, nwk, likelihood_epsilon=eps)

    import examl_tpu.optimize.model_opt as mo
    orig = mo.ModelOptimizer.mod_opt
    calls = {'n': 0}

    def limited(self, e, checkpointer=None):
        def bomb():
            if checkpointer is not None:
                checkpointer()
            calls['n'] += 1
            if calls['n'] >= 2:
                raise Stop
        return orig(self, e, checkpointer=bomb)

    mo.ModelOptimizer.mod_opt = limited
    try:
        with pytest.raises(Stop):
            run_tree_evaluation(aln, nwk, likelihood_epsilon=eps,
                                checkpoint_run_id='modopt',
                                checkpoint_workdir=str(tmp_path))
    finally:
        mo.ModelOptimizer.mod_opt = orig

    res = run_tree_evaluation(aln, nwk, likelihood_epsilon=eps,
                              checkpoint_run_id='modopt',
                              checkpoint_workdir=str(tmp_path),
                              resume_from_checkpoint=True)
    assert res.likelihood == pytest.approx(full.likelihood, abs=1e-5)


@pytest.mark.slow
def test_quartets_resume(tmp_path):
    """-f q interrupted mid-stream truncates + resumes to identical
    output."""
    from examl_tpu.run import run_quartets

    aln = read_bytefile(str(DATA / 'bin12.binary'))
    nwk = (DATA / 'bin12.tree').read_text()

    ref_out = tmp_path / 'ref.quartets'
    full = run_quartets(aln, nwk, out_path=str(ref_out))

    out = tmp_path / 'resume.quartets'
    import examl_tpu.run as run_mod
    n_ck = {'n': 0}
    orig_write = Checkpointer.write

    def limited(self, engine, state, extra=None):
        p = orig_write(self, engine, state, extra=extra)
        n_ck['n'] += 1
        if n_ck['n'] >= 3:
            raise Stop
        return p

    Checkpointer.write = limited
    try:
        with pytest.raises(Stop):
            run_quartets(aln, nwk, out_path=str(out),
                         checkpoint_run_id='q12',
                         checkpoint_workdir=str(tmp_path),
                         checkpoint_interval=37)
    finally:
        Checkpointer.write = orig_write

    # garbage after the last checkpoint must be truncated on resume
    with open(out, 'a') as fh:
        fh.write('PARTIAL GARBAGE LINE')

    res = run_quartets(aln, nwk, out_path=str(out),
                       checkpoint_run_id='q12',
                       checkpoint_workdir=str(tmp_path),
                       resume_from_checkpoint=True,
                       checkpoint_interval=37)
    assert out.read_text() == ref_out.read_text()
    # the resumed run only evaluates the remaining quartets
    assert len(res) < len(full)


@pytest.mark.slow
def test_resume_under_different_device_count(tmp_path):
    """A checkpoint written on one device resumes on an 8-device mesh to
    the uninterrupted result — the reference explicitly supports
    restarting with a different rank count because per-site state is
    checkpointed in global site order (searchAlgo.c:1586-1648). PSR mode
    exercises the per-site rate/category arrays, the only genuinely
    device-count-dependent state."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from examl_tpu.run import run_tree_evaluation

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = Mesh(np.array(devices[:8]), ('sites',))

    aln = read_bytefile(str(DATA / 'bin12.binary'))
    nwk = (DATA / 'bin12.tree').read_text()
    eps = 1e-5
    kwargs = dict(rate_het='PSR', max_categories=25)

    full = run_tree_evaluation(aln, nwk, likelihood_epsilon=eps, **kwargs)

    import examl_tpu.optimize.model_opt as mo
    orig = mo.ModelOptimizer.mod_opt
    calls = {'n': 0}

    def limited(self, e, checkpointer=None):
        def bomb():
            if checkpointer is not None:
                checkpointer()
            calls['n'] += 1
            if calls['n'] >= 1:
                raise Stop
        return orig(self, e, checkpointer=bomb)

    mo.ModelOptimizer.mod_opt = limited
    try:
        with pytest.raises(Stop):
            run_tree_evaluation(aln, nwk, likelihood_epsilon=eps,
                                checkpoint_run_id='xdev',
                                checkpoint_workdir=str(tmp_path), **kwargs)
    finally:
        mo.ModelOptimizer.mod_opt = orig

    # resume the single-device checkpoint on the 8-device mesh
    res = run_tree_evaluation(aln, nwk, likelihood_epsilon=eps,
                              checkpoint_run_id='xdev',
                              checkpoint_workdir=str(tmp_path),
                              resume_from_checkpoint=True,
                              sharding=mesh, **kwargs)
    assert res.engine.mesh is not None
    assert res.likelihood == pytest.approx(full.likelihood, abs=1e-5)
