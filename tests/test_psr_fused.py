"""PSR (per-site rates, the reference CAT mode) on the FUSED traversal
path: round 5 lifts the per-level-launch restriction — the fused
resident/HBM kernels apply per-site P-matrix column scales
exp((EIGN·lz)_k · r_s) (reference first-class CAT kernels:
avxLikelihood.c:326 newviewGTRCAT_AVX, coreGTRCAT), and the speculative
SPR driver runs for PSR engines. The fused program must agree with the
level path, and the batched PSR cycle must land exactly on the
sequential walk."""
import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick, write_newick
from examl_tpu.search.spr import SprSearch
from examl_tpu.search.topologies import BestList
from examl_tpu.tree import Tree

REF = pathlib.Path('/root/reference/testData')
DATA = pathlib.Path(__file__).resolve().parent / 'data'


def _psr_engine(fused=True):
    aln = read_bytefile(str(DATA / '49.binary'))
    tree = Tree(aln.taxon_names)
    parse_newick((REF / '49.tree').read_text(), tree)
    eng = LikelihoodEngine(aln, tree, dtype=jnp.float32, use_pallas=True,
                           pad=128, rate_het='PSR')
    if not fused:
        eng._run_traversal_fused = lambda *a, **k: False
    # non-uniform per-site rates so the PSR column scales matter
    rng = np.random.default_rng(5)
    for m in range(eng.n_models):
        ncat = 7
        rates = np.sort(rng.uniform(0.2, 3.0, ncat))
        cats = rng.integers(0, ncat, eng.widths[m]).astype(np.int32)
        pr = np.zeros(eng.max_categories)
        pr[:ncat] = rates
        eng.set_psr_state(m, ncat, pr, cats)
    return eng, tree


def test_psr_fused_traversal_matches_level():
    """Full evaluate through the fused PSR program vs the level kernels:
    identical likelihoods (same math, different launch structure)."""
    ef, tf = _psr_engine(fused=True)
    el, tl = _psr_engine(fused=False)
    lf = ef.evaluate(tf.start, full_traversal_=True)
    ll = el.evaluate(tl.start, full_traversal_=True)
    assert lf == pytest.approx(ll, abs=0.02)
    np.testing.assert_allclose(ef.per_partition_lh, el.per_partition_lh,
                               atol=0.01)
    assert ef.speculation_supported()


def test_psr_fused_tree_evaluate_matches_level():
    ef, tf = _psr_engine(fused=True)
    el, tl = _psr_engine(fused=False)
    ef.evaluate(tf.start, full_traversal_=True)
    el.evaluate(tl.start, full_traversal_=True)
    lf = ef.tree_evaluate(1.0)
    ll = el.tree_evaluate(1.0)
    assert lf == pytest.approx(ll, abs=0.05)


def test_psr_device_smoothing_matches_host():
    """treeEvaluate through the one-program device smoothing (now PSR-
    capable — was the PSR search's dominant sync source: 90799
    makenewz_device round trips on the 49 full search) vs the host-driven
    smoothing loop: same likelihood and branch lengths."""
    ed, td = _psr_engine(fused=True)
    eh, th = _psr_engine(fused=True)
    eh._smooth_schedules = lambda *a, **k: None     # force the host path
    ed.evaluate(td.start, full_traversal_=True)
    eh.evaluate(th.start, full_traversal_=True)
    ld = ed.tree_evaluate(1.0)
    assert ed.op_stats.get('tree_eval_device', 0) == 1, \
        'the device smoothing program did not run for PSR'
    lh = eh.tree_evaluate(1.0)
    assert ld == pytest.approx(lh, abs=0.05)
    zd = sorted(round(float(z), 5) for b in td.branches() for z in b.z)
    zh = sorted(round(float(z), 5) for b in th.branches() for z in b.z)
    np.testing.assert_allclose(zd, zh, atol=1e-3)


@pytest.mark.slow
def test_psr_batched_cycle_matches_sequential():
    """One fast SPR cycle under PSR: the batched+speculative driver
    (now reachable — speculation_supported is True for PSR) must land
    exactly where the sequential walk lands (the GAMMA gate's PSR
    counterpart; reference CAT semantics searchAlgo.c:682-798)."""
    results = {}
    for batched in (True, False):
        eng, tree = _psr_engine(fused=True)
        eng.evaluate(tree.start, full_traversal_=True)
        eng.tree_evaluate(1.0)
        search = SprSearch(eng, batch_lazy=batched)
        if batched:
            assert search.sub_capable, \
                'PSR must support the speculative fused driver now'
        bt = BestList(20)
        lh = search.tree_optimize_rapid(1, 5, bt)
        results[batched] = dict(
            lh=lh, end_lh=search.end_lh, lh_dec=search.lh_dec,
            lh_avg=search.lh_avg,
            ilist=sorted(search.ilist.likelihoods),
            bt=[e.likelihood for e in bt.entries],
            tree=write_newick(tree))
    a, b = results[True], results[False]
    assert a['lh_dec'] == b['lh_dec']
    assert a['lh'] == pytest.approx(b['lh'], abs=1e-6)
    assert a['end_lh'] == pytest.approx(b['end_lh'], abs=1e-6)
    # the cutoff-decrease accumulator sums ~1e3 scores of ~1e4 magnitude:
    # per-score f32 path noise (batched evaluate vs sequential evaluate)
    # accumulates to ~1e-3 absolute without any trajectory divergence
    # (lh_dec / trees / lists are exact)
    assert a['lh_avg'] == pytest.approx(b['lh_avg'], abs=0.01)
    np.testing.assert_allclose(a['ilist'], b['ilist'], atol=1e-5)
    np.testing.assert_allclose(a['bt'], b['bt'], atol=1e-5)
    assert a['tree'] == b['tree']
