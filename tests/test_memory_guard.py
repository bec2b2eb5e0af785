"""Memory accounting + capacity guard (the parser's CLV arithmetic,
reference parser/axml.c:2846-2884, turned into a fail-fast check)."""
import pathlib

import pytest

import examl_tpu.engine as engine_mod
from examl_tpu.engine import LikelihoodEngine
from examl_tpu.io.bytefile import read_bytefile
from examl_tpu.io.newick import parse_newick
from examl_tpu.tree import Tree

DATA = pathlib.Path(__file__).resolve().parent / 'data'


def _make(aln):
    tr = Tree(aln.taxon_names)
    parse_newick((DATA / '49_ref_result.tree').read_text(), tr)
    return tr


def test_memory_estimate_components():
    aln = read_bytefile(str(DATA / '49.binary'))
    eng = LikelihoodEngine(aln, _make(aln))
    est = eng.memory_estimate()
    assert est['total'] == est['clv'] + est['scaler'] + est['tips']
    assert est['per_device'] == est['total']
    # the estimate covers the actual allocation: sum real buffer bytes
    real = sum(c.nbytes for c in eng.clv) + sum(s.nbytes for s in eng.scaler)
    assert est['clv'] + est['scaler'] == real


def test_capacity_guard_trips(monkeypatch):
    """With a reported device limit below the CLV need, the engine must
    refuse at init with the sizing message (no opaque device OOM)."""
    aln = read_bytefile(str(DATA / '49.binary'))
    monkeypatch.setattr(engine_mod, '_device_memory_limit', lambda: 1 << 20)
    with pytest.raises(MemoryError, match='shard the sites axis'):
        LikelihoodEngine(aln, _make(aln))


def test_capacity_guard_counts_mesh(monkeypatch):
    """The same dataset passes when the sites axis is sharded widely
    enough that the per-device share fits."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip('needs 8 virtual devices')
    aln = read_bytefile(str(DATA / '49.binary'))
    eng_probe = LikelihoodEngine(aln, _make(aln))
    need = eng_probe.memory_estimate()['total']
    # a limit that fits 1/8th of the state but not all of it
    monkeypatch.setattr(engine_mod, '_device_memory_limit',
                        lambda: int(need / 4))
    with pytest.raises(MemoryError):
        LikelihoodEngine(aln, _make(aln))
    mesh = Mesh(np.array(devices[:8]), ('sites',))
    eng = LikelihoodEngine(aln, _make(aln), sharding=mesh)
    # lane padding grows with the mesh, so the share is not exactly 1/8,
    # but sharding must bring it well under the single-device total
    assert eng.memory_estimate()['per_device'] < need / 4
