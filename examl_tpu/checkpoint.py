"""Checkpoint / restart.

Functional equivalent of the reference's binary checkpoints
(reference: examl/searchAlgo.c writeCheckpoint :1282 / restart :1726,
checkPointState struct examl/axml.h:682-743): each checkpoint is a new
numbered file holding (a) the search-state scalars, (b) all model
parameters per partition, (c) the tree topology + branch lengths, and
(d) in PSR mode the per-site rates in *global site order* so a run can be
resumed on any device count. We serialize with numpy's npz container
instead of raw C structs; node topology is stored as an explicit
connection table (ring-record index pairs), which removes the reference's
pointer-relocation machinery.
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Optional

import numpy as np

from .engine import LikelihoodEngine
from .tree import Node, Tree

FORMAT_VERSION = 1

# search state machine (axml.h:655-659)
REARR_SETTING, FAST_SPRS, SLOW_SPRS, MOD_OPT, QUARTETS = range(5)

PHASE_NAMES = {REARR_SETTING: 'REARR_SETTING', FAST_SPRS: 'FAST_SPRS',
               SLOW_SPRS: 'SLOW_SPRS', MOD_OPT: 'MOD_OPT',
               QUARTETS: 'QUARTETS'}
PHASE_IDS = {v: k for k, v in PHASE_NAMES.items()}


def check_cmd_compatibility(saved_json: Optional[str], current: dict):
    """Restart command-line consistency check (the analogue of
    checkCommandLineArguments, searchAlgo.c:1383-1500): a run may only be
    resumed with the same analysis settings it was started with."""
    import json
    if not saved_json:
        return
    saved = json.loads(saved_json)
    bad = {k: (saved.get(k), v) for k, v in current.items()
           if k in saved and saved[k] != v}
    if bad:
        detail = ', '.join(f'{k}: checkpoint={a!r} now={b!r}'
                           for k, (a, b) in bad.items())
        raise ValueError(
            'checkpoint was written with different command-line settings '
            f'({detail}); restart with the original settings '
            '(reference searchAlgo.c:1383-1500)')


def _ring_index(tr: Tree, p: Node) -> int:
    """Encode a ring record as 3*number + position-in-ring."""
    if tr.is_tip(p.number):
        return 3 * p.number
    base = tr.nodep[p.number]
    if p is base:
        return 3 * p.number
    if p is base.next:
        return 3 * p.number + 1
    assert p is base.next.next
    return 3 * p.number + 2


def _ring_lookup(tr: Tree, code: int) -> Node:
    number, pos = divmod(code, 3)
    p = tr.nodep[number]
    for _ in range(pos):
        p = p.next
    return p


def tree_to_table(tr: Tree) -> np.ndarray:
    """Connection table [n_edges, 2 + num_branches]: p_code, q_code, z..."""
    rows = []
    for p in tr.branches():
        rows.append([_ring_index(tr, p), _ring_index(tr, p.back)] + list(p.z))
    return np.array(rows, dtype=np.float64)


def table_to_tree(tr: Tree, table: np.ndarray, start_number: int) -> None:
    for i in range(1, 2 * tr.mxtips - 1):
        base = tr.nodep[i]
        if base is None:
            continue
        base.back = None
        if not tr.is_tip(i):
            base.next.back = None
            base.next.next.back = None
    for row in table:
        p = _ring_lookup(tr, int(row[0]))
        q = _ring_lookup(tr, int(row[1]))
        tr.hookup(p, q, list(row[2:]))
    tr.start = tr.nodep[start_number]
    tr.ntips = tr.mxtips


@dataclasses.dataclass
class SearchState:
    """Mirror of the checkPointState scalars that govern resumption."""
    state: int = FAST_SPRS
    accumulated_time: float = 0.0
    likelihood: float = 0.0
    # determineRearrangementSetting state
    maxtrav: int = 5
    best_trav: int = 5
    start_lh: float = 0.0
    impr: bool = True
    cutoff: bool = True
    # SPR cycle state
    thorough: bool = False
    fast_iterations: int = 0
    thorough_iterations: int = 0
    rearrangements_min: int = 1
    rearrangements_max: int = 5
    lh: float = 0.0
    previous_lh: float = 0.0
    epsilon: float = 0.01
    lh_cutoff: float = 0.0
    lh_avg: float = 0.0
    lh_dec: int = 0
    it_count: int = 0
    tree_iteration: int = 0
    cat_opt: int = 0


class Checkpointer:
    def __init__(self, run_id: str, workdir: str = '.'):
        self.run_id = run_id
        self.workdir = workdir
        self.counter = 0

    def path(self, n: Optional[int] = None) -> str:
        n = self.counter if n is None else n
        return os.path.join(self.workdir,
                            f'ExaML_binaryCheckpoint.{self.run_id}_{n}')

    def write(self, engine: LikelihoodEngine, state: SearchState,
              extra: Optional[dict] = None) -> str:
        tr = engine.tree
        payload = {
            'format_version': FORMAT_VERSION,
            'mxtips': tr.mxtips,
            'num_branches': engine.num_branches,
            'taxon_names': np.array(tr.taxon_names),
            'tree_table': tree_to_table(tr),
            'start_number': tr.start.number,
            'per_partition_lh': engine.per_partition_lh,
        }
        for key, val in dataclasses.asdict(state).items():
            payload[f'state_{key}'] = val
        for m, pm in enumerate(engine.partitions):
            payload[f'p{m}_rates'] = pm.subst_rates
            payload[f'p{m}_freqs'] = pm.frequencies
            payload[f'p{m}_freq_exp'] = pm.freq_exponents
            payload[f'p{m}_alpha'] = pm.alpha
            payload[f'p{m}_auto_model'] = int(pm.auto_prot_model)
            payload[f'p{m}_prot_freqs'] = int(pm.prot_freqs)
            payload[f'p{m}_gamma_rates'] = pm.gamma_rates
            payload[f'p{m}_lg4x_weights'] = pm.lg4x_weights
            payload[f'p{m}_weight_exp'] = pm.weight_exponents
        if engine.is_psr:
            # per-site arrays in global (partition-major) site order, so a
            # run can resume on any device count (searchAlgo.c:1586-1648)
            payload['psr_invocations'] = \
                engine.optimize_rate_category_invocations
            for m in range(engine.n_models):
                w = engine.real_widths[m]
                payload[f'p{m}_num_categories'] = engine.num_categories[m]
                payload[f'p{m}_psr_rates'] = engine.psr_rates[m]
                payload[f'p{m}_rate_category'] = engine.rate_category[m][:w]
                payload[f'p{m}_patrat'] = engine.patrat[m][:w]
        if extra:
            for k, v in extra.items():
                payload[f'extra_{k}'] = v
        out = self.path()
        np.savez(out, **payload)
        # np.savez appends .npz; rename to the exact ExaML-style name
        os.replace(out + '.npz', out)
        self.counter += 1
        return out

    @staticmethod
    def latest(run_id: str, workdir: str = '.') -> Optional[str]:
        paths = glob.glob(os.path.join(
            workdir, f'ExaML_binaryCheckpoint.{run_id}_*'))
        if not paths:
            return None
        return max(paths, key=lambda p: int(p.rsplit('_', 1)[1]))

    @staticmethod
    def read(path: str, engine: LikelihoodEngine) -> SearchState:
        with open(path, 'rb') as fh:
            data = np.load(fh, allow_pickle=False)
            data = dict(data)
        assert int(data['format_version']) == FORMAT_VERSION
        tr = engine.tree
        assert int(data['mxtips']) == tr.mxtips
        assert list(data['taxon_names']) == tr.taxon_names

        for m, pm in enumerate(engine.partitions):
            pm.subst_rates = data[f'p{m}_rates']
            pm.frequencies = data[f'p{m}_freqs']
            pm.freq_exponents = data[f'p{m}_freq_exp']
            pm.alpha = float(data[f'p{m}_alpha'])
            from .datatypes import ProtModel
            pm.auto_prot_model = ProtModel(int(data[f'p{m}_auto_model']))
            pm.prot_freqs = bool(int(data[f'p{m}_prot_freqs']))
            if f'p{m}_gamma_rates' in data:
                pm.gamma_rates = data[f'p{m}_gamma_rates']
                pm.lg4x_weights = data[f'p{m}_lg4x_weights']
                pm.weight_exponents = data[f'p{m}_weight_exp']
        engine.update_eigen(range(engine.n_models))
        if engine.is_psr and 'psr_invocations' in data:
            engine.optimize_rate_category_invocations = int(
                data['psr_invocations'])
            for m in range(engine.n_models):
                w = engine.real_widths[m]
                cats = np.zeros(engine.widths[m], dtype=np.int32)
                cats[:w] = data[f'p{m}_rate_category']
                engine.patrat[m][:w] = data[f'p{m}_patrat']
                nc = int(data[f'p{m}_num_categories'])
                engine.set_psr_state(
                    m, num_categories=nc,
                    per_site_rates=data[f'p{m}_psr_rates'][:nc],
                    rate_category=cats)

        table_to_tree(tr, data['tree_table'], int(data['start_number']))
        engine.per_partition_lh = data['per_partition_lh']

        state = SearchState()
        for key in dataclasses.asdict(state):
            val = data[f'state_{key}']
            setattr(state, key, type(getattr(state, key))(val.item()))
        extras = {}
        for key, val in data.items():
            if key.startswith('extra_'):
                v = val.item() if val.shape == () else val
                if isinstance(v, bytes):
                    v = v.decode()
                extras[key[len('extra_'):]] = v
        # verify by recomputation, like the reference's readTree :1372-1375.
        # QUARTETS checkpoints capture the tree mid-quartet-mutation (the
        # comprehensive topology is destroyed by the 4-taxon hookups), so
        # the reference skips the verification there too (searchAlgo.c:1374)
        if state.state != QUARTETS:
            lnl = engine.evaluate(tr.start, full_traversal_=True)
            assert abs(lnl - state.likelihood) < 0.1, (lnl, state.likelihood)
        return state, extras
