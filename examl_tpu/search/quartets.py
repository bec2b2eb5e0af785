"""Quartet likelihood evaluation (-f q).

Port of the reference quartet mode (reference: examl/quartets.c
computeQuartets :349, quartetLikelihood :217, nniSmooth :170,
computeAllThreeQuartets :283): for each sampled 4-taxon set, build the
three possible quartet topologies on two spare inner ring nodes, optimize
the five branch lengths (16 smoothing passes), and record the three log
likelihoods.
"""
from __future__ import annotations

import itertools
import math
import random
from typing import List, Optional, Tuple

from ..engine import LikelihoodEngine
from ..tree import Node

ALL_QUARTETS, RANDOM_QUARTETS, GROUPED_QUARTETS = 0, 1, 2


def _nni_smooth(eng: LikelihoodEngine, p: Node, maxtimes: int):
    """Iteratively optimize the 5 branches of the quartet
    (quartets.c nniSmooth :170)."""
    tr = eng.tree
    eng.partition_converged[:] = False
    while maxtimes > 0:
        maxtimes -= 1
        eng.partition_smoothed[:] = True
        assert not tr.is_tip(p.number)
        assert not tr.is_tip(p.back.number)
        eng.update_branch(p)
        eng.update_branch(p.next)
        eng.update_branch(p.next.next)
        eng.update_branch(p.back.next)
        eng.update_branch(p.back.next.next)
        if eng._all_smoothed():
            break
    eng.partition_smoothed[:] = False
    eng.partition_converged[:] = False


def quartet_likelihood(eng: LikelihoodEngine, p1, p2, p3, p4, q1, q2) -> float:
    tr = eng.tree
    tr.hookup_default(q1, q2)
    tr.hookup_default(q1.next, p1)
    tr.hookup_default(q1.next.next, p2)
    tr.hookup_default(q2.next, p3)
    tr.hookup_default(q2.next.next, p4)

    eng.newview(q1)
    eng.newview(q2)
    _nni_smooth(eng, q1, 16)
    return eng.evaluate(q1.back.next.next)


def compute_quartets(eng: LikelihoodEngine, *,
                     n_random: Optional[int] = None,
                     groups: Optional[List[List[int]]] = None,
                     seed: int = 12345,
                     out_path: Optional[str] = None,
                     checkpoint_interval: int = 1000,
                     checkpoint_fn=None,
                     skip: int = 0,
                     append: bool = False,
                     use_wave: Optional[bool] = None) -> List[Tuple]:
    """Evaluate quartets; returns [(t1, t2, t3, t4, lnL), ...] covering the
    three topologies per 4-taxon set in the reference's order and output
    format.

    checkpoint_fn(n_done, out_offset) fires every checkpoint_interval
    quartet sets (-I); skip/append resume a checkpointed run — the first
    `skip` emitted sets are not re-evaluated (the enumeration, including
    the RANDOM flavor's seeded draws, is deterministic, so replaying it
    and skipping reproduces the interrupted run; quartets.c:329-342)."""
    tr = eng.tree
    n = tr.mxtips
    q1 = tr.nodep[n + 1]
    q2 = tr.nodep[n + 2]

    if groups is not None:
        flavor = GROUPED_QUARTETS
    elif n_random is not None:
        flavor = RANDOM_QUARTETS
    else:
        flavor = ALL_QUARTETS

    results = []
    out = open(out_path, 'a' if append else 'w') if out_path else None
    n_sets = 0

    # accelerator path: batch whole waves of quartet topologies through
    # one device program dispatch + one fetch (engine.quartet_wave); the
    # sequential host path below stays for the f64/multi-branch engines
    if use_wave is None:
        use_wave = (eng.use_pallas and not eng.is_psr
                    and eng.num_branches == 1)
    wave_cap = (eng.n_scratch // 2) if use_wave else 0
    pending: List[Tuple] = []   # (t1, t2, t3, t4) topologies, lane order
    pending_sets = 0

    def flush_wave():
        nonlocal pending_sets
        if not pending:
            return
        lnls = eng.quartet_wave(pending)
        for (a, b, c, d), lnl in zip(pending, lnls):
            lnl = float(lnl)
            results.append((a, b, c, d, lnl))
            if out:
                out.write(f'{a} {b} | {c} {d}: {lnl:f}\n')
        pending.clear()
        pending_sets = 0
        if checkpoint_fn and n_sets % checkpoint_interval == 0:
            offset = 0
            if out:
                out.flush()
                offset = out.tell()
            checkpoint_fn(n_sets, offset)

    def emit(t1, t2, t3, t4):
        nonlocal n_sets, pending_sets
        n_sets += 1
        if n_sets <= skip:
            return
        if use_wave:
            for a, b, c, d in ((t1, t2, t3, t4), (t1, t3, t2, t4),
                               (t1, t4, t2, t3)):
                pending.append((a, b, c, d))
            pending_sets += 1
            if (len(pending) + 3 > wave_cap
                    or (checkpoint_fn
                        and n_sets % checkpoint_interval == 0)):
                flush_wave()
            return
        p1, p2, p3, p4 = (tr.nodep[t] for t in (t1, t2, t3, t4))
        for a, b, c, d in ((p1, p2, p3, p4), (p1, p3, p2, p4),
                           (p1, p4, p2, p3)):
            lnl = quartet_likelihood(eng, a, b, c, d, q1, q2)
            results.append((a.number, b.number, c.number, d.number, lnl))
            if out:
                out.write(f'{a.number} {b.number} | {c.number} {d.number}: '
                          f'{lnl:f}\n')
        if checkpoint_fn and n_sets % checkpoint_interval == 0:
            offset = 0
            if out:
                out.flush()
                offset = out.tell()
            checkpoint_fn(n_sets, offset)

    if flavor == ALL_QUARTETS:
        for t1, t2, t3, t4 in itertools.combinations(range(1, n + 1), 4):
            emit(t1, t2, t3, t4)
    elif flavor == RANDOM_QUARTETS:
        rng = random.Random(seed)
        total = math.comb(n, 4)
        fraction = n_random / total
        count = 0
        for t1, t2, t3, t4 in itertools.combinations(range(1, n + 1), 4):
            if rng.random() < fraction:
                emit(t1, t2, t3, t4)
                count += 1
                if count >= n_random:
                    break
    else:
        for t1, t2, t3, t4 in itertools.product(*groups):
            emit(t1, t2, t3, t4)

    if use_wave:
        flush_wave()
    if out:
        out.close()
    return results


def parse_grouping_file(path: str, name_to_number) -> List[List[int]]:
    """Parse the 4-group quartet file: (A, B), (C, D), (E), (F, G);
    (quartets.c :69)."""
    text = open(path).read()
    groups = []
    for chunk in text.split(')'):
        if '(' not in chunk:
            continue
        names = chunk.split('(')[1]
        members = [nm.strip() for nm in names.split(',') if nm.strip()]
        groups.append([name_to_number[nm] for nm in members])
    assert len(groups) == 4, 'grouping file must define exactly 4 groups'
    return groups
