"""Multifurcating constraint trees (-g).

Port of the reference's constraint machinery (reference: examl/treeIO.c
treeReadLenMULT :1036 / addElementLenMULT :921, examl/searchAlgo.c
checker :69 and the constraint gate in testInsertBIG :690-715): the
constraint tree's multifurcations are resolved randomly (seeded) into a
binary starting tree, every node is tagged with the id of the
multifurcation group it came from, and SPR insertions are rejected when
the pruned subtree would cross into a different group.

The random resolution uses Python's PRNG rather than libc rand(); the
resolved starting tree therefore differs from the reference for the same
seed, but satisfies the same constraint (any resolution is an equally
valid starting point — the search only keeps constraint-compatible
moves).
"""
from __future__ import annotations

import random
from typing import List

import numpy as np

from ..tree import Node, Tree
from .newick import _Lexer


def read_constraint_tree(text: str, tr: Tree, seed: int) -> np.ndarray:
    """Parse a multifurcating constraint tree into tr (randomly resolved)
    and return the constraint vector (group id per node number)."""
    rng = random.Random(seed)
    lex = _Lexer(text)
    constraint = np.full(2 * tr.mxtips, -1, dtype=np.int64)

    for i in range(1, 2 * tr.mxtips):
        base = tr.nodep[i]
        if base is None:
            continue
        base.back = None
        if not tr.is_tip(i):
            base.next.back = None
            base.next.next.back = None

    tr.start = tr.nodep[1]
    tr.ntips = 0
    tr.nextnode = tr.mxtips + 1
    tr.rooted = False
    part_count = [0]

    p = tr.nodep[tr.nextnode]
    tr.nextnode += 1

    while True:
        ch = lex.get_nonblank()
        if ch == '(':
            break
        if ch == '':
            raise ValueError('no tree found')

    _add_element_mult(lex, tr, p, 0, part_count, constraint, rng)
    lex.need(',')
    _add_element_mult(lex, tr, p.next, 0, part_count, constraint, rng)

    ch = lex.get_nonblank()
    if ch == ',':
        _add_element_mult(lex, tr, p.next.next, 0, part_count, constraint,
                          rng)
        # extra root-level children: attach by random edge insertion
        while True:
            ch = lex.get_nonblank()
            if ch != ',':
                break
            n = tr.nextnode
            tr.nextnode += 1
            r = tr.nodep[n]
            constraint[r.number] = 0
            target = p.next.next if rng.random() >= 0.5 else p.next
            s = target.back
            r.back = target
            target.back = r
            r.next.back = s
            s.back = r.next
            _add_element_mult(lex, tr, r.next.next, 0, part_count,
                              constraint, rng)
        if ch:
            lex.ungetch()
    else:
        if ch:
            lex.ungetch()

    lex.need(')')
    lex.flush_label()
    lex.flush_len()
    lex.need(';')

    if tr.ntips != tr.mxtips:
        raise ValueError(
            f'constraint tree has {tr.ntips} taxa, alignment {tr.mxtips}; '
            f'the constraint must contain all taxa')
    return constraint


def _add_element_mult(lex, tr: Tree, p: Node, group: int, part_count,
                      constraint, rng) -> None:
    constraint[p.number] = group
    ch = lex.get_nonblank()
    if ch == '(':
        part_count[0] += 1
        my_group = part_count[0]
        n = tr.nextnode
        tr.nextnode += 1
        q = tr.nodep[n]
        constraint[q.number] = my_group
        _add_element_mult(lex, tr, q.next, my_group, part_count, constraint,
                          rng)
        lex.need(',')
        _add_element_mult(lex, tr, q.next.next, my_group, part_count,
                          constraint, rng)
        tr.hookup_default(p, q)
        # random resolution of additional children of this multifurcation
        while True:
            ch = lex.get_nonblank()
            if ch != ',':
                break
            n = tr.nextnode
            tr.nextnode += 1
            r = tr.nodep[n]
            constraint[r.number] = my_group
            target = q.next if rng.random() < 0.5 else q.next.next
            s = target.back
            r.back = target
            target.back = r
            r.next.back = s
            s.back = r.next
            _add_element_mult(lex, tr, r.next.next, my_group, part_count,
                              constraint, rng)
        if ch != ')':
            raise ValueError('missing ) in constraint tree')
        lex.flush_label()
    else:
        lex.ungetch()
        name = lex.read_label()
        if name not in tr.name_to_number:
            raise ValueError(f'unknown taxon {name!r} in constraint tree')
        n = tr.name_to_number[name]
        q = tr.nodep[n]
        constraint[q.number] = group
        if tr.start.number > n:
            tr.start = q
        tr.ntips += 1
        tr.hookup_default(p, q)
    lex.flush_len()


def checker(tr: Tree, constraint: np.ndarray, p: Node) -> int:
    """First group id found in the subtree rooted at p
    (searchAlgo.c checker :69)."""
    group = constraint[p.number]
    if tr.is_tip(p.number):
        return int(group)
    if group != -9:
        return int(group)
    group = checker(tr, constraint, p.next.back)
    if group != -9:
        return group
    return checker(tr, constraint, p.next.next.back)
