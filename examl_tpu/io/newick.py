"""Newick tree reading/writing with the reference's exact semantics.

Reading (reference: examl/treeIO.c treeReadLen :798, addElementLen :620):
inner-node numbers are assigned in '(' encounter order starting at mxtips+1;
branch lengths in the input are *ignored* for starting trees (all branches
reset to defaultz); a rooted (bifurcating) input tree is unrooted by fusing
the root's two edges. tr->start becomes the lowest-numbered tip.

Writing (treeIO.c Tree2String :324, getBranchLength :176): branch length
printed is -log(z) (per-class average weighted by partition contributions
when numBranches > 1), format %8.20f.
"""
from __future__ import annotations

import io
import math
from typing import Optional

from ..constants import ZMIN
from ..tree import Node, Tree


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def getch(self) -> str:
        if self.pos >= len(self.text):
            return ''
        ch = self.text[self.pos]
        self.pos += 1
        return ch

    def ungetch(self) -> None:
        self.pos -= 1

    def get_nonblank(self) -> str:
        while True:
            ch = self.getch()
            if ch == '':
                return ch
            if ch == '[':  # skip comment
                while ch and ch != ']':
                    ch = self.getch()
                continue
            if not ch.isspace():
                return ch

    def flush_label(self) -> None:
        ch = self.get_nonblank()
        while ch and ch not in ':,()[];':
            ch = self.getch()
        if ch:
            self.ungetch()

    def read_label(self) -> str:
        chars = []
        ch = self.get_nonblank()
        while ch and ch not in ':,()[];':
            if not ch.isspace():
                chars.append(ch)
            ch = self.getch()
        if ch:
            self.ungetch()
        return ''.join(chars)

    def flush_len(self) -> None:
        ch = self.get_nonblank()
        if ch == ':':
            self.read_label()  # consume the number
        elif ch:
            self.ungetch()

    def need(self, want: str) -> None:
        ch = self.get_nonblank()
        if ch != want:
            raise ValueError(f"expected {want!r} in tree, found {ch!r} at "
                             f"position {self.pos}")


def parse_newick(text: str, tr: Tree, read_branches: bool = False) -> None:
    """Parse a Newick string into tr (mirrors treeReadLen)."""
    lex = _Lexer(text)

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

    p = tr.nodep[tr.nextnode]
    tr.nextnode += 1

    while True:
        ch = lex.get_nonblank()
        if ch == '(':
            break
        if ch == '':
            raise ValueError('no tree found')

    _add_element(lex, tr, p, read_branches)
    lex.need(',')
    _add_element(lex, tr, p.next, read_branches)
    if not tr.rooted:
        ch = lex.get_nonblank()
        if ch == ',':
            _add_element(lex, tr, p.next.next, read_branches)
        else:
            tr.rooted = True
            if ch:
                lex.ungetch()
    lex.need(')')
    lex.flush_label()
    lex.flush_len()
    lex.need(';')

    if tr.rooted:
        p.next.next.back = None
        _uproot(tr, p.next.next, read_branches)

    if tr.ntips != tr.mxtips:
        raise ValueError(f'tree has {tr.ntips} tips, alignment {tr.mxtips}')


def _add_element(lex: _Lexer, tr: Tree, p: Node, read_branches: bool) -> None:
    ch = lex.get_nonblank()
    if ch == '(':
        n = tr.nextnode
        tr.nextnode += 1
        if n > 2 * tr.mxtips - 2:
            if tr.rooted or n > 2 * tr.mxtips - 1:
                raise ValueError('too many inner nodes; tree rooted?')
            tr.rooted = True
        q = tr.nodep[n]
        _add_element(lex, tr, q.next, read_branches)
        lex.need(',')
        _add_element(lex, tr, q.next.next, read_branches)
        lex.need(')')
        lex.flush_label()
    else:
        lex.ungetch()
        name = lex.read_label()
        if name not in tr.name_to_number:
            raise ValueError(f'unknown taxon {name!r} in tree')
        n = tr.name_to_number[name]
        q = tr.nodep[n]
        if q.back is not None:
            raise ValueError(f'taxon {name!r} appears twice')
        if tr.start.number > n:
            tr.start = q
        tr.ntips += 1

    if read_branches:
        lex.need(':')
        branch = float(lex.read_label())
        tr.hookup(p, q, [branch] * tr.num_branches)
    else:
        lex.flush_len()
        tr.hookup_default(p, q)


def _uproot(tr: Tree, p: Node, read_branches: bool) -> None:
    """Remove the artificial root ring p (treeIO.c uprootTree :710)."""
    assert p.back is None
    tr.nextnode -= 1
    n = tr.nextnode
    assert n == tr.mxtips + tr.ntips - 1

    q = p.next.back
    r = p.next.next.back
    if read_branches:
        tr.hookup(q, r, [qz + rz for qz, rz in zip(q.z, r.z)])
    else:
        tr.hookup_default(q, r)

    base = tr.nodep[p.number]
    if tr.ntips > 2 and base.number != n:
        # transfer the last inner node's connections onto the freed ring
        last = tr.nodep[n]
        for mine, theirs in ((base, last), (base.next, last.next),
                             (base.next.next, last.next.next)):
            tr.hookup(mine, theirs.back, theirs.z)
        last.back = last.next.back = last.next.next.back = None
    else:
        base.back = base.next.back = base.next.next.back = None

    start = _find_any_tip(tr.nodep[tr.mxtips + 1], tr.mxtips)
    tr.start = start
    tr.rooted = False


def _find_any_tip(p: Node, mxtips: int) -> Node:
    while p.number > mxtips:
        p = p.next.back
    return p


def branch_length(tr: Tree, p: Node, per_gene: int = -2,
                  partition_contributions=None) -> float:
    """-log(z) branch length for output (treeIO.c getBranchLength :176)."""
    if tr.num_branches == 1:
        z = max(p.z[0], ZMIN)
        return -math.log(z)
    if per_gene == -2:  # SUMMARIZE_LH
        total = 0.0
        for i in range(tr.num_branches):
            z = max(p.z[i], ZMIN)
            total += -math.log(z) * partition_contributions[i]
        return total
    z = max(p.z[per_gene], ZMIN)
    return -math.log(z)


def write_newick(tr: Tree, root: Optional[Node] = None, with_lengths: bool = True,
                 per_gene: int = -2, partition_contributions=None) -> str:
    """Serialize the tree rooted at `root` (default tr.start.back), printing
    each edge's length on the child side, exactly like Tree2StringREC
    (treeIO.c:234-313): the root inner node becomes a trifurcation closed by
    ':0.0'."""
    if root is None:
        root = tr.start.back

    out = io.StringIO()

    def rec(p: Node):
        if tr.is_tip(p.number):
            out.write(tr.taxon_names[p.number - 1])
        else:
            out.write('(')
            rec(p.next.back)
            out.write(',')
            rec(p.next.next.back)
            if p is root:
                out.write(',')
                rec(p.back)
            out.write(')')
        if p is root:
            out.write(':0.0;' if with_lengths else ';')
        elif with_lengths:
            out.write(':%8.20f' % branch_length(tr, p, per_gene,
                                                partition_contributions))

    rec(root)
    return out.getvalue()
