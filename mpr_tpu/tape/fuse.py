"""Compile-time peephole fusion: collapse hot clause patterns.

On TPU the interpreter's cost is (steps x ~30 ns) regardless of op
complexity — a fused compound op is nearly free per step, so every fused
clause is a direct win (no reference counterpart: the SIMT interpreter
gains nothing from fusion because its registers live in real registers).

Patterns (matched on the hash-consed DAG with use counts, so slot
allocation downstream stays untouched):

  sqrt(square(x) + square(y))  -> hypot(x, y)      [4 clauses -> 1]
       (the distance-field workhorse; prospero has ~250 of these)
  square(x) + b                -> addsq(x, b)      [2 -> 1]
  neg(a - b)                   -> b - a            [2 -> 1, free:
       reuses SUB's existing IMM/reg forms]

Intermediates are fused only when used exactly once; fusion with a
constant operand is skipped (the unfused imm-forms are cheaper).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, NamedTuple, Set, Tuple

from ..frontend.tree import CONSTANT, Tree
from .opcodes import Op


class AccSite(NamedTuple):
    """An outer min/max fused to OUTER(acc, INNER(a, b)); see opcodes.py."""
    gpu_op: int
    a: Tree
    b: Tree
    c: Tree          # the accumulator operand (dies at this clause)


class AccPlan(NamedTuple):
    sites: Dict[int, AccSite]   # outer node id -> site
    dead: Set[int]              # fused-away inner node ids


_ACC_BY_OPS = {
    ("min", "min"): int(Op.ACCMIN_MIN),
    ("min", "max"): int(Op.ACCMIN_MAX),
    ("max", "min"): int(Op.ACCMAX_MIN),
    ("max", "max"): int(Op.ACCMAX_MAX),
}


def acc_plan(tree: Tree) -> AccPlan:
    """Plan min/max accumulate fusion: outer = OUTER(INNER(a,b), c) with
    the inner AND c single-use and none of a/b/c constant (imm forms are
    cheaper unfused).  CSG unions/intersections are min/max trees, so
    alternating levels fuse (~half the chain clauses disappear)."""
    order = tree.ordered_dfs()
    uses: Counter = Counter()
    for n in order:
        for ch in n.children():
            uses[ch.id] += 1

    sites: Dict[int, AccSite] = {}
    dead: Set[int] = set()
    for n in order:
        if n.op not in ("min", "max"):
            continue
        for inner, other in ((n.lhs, n.rhs), (n.rhs, n.lhs)):
            if (inner.op in ("min", "max") and uses[inner.id] == 1
                    and inner.id not in dead and inner.id not in sites
                    and uses[other.id] == 1
                    and inner.lhs.op != CONSTANT
                    and inner.rhs.op != CONSTANT
                    and other.op != CONSTANT
                    and other.id not in (inner.lhs.id, inner.rhs.id)):
                sites[n.id] = AccSite(_ACC_BY_OPS[(n.op, inner.op)],
                                      inner.lhs, inner.rhs, other)
                dead.add(inner.id)
                break
    return AccPlan(sites, dead)


_CACHE: Dict[Tuple[int, bool], Tuple[Tree, "AccPlan"]] = {}

# ACC min/max fusion cuts tape length a further ~10-15% (prospero:
# 5435 -> 4660) but accumulator chains are SERIAL dependencies, so the
# opcode-run scheduler cannot batch them — runs fragment (522 -> 965 on
# prospero) and the per-run lax.switch dispatch cost outweighs the step
# savings (measured: 4.0 -> 7.0 ms @1024).  The machinery stays fully
# wired and tested; flip on when run dispatch is redesigned.
ACC_DEFAULT = False


def fuse_tree(tree: Tree) -> Tree:
    return fused_with_plan(tree)[0]


def fused_with_plan(tree: Tree, acc: bool = None) -> Tuple[Tree, "AccPlan"]:
    """Peephole-rewrite + ACC plan, memoized — trees are interned and
    immutable, so the result is cached by node id (compile_tree may
    recompile the same shape for several image sizes)."""
    if acc is None:
        acc = ACC_DEFAULT
    key = (tree.id, acc)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    fused = _fuse(tree)
    out = (fused, acc_plan(fused) if acc else AccPlan({}, set()))
    if len(_CACHE) > 64:
        _CACHE.clear()
    _CACHE[key] = out
    return out


def _fuse(tree: Tree) -> Tree:
    order = tree.ordered_dfs()
    uses: Counter = Counter()
    for n in order:
        for c in n.children():
            uses[c.id] += 1

    memo: Dict[int, Tree] = {}
    for n in order:
        if n.op == "sqrt":
            A = n.lhs
            if (A.op == "add" and uses[A.id] == 1
                    and A.lhs.op == "square" and A.rhs.op == "square"
                    and uses[A.lhs.id] == 1 and uses[A.rhs.id] == 1):
                memo[n.id] = Tree("hypot", memo[A.lhs.lhs.id],
                                  memo[A.rhs.lhs.id])
                continue
        if n.op == "add":
            if (n.lhs.op == "square" and uses[n.lhs.id] == 1
                    and n.rhs.op != CONSTANT):
                memo[n.id] = Tree("addsq", memo[n.lhs.lhs.id],
                                  memo[n.rhs.id])
                continue
            if (n.rhs.op == "square" and uses[n.rhs.id] == 1
                    and n.lhs.op != CONSTANT):
                memo[n.id] = Tree("addsq", memo[n.rhs.lhs.id],
                                  memo[n.lhs.id])
                continue
        if n.op == "neg" and n.lhs.op == "sub" and uses[n.lhs.id] == 1:
            S = n.lhs
            memo[n.id] = Tree("sub", memo[S.rhs.id], memo[S.lhs.id])
            continue
        if n.children():
            kids = [memo[c.id] for c in n.children()]
            memo[n.id] = (Tree(n.op, kids[0]) if len(kids) == 1
                          else Tree(n.op, kids[0], kids[1]))
        else:
            memo[n.id] = n
    return memo[tree.id]
