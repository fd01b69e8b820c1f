"""Expression frontend: hash-consed closed-form implicit-surface trees.

TPU-native replacement for ``libfive::Tree`` as used by the reference
(``/root/reference/src/tape.cpp:21-228`` consumes the tree API; the libfive
submodule itself is external).  We support exactly the op set the reference
tape compiler accepts (``/root/reference/inc/gpu_opcode.hpp:18-56``) plus the
few libfive ops it rejects (TAN, RECIP, ATAN2, POW, NTH_ROOT, MOD, NANFILL,
COMPARE) so that ``.frep`` archives deserialize losslessly; the tape compiler
lowers or rejects those exactly like the reference does
(``/root/reference/src/tape.cpp:182-196``).

Design notes (TPU-first):
  * Nodes are immutable and hash-consed (a global intern table), mirroring
    libfive's ``Cache`` dedup so common subexpressions share ids.  Ids are
    dense ints -> arrays index naturally.
  * No torch / no CUDA anywhere; this layer is pure Python + NumPy scalars.
"""

from __future__ import annotations

import math
import struct
import threading
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Op names.  These follow libfive's naming (see SURVEY.md section 2.1); the
# GPU-facing opcode enum lives in mpr_tpu/tape/opcodes.py.
# ---------------------------------------------------------------------------

CONSTANT = "const"
VAR_X = "var-x"
VAR_Y = "var-y"
VAR_Z = "var-z"
VAR_FREE = "var-free"

UNARY_OPS = (
    "square", "sqrt", "neg", "sin", "cos", "asin", "acos", "atan",
    "exp", "abs", "log",
    # accepted by the frontend, rejected by the tape compiler (parity with
    # /root/reference/src/tape.cpp:182-196):
    "tan", "recip",
)

BINARY_OPS = (
    "add", "mul", "min", "max", "sub", "div",
    # fused compound ops, produced by tape/fuse.py (not user-facing):
    "hypot", "addsq",
    # frontend-only (tape compiler rejects, like the reference):
    "atan2", "pow", "nth-root", "mod", "nanfill", "compare",
)

LEAF_OPS = (CONSTANT, VAR_X, VAR_Y, VAR_Z, VAR_FREE)

_ALL_OPS = set(LEAF_OPS) | set(UNARY_OPS) | set(BINARY_OPS)

_COMMUTATIVE = {"add", "mul", "min", "max"}


class Tree:
    """An immutable, hash-consed expression node.

    Equality is identity (like ``libfive::Tree::Id``); the intern table
    guarantees structurally equal nodes are the same object.
    """

    __slots__ = ("op", "lhs", "rhs", "value", "_id", "__weakref__")

    _intern: Dict[tuple, "Tree"] = {}
    _lock = threading.Lock()
    _next_id = [0]

    def __new__(cls, op: str, lhs: Optional["Tree"] = None,
                rhs: Optional["Tree"] = None, value: float = 0.0):
        if op not in _ALL_OPS:
            raise ValueError(f"unknown op {op!r}")
        if op == CONSTANT:
            # Canonicalize constants through float32 like the reference's
            # float-valued immediates (/root/reference/inc/clause.hpp:22).
            value = struct.unpack("<f", struct.pack("<f", float(value)))[0]
            key = (op, value)
        elif op in UNARY_OPS:
            key = (op, id(lhs))
        elif op in BINARY_OPS:
            key = (op, id(lhs), id(rhs))
        else:
            key = (op,)
        with cls._lock:
            node = cls._intern.get(key)
            if node is not None:
                return node
            node = object.__new__(cls)
            node.op = op
            node.lhs = lhs
            node.rhs = rhs
            node.value = value if op == CONSTANT else None
            node._id = cls._next_id[0]
            cls._next_id[0] += 1
            cls._intern[key] = node
            return node

    # -- structural helpers --------------------------------------------------

    @property
    def id(self) -> int:
        return self._id

    def children(self) -> Tuple["Tree", ...]:
        if self.op in BINARY_OPS:
            return (self.lhs, self.rhs)
        if self.op in UNARY_OPS:
            return (self.lhs,)
        return ()

    def ordered_dfs(self) -> List["Tree"]:
        """Topological order with children before parents, each node once.

        Mirrors ``libfive::Tree::orderedDfs`` as consumed by the reference
        tape compiler (/root/reference/src/tape.cpp:25): a deterministic
        post-order DFS over the DAG.
        """
        seen = set()
        out: List[Tree] = []
        stack: List[Tuple[Tree, bool]] = [(self, False)]
        while stack:
            node, expanded = stack.pop()
            if node._id in seen:
                continue
            if expanded:
                seen.add(node._id)
                out.append(node)
            else:
                stack.append((node, True))
                for c in reversed(node.children()):
                    if c._id not in seen:
                        stack.append((c, False))
        return out

    def remap(self, x: "Tree", y: "Tree", z: "Tree") -> "Tree":
        """Substitute the axis variables (libfive ``Tree::remap`` analog)."""
        memo: Dict[int, Tree] = {}

        order = self.ordered_dfs()
        for node in order:
            if node.op == VAR_X:
                memo[node._id] = x
            elif node.op == VAR_Y:
                memo[node._id] = y
            elif node.op == VAR_Z:
                memo[node._id] = z
            elif node.op in UNARY_OPS:
                memo[node._id] = Tree(node.op, memo[node.lhs._id])
            elif node.op in BINARY_OPS:
                memo[node._id] = Tree(node.op, memo[node.lhs._id],
                                      memo[node.rhs._id])
            else:
                memo[node._id] = node
        return memo[self._id]

    def __len__(self) -> int:
        return len(self.ordered_dfs())

    def __repr__(self) -> str:
        if self.op == CONSTANT:
            return f"Tree({self.value})"
        return f"Tree<{self.op}#{self._id}>"

    # -- operator overloads ---------------------------------------------------

    @staticmethod
    def wrap(v) -> "Tree":
        if isinstance(v, Tree):
            return v
        return Tree(CONSTANT, value=float(v))

    def __add__(self, o): return _binary("add", self, Tree.wrap(o))
    def __radd__(self, o): return _binary("add", Tree.wrap(o), self)
    def __mul__(self, o): return _binary("mul", self, Tree.wrap(o))
    def __rmul__(self, o): return _binary("mul", Tree.wrap(o), self)
    def __sub__(self, o): return _binary("sub", self, Tree.wrap(o))
    def __rsub__(self, o): return _binary("sub", Tree.wrap(o), self)
    def __truediv__(self, o): return _binary("div", self, Tree.wrap(o))
    def __rtruediv__(self, o): return _binary("div", Tree.wrap(o), self)
    def __neg__(self): return neg(self)          # folds constants
    def __abs__(self): return abs_(self)
    def __pow__(self, o): return _binary("pow", self, Tree.wrap(o))


def _binary(op: str, a: Tree, b: Tree) -> Tree:
    """Build a binary node with constant and identity folding.

    Mirrors libfive's ``Cache::checkCommutative``/``checkIdentity``: the
    reference's trees arrive pre-folded through the Cache, so folding here
    keeps our tapes structurally comparable.
    """
    if a.op == CONSTANT and b.op == CONSTANT:
        f = _FOLD.get(op)
        if f is not None:
            # total fold (numpy semantics: x/0 -> ±inf/nan) — a clause
            # with two constant operands has no register form, so the
            # fold must never fail (see _unary_fn)
            with np.errstate(all="ignore"):
                return Tree(CONSTANT, value=float(f(a.value, b.value)))
    # identity folding (libfive Cache::checkIdentity)
    if op == "add":
        if a.op == CONSTANT and a.value == 0.0:
            return b
        if b.op == CONSTANT and b.value == 0.0:
            return a
    elif op == "sub":
        if b.op == CONSTANT and b.value == 0.0:
            return a
        if a.op == CONSTANT and a.value == 0.0:
            return Tree("neg", b)
    elif op == "mul":
        if a.op == CONSTANT:
            if a.value == 0.0:
                return a
            if a.value == 1.0:
                return b
        if b.op == CONSTANT:
            if b.value == 0.0:
                return b
            if b.value == 1.0:
                return a
    elif op == "div":
        if b.op == CONSTANT and b.value == 1.0:
            return a
    return Tree(op, a, b)


_FOLD = {
    "add": lambda a, b: a + b,
    "mul": lambda a, b: a * b,
    "sub": lambda a, b: a - b,
    "div": np.divide,
    "min": min,
    "max": max,
    "pow": np.power,
}


# ---------------------------------------------------------------------------
# Public constructors
# ---------------------------------------------------------------------------

def x() -> Tree: return Tree(VAR_X)
def y() -> Tree: return Tree(VAR_Y)
def z() -> Tree: return Tree(VAR_Z)
def const(v: float) -> Tree: return Tree(CONSTANT, value=v)


def _unary_fn(op):
    def f(t: Tree) -> Tree:
        t = Tree.wrap(t)
        if t.op == CONSTANT:
            g = _UFOLD.get(op)
            if g is not None:
                # numpy semantics make the fold TOTAL (sqrt(-1) -> nan,
                # log(0) -> -inf, ...): exactly what the evaluators
                # would compute, and a constant operand must never
                # survive folding — the tape compiler has no register
                # form for it (clauses reference constants only through
                # the immediate field)
                with np.errstate(all="ignore"):
                    return Tree(CONSTANT, value=float(g(t.value)))
        return Tree(op, t)
    f.__name__ = op
    return f


_UFOLD = {
    "square": lambda v: v * v,
    "sqrt": np.sqrt,
    "neg": lambda v: -v,
    "sin": np.sin,
    "cos": np.cos,
    "asin": np.arcsin,
    "acos": np.arccos,
    "atan": np.arctan,
    "exp": np.exp,
    "abs": abs,
    "log": np.log,
    "tan": np.tan,
    "recip": lambda v: np.divide(1.0, v),
}

square = _unary_fn("square")
sqrt = _unary_fn("sqrt")
sin = _unary_fn("sin")
cos = _unary_fn("cos")
asin = _unary_fn("asin")
acos = _unary_fn("acos")
atan = _unary_fn("atan")
exp = _unary_fn("exp")
log = _unary_fn("log")
tan = _unary_fn("tan")
neg = _unary_fn("neg")
abs_ = _unary_fn("abs")


def minimum(a, b) -> Tree:
    return _binary("min", Tree.wrap(a), Tree.wrap(b))


def maximum(a, b) -> Tree:
    return _binary("max", Tree.wrap(a), Tree.wrap(b))
