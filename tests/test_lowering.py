"""Extended-op lowering (frontend/tree.py::lower_extended).

The reference errors on these libfive ops (/root/reference/src/tape.cpp:
182-196, "Unimplemented opcode"); we lower the expressible ones into the
supported clause algebra at compile time, so archives using them load,
render, and differentiate.  Ground truth is NumPy's own functions at
random evaluation points (float32, modest tolerance — the lowered forms
are algebraically equal but not bit-identical compositions).
"""

import numpy as np
import pytest

from mpr_tpu import oracle
from mpr_tpu.frontend import frep, tree as T
from mpr_tpu.tape.tape import TapeError, compile_tree

RNG = np.random.default_rng(20260818)
PX = RNG.uniform(-2, 2, 2048).astype(np.float32)
PY = RNG.uniform(-2, 2, 2048).astype(np.float32)


def _eval(tree):
    return oracle.eval_f(compile_tree(tree), PX, PY)


def test_tan():
    got = _eval(T.tan(T.x()))
    np.testing.assert_allclose(got, np.tan(PX), rtol=2e-5, atol=1e-5)


def test_recip():
    got = _eval(T.Tree("recip", T.x()))
    np.testing.assert_allclose(got, 1.0 / PX, rtol=1e-6)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 7, -1, -3])
def test_pow_integer(n):
    got = _eval(T.x() ** n)
    np.testing.assert_allclose(got, np.power(PX, np.float32(n)),
                               rtol=3e-6, atol=1e-30)


def test_pow_fractional():
    got = _eval(abs(T.x()) ** 0.5)
    np.testing.assert_allclose(got, np.abs(PX) ** 0.5, rtol=1e-5)


def test_pow_non_constant_exponent():
    got = _eval(T.Tree("pow", abs(T.x()) + 0.5, T.y()))
    np.testing.assert_allclose(got, (np.abs(PX) + 0.5) ** PY, rtol=2e-4)


@pytest.mark.parametrize("n", [2, 4, 3])
def test_nth_root(n):
    got = _eval(T.Tree("nth-root", abs(T.x()) + 0.01, T.const(float(n))))
    np.testing.assert_allclose(got, (np.abs(PX) + 0.01) ** (1.0 / n),
                               rtol=1e-5)


def test_atan2():
    got = _eval(T.Tree("atan2", T.y(), T.x()))
    want = np.arctan2(PY, PX)
    # exact except the closed negative-x half-line (documented NaN seam);
    # random points never hit y == 0 exactly
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_atan2_branch_cut_is_nan():
    t = compile_tree(T.Tree("atan2", T.y(), T.x()))
    v = oracle.eval_f(t, np.float32([-1.0, 0.0]), np.float32([0.0, 0.0]))
    assert np.isnan(v).all()


def test_compare():
    got = _eval(T.Tree("compare", T.x(), T.y()))
    np.testing.assert_array_equal(got, np.sign(PX - PY))


def test_mod_still_rejects():
    with pytest.raises(TapeError, match="mod"):
        compile_tree(T.Tree("mod", T.x(), T.y()))


def test_lowered_ops_roundtrip_frep(tmp_path):
    """Extended ops survive the archive format and then compile here
    (the reference would refuse the same archive at Tape build time)."""
    spiral = T.Tree("atan2", T.y(), T.x()) + T.tan(T.x() * 0.2) \
        + T.x() ** 3
    p = tmp_path / "ext.frep"
    frep.dump([frep.ArchiveShape(tree=spiral, name="ext")], str(p))
    back = frep.load(str(p))[0].tree
    np.testing.assert_array_equal(_eval(spiral), _eval(back))


def test_lowering_shares_subdags():
    """The rewrite is memoized over the DAG: one lowered tan feeding two
    consumers compiles each clause once."""
    t = T.tan(T.x())
    expr = t + t * T.y()
    tape = compile_tree(expr, fuse=False)
    ops = list(tape.ops)
    from mpr_tpu.tape.opcodes import Op
    assert ops.count(int(Op.SIN_LHS)) == 1
    assert ops.count(int(Op.COS_LHS)) == 1


def test_gradients_through_lowered_ops():
    """Lowered clauses are differentiable like everything else: d/dx
    tan(c*x) matches the analytic derivative through the deriv oracle."""
    expr = T.tan(T.x() * 0.3)
    tape = compile_tree(expr)
    xs = np.float32([0.1, 0.5, -0.7])
    zeros = np.zeros_like(xs)
    v, dx, dy, dz = oracle.eval_d(tape, xs, zeros, zeros)
    want = 0.3 / np.cos(0.3 * xs) ** 2
    np.testing.assert_allclose(dx, want, rtol=1e-4)


def test_public_constructors():
    """atan2/pow_/nth_root/compare/recip are first-class DSL functions."""
    e = (T.atan2(T.y(), T.x()) + T.recip(T.x() + 3.0)
         + T.nth_root(abs(T.x()) + 1.0, 3) + T.compare(T.x(), T.y())
         + T.pow_(abs(T.y()) + 0.1, 1.5))
    got = _eval(e)
    want = (np.arctan2(PY, PX) + 1.0 / (PX + 3.0)
            + (np.abs(PX) + 1.0) ** (1 / 3)
            + np.sign(PX - PY) + (np.abs(PY) + 0.1) ** 1.5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Random-program battery: direct f64 Tree evaluation (no tape machinery at
# all) vs the oracle on the compiled-and-lowered tape.
# ---------------------------------------------------------------------------

_DIRECT_UNARY = {
    "square": lambda a: a * a, "sqrt": np.sqrt, "neg": np.negative,
    "sin": np.sin, "cos": np.cos, "asin": np.arcsin, "acos": np.arccos,
    "atan": np.arctan, "exp": np.exp, "abs": np.abs, "log": np.log,
    "tan": np.tan, "recip": lambda a: 1.0 / a,
}
_DIRECT_BINARY = {
    "add": np.add, "mul": np.multiply, "sub": np.subtract,
    "div": np.divide, "min": np.minimum, "max": np.maximum,
    "atan2": lambda a, b: np.arctan2(a, b), "pow": np.power,
    "nth-root": lambda a, n: np.power(a, 1.0 / n),
    "compare": lambda a, b: np.sign(a - b),
}


def _direct_eval(t, X, Y):
    """Evaluate a Tree directly in float64 — independent ground truth."""
    memo = {}
    for n in t.ordered_dfs():
        if n.op == "const":
            v = np.float64(n.value)
        elif n.op == "var-x":
            v = X
        elif n.op == "var-y":
            v = Y
        elif n.op == "var-z":
            v = np.zeros_like(X)
        elif n.op in _DIRECT_UNARY:
            v = _DIRECT_UNARY[n.op](memo[n.lhs.id])
        else:
            v = _DIRECT_BINARY[n.op](memo[n.lhs.id], memo[n.rhs.id])
        memo[n.id] = v
    return memo[t.id]


def _rand_ext_tree(rng, depth):
    if depth == 0 or rng.random() < 0.2:
        leaves = [T.x(), T.y(),
                  T.const(float(np.round(rng.uniform(-2, 2), 3)))]
        return leaves[rng.integers(len(leaves))]
    a = _rand_ext_tree(rng, depth - 1)
    r = rng.random()
    if r < 0.45:                                   # extended ops
        k = rng.integers(6)
        if k == 0:
            return T.tan(T.sin(a))                 # |arg|<=1 avoids poles
        if k == 1:
            return T.recip(T.square(a) + T.const(0.5))
        if k == 2:
            b = _rand_ext_tree(rng, depth - 1)
            return T.atan2(a, T.square(b) + T.const(0.25))  # x>0: no seam
        if k == 3:
            return a ** int(rng.integers(-3, 8))
        if k == 4:
            return T.nth_root(abs(a) + T.const(0.1),
                              float(rng.integers(2, 6)))
        return T.compare(a, _rand_ext_tree(rng, depth - 1))
    if r < 0.8:                                    # supported binaries
        b = _rand_ext_tree(rng, depth - 1)
        return [a + b, a - b, a * T.const(0.5) + b,
                T.minimum(a, b), T.maximum(a, b)][rng.integers(5)]
    return [T.sin(a), abs(a), T.sqrt(T.square(a) + T.const(0.01)),
            T.exp(T.minimum(a, T.const(2.0)))][rng.integers(4)]


def test_random_extended_programs():
    """30 random programs mixing extended + supported ops: the lowered
    compiled tape agrees with direct f64 NumPy evaluation of the tree."""
    rng = np.random.default_rng(20260818)
    X = rng.uniform(-1.5, 1.5, 512)
    Y = rng.uniform(-1.5, 1.5, 512)
    done = 0
    while done < 30:
        t = _rand_ext_tree(rng, 4)
        tape = compile_tree(t)
        if tape.length < 6:
            continue
        done += 1
        want = _direct_eval(t, X, Y)
        got = oracle.eval_f(tape, X.astype(np.float32),
                            Y.astype(np.float32)).astype(np.float64)
        ok = np.isfinite(want)
        assert ok.mean() > 0.9
        np.testing.assert_allclose(got[ok], want[ok], rtol=5e-3, atol=1e-3)
