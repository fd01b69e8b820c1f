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
