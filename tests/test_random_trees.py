"""Property tests over RANDOM expression trees.

The model-based tests (test_oracle/test_eval_jax/test_unrolled) pin the
six bundled models; random program structure additionally exercises
opcode/operand-form combinations those models never emit (IMM_RHS forms,
acos/atan chains, deep min/max alternations, copy-elision paths in the
shortener).  Each tree is checked end to end:

  python-vs-native tape compiler bit-equality,
  oracle == scan interpreter == unrolled float chain at random points,
  interval soundness on random boxes,
  shorten(choices) exactness inside the box.

Domain discipline keeps every op total (sqrt/log/asin get safe-range
arguments) so equality is strict — no NaN escape hatch.
"""

import numpy as np
import pytest

from mpr_tpu import native, oracle
from mpr_tpu.frontend import tree as T
from mpr_tpu.tape.tape import compile_tree

N_TREES = 24


def _rand_tree(rng, depth):
    if depth == 0 or rng.random() < 0.15:
        leaves = [T.x(), T.y(), T.z(),
                  T.const(float(np.round(rng.uniform(-2, 2), 3)))]
        return leaves[rng.integers(len(leaves))]
    r = rng.random()
    a = _rand_tree(rng, depth - 1)
    if r < 0.45:                          # binary, all operand forms
        b = _rand_tree(rng, depth - 1)
        op = rng.integers(6)
        if op == 0:
            return a + b
        if op == 1:
            return a - b
        if op == 2:
            return a * b
        if op == 3:                       # safe division
            return a / (T.square(b) + T.const(0.5))
        if op == 4:
            return T.minimum(a, b)
        return T.maximum(a, b)
    if r < 0.6:                           # imm forms (const on one side)
        c = T.const(float(np.round(rng.uniform(-2, 2), 3)))
        forms = [a + c, c - a, a * c, c / (T.square(a) + T.const(0.5))]
        return forms[rng.integers(len(forms))]
    op = rng.integers(9)                  # unary, domain-safe
    if op == 0:
        return -a
    if op == 1:
        return T.square(a)
    if op == 2:
        return T.sqrt(T.square(a) + T.const(0.01))
    if op == 3:
        return T.sin(a)
    if op == 4:
        return T.cos(a)
    if op == 5:
        return abs(a)
    if op == 6:
        return T.exp(T.minimum(a, T.const(3.0)))
    if op == 7:
        return T.log(T.square(a) + T.const(0.5))
    return T.atan(a)


def _trees():
    rng = np.random.default_rng(20260817)
    out = []
    while len(out) < N_TREES:
        t = _rand_tree(rng, 5)
        tape = compile_tree(t)
        if tape.length >= 8:              # skip degenerate folds
            out.append((t, tape))
    return out

_TREES = _trees()


@pytest.mark.parametrize("i", range(N_TREES))
def test_native_compiler_matches_python(i):
    if native.lib() is None:
        pytest.skip("native compiler unavailable")
    t, tape = _TREES[i]
    tn = compile_tree(t, backend="native")
    for f in ("ops", "outs", "lhss", "rhss", "imms"):
        assert np.array_equal(getattr(tape, f), getattr(tn, f)), f


def test_engines_agree_at_random_points():
    import jax.numpy as jnp
    from mpr_tpu.ops import eval_scan, unrolled_eval as ue
    from mpr_tpu.ops.tape_data import TapeData
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1, 1, (3, 256)).astype(np.float32)
    for t, tape in _TREES:
        want = oracle.eval_f(tape, *pts)
        got_scan = np.asarray(eval_scan.eval_f(
            TapeData.from_tape(tape), *(jnp.asarray(p) for p in pts)))
        got_unr = np.asarray(ue.build_float(tape)(
            *(jnp.asarray(p) for p in pts)))
        np.testing.assert_allclose(got_scan, want, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(got_unr, want, rtol=2e-6, atol=2e-6)


def test_interval_soundness_random_trees():
    rng = np.random.default_rng(11)
    n = 64
    for t, tape in _TREES:
        lo = rng.uniform(-1, 1, (3, n)).astype(np.float32)
        hi = (lo + rng.uniform(0, 0.5, (3, n))).astype(np.float32)
        il, ih, _ = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1],
                                  lo[2], hi[2])
        u = rng.uniform(0, 1, (3, n)).astype(np.float32)
        p = lo + u * (hi - lo)
        v = oracle.eval_f(tape, *p)
        # float32 eval slop (no directed rounding — documented divergence)
        eps = 1e-4 + 1e-5 * np.maximum(np.abs(il), np.abs(ih))
        ok = np.isnan(il) | np.isnan(ih) | (
            (v >= il - eps) & (v <= ih + eps))
        assert ok.all(), (int(np.argmin(ok)), il[~ok], ih[~ok], v[~ok])


def test_shorten_exact_inside_box():
    rng = np.random.default_rng(13)
    for t, tape in _TREES:
        if tape.num_choices == 0:
            continue
        lo = rng.uniform(-1, 0.5, 3).astype(np.float32)
        hi = (lo + rng.uniform(0.1, 0.5, 3).astype(np.float32))
        _, _, choices = oracle.eval_i(tape, *(np.float32(v) for pair in
                                              zip(lo, hi) for v in pair))
        short = oracle.shorten(tape, choices)
        assert short.length <= tape.length
        u = rng.uniform(0, 1, (3, 64)).astype(np.float32)
        p = lo[:, None] + u * (hi - lo)[:, None]
        assert np.array_equal(oracle.eval_f(tape, *p),
                              oracle.eval_f(short, *p))


def test_frep_roundtrip_random_trees():
    """.frep archive round-trip preserves random program structure
    bit-exactly (writer previously only exercised on the six models)."""
    from mpr_tpu.frontend import frep
    shapes_in = [frep.ArchiveShape(tree=t, name=f"s{i}")
                 for i, (t, _) in enumerate(_TREES[:8])]
    back = frep.loads(frep.dumps(shapes_in))
    assert len(back) == len(shapes_in)
    for (t, tape), s in zip(_TREES[:8], back):
        t2 = compile_tree(s.tree)
        for f in ("ops", "outs", "lhss", "rhss", "imms"):
            assert np.array_equal(getattr(tape, f), getattr(t2, f)), f


def test_deriv_matches_oracle_random_trees():
    """Forward-mode dual numbers agree between the NumPy oracle and the
    unrolled deriv chain on random programs (min/max pick branches
    discontinuously — /root/reference/inc/gpu_deriv.hpp:106-130; random
    float points make exact ties measure-zero)."""
    import jax.numpy as jnp
    from mpr_tpu.ops import unrolled_eval as ue
    rng = np.random.default_rng(17)
    pts = rng.uniform(-1, 1, (3, 128)).astype(np.float32)
    for t, tape in _TREES:
        want = oracle.eval_d(tape, *pts)           # (v, dx, dy, dz)
        got = ue.build_deriv(tape)(*(jnp.asarray(p) for p in pts))
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(g), w, rtol=3e-5,
                                       atol=3e-5)
