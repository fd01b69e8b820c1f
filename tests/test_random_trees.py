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


def test_widened_intervals_contain_unwidened_and_are_sound():
    """config.widen_intervals (the directed-rounding substitute,
    interval_math.widen): widened boxes must CONTAIN the round-to-nearest
    boxes, and must cover float64 point evaluations with essentially no
    slop — where the unwidened test above needs a 1e-4 allowance.
    Ref: /root/reference/inc/gpu_interval.hpp:18-43 (__fadd_rd/__fadd_ru)."""
    from mpr_tpu import config
    rng = np.random.default_rng(17)
    n = 64
    for t, tape in _TREES:
        lo = rng.uniform(-1, 1, (3, n)).astype(np.float32)
        hi = (lo + rng.uniform(0, 0.5, (3, n))).astype(np.float32)
        il0, ih0, _ = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1],
                                    lo[2], hi[2])
        with config.override(widen_intervals=True):
            il1, ih1, _ = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1],
                                        lo[2], hi[2])
        both = ~(np.isnan(il0) | np.isnan(il1))
        # containment: widened ⊇ round-to-nearest
        assert (il1[both] <= il0[both]).all()
        assert (ih1[both] >= ih0[both]).all()
        # soundness vs near-real (float64) point values, ~zero slop: the
        # widened endpoints bound the REAL range; float64 point evals sit
        # within ~1e-12 relative of it
        u = rng.uniform(0, 1, (3, n)).astype(np.float32)
        p = (lo + u * (hi - lo)).astype(np.float32)
        v64 = _eval_f64(tape, p)
        eps = 1e-9 + 1e-9 * np.abs(v64)
        ok = np.isnan(il1) | np.isnan(ih1) | (
            (v64 >= il1 - eps) & (v64 <= ih1 + eps))
        assert ok.all(), (il1[~ok], ih1[~ok], v64[~ok])


def _eval_f64(tape, p):
    """Float64 tape point-eval (the 'near-real-arithmetic' reference for
    the widening soundness test).  sin/cos excluded upstream? No — the
    interval quirk makes sin/cos [-1,1], which covers any point value."""
    from mpr_tpu.tape.opcodes import Op
    S = tape.num_slots
    v = np.zeros((S, p.shape[1]), dtype=np.float64)
    sx, sy, sz = tape.axis_slots
    if sx:
        v[sx] = p[0]
    if sy:
        v[sy] = p[1]
    if sz:
        v[sz] = p[2]
    with np.errstate(all="ignore"):
        for ti in range(tape.length):
            op = int(tape.ops[ti])
            o, l, r = (int(tape.outs[ti]), int(tape.lhss[ti]),
                       int(tape.rhss[ti]))
            imm = float(np.float32(tape.imms[ti]))
            a, b = v[l], v[r]
            if op == Op.SQUARE_LHS:
                v[o] = a * a
            elif op == Op.SQRT_LHS:
                v[o] = np.sqrt(a)
            elif op == Op.NEG_LHS:
                v[o] = -a
            elif op == Op.SIN_LHS:
                v[o] = np.sin(a)
            elif op == Op.COS_LHS:
                v[o] = np.cos(a)
            elif op == Op.ASIN_LHS:
                v[o] = np.arcsin(a)
            elif op == Op.ACOS_LHS:
                v[o] = np.arccos(a)
            elif op == Op.ATAN_LHS:
                v[o] = np.arctan(a)
            elif op == Op.EXP_LHS:
                v[o] = np.exp(a)
            elif op == Op.ABS_LHS:
                v[o] = np.abs(a)
            elif op == Op.LOG_LHS:
                v[o] = np.log(a)
            elif op == Op.ADD_LHS_IMM:
                v[o] = a + imm
            elif op == Op.ADD_LHS_RHS:
                v[o] = a + b
            elif op == Op.MUL_LHS_IMM:
                v[o] = a * imm
            elif op == Op.MUL_LHS_RHS:
                v[o] = a * b
            elif op == Op.MIN_LHS_IMM:
                v[o] = np.minimum(a, imm)
            elif op == Op.MIN_LHS_RHS:
                v[o] = np.minimum(a, b)
            elif op == Op.MAX_LHS_IMM:
                v[o] = np.maximum(a, imm)
            elif op == Op.MAX_LHS_RHS:
                v[o] = np.maximum(a, b)
            elif op == Op.SUB_LHS_IMM:
                v[o] = a - imm
            elif op == Op.SUB_IMM_RHS:
                v[o] = imm - b
            elif op == Op.SUB_LHS_RHS:
                v[o] = a - b
            elif op == Op.DIV_LHS_IMM:
                v[o] = a / imm
            elif op == Op.DIV_IMM_RHS:
                v[o] = imm / b
            elif op == Op.DIV_LHS_RHS:
                v[o] = a / b
            elif op == Op.COPY_IMM:
                v[o] = imm
            elif op == Op.COPY_LHS:
                v[o] = a.copy()
            elif op == Op.COPY_RHS:
                v[o] = b.copy()
            elif op == Op.HYPOT_LHS_RHS:
                v[o] = np.sqrt(a * a + b * b)
            elif op == Op.ADDSQ_LHS_RHS:
                v[o] = a * a + b
            else:
                raise ValueError(op)
    return v[tape.result_slot]


@pytest.mark.slow
def test_widened_pipeline_render_stays_exact():
    """With widen_intervals=True the staged 2D pipeline must still match
    the oracle exactly: widening can only move tiles from decided to
    ambiguous, and ambiguous tiles are per-pixel evaluated with the
    (unchanged) float semantics.  slow: the widened kernel set is a
    fresh multi-minute XLA:CPU compile (distinct cached_frame key)."""
    from mpr_tpu import config
    from mpr_tpu.frontend import shapes
    from mpr_tpu.render import pipeline2d
    t = shapes.union(shapes.circle(0.52, cx=-0.2),
                     shapes.circle(0.33, cx=0.35, cy=0.25))
    tape = compile_tree(t)
    with config.override(widen_intervals=True):
        img = pipeline2d.render2d(tape, size=128)
    xs = (np.arange(128) + 0.5) / 128 * 2 - 1
    X, Y = np.meshgrid(xs, xs)
    want = oracle.eval_f(tape, X.astype(np.float32),
                         Y.astype(np.float32)) < 0
    assert np.array_equal(img, want)


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
