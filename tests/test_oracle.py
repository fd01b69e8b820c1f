"""Oracle tests: interval soundness, shortening equivalence, deriv vs FD."""

import numpy as np
import pytest

from mpr_tpu.frontend import tree as T
from mpr_tpu.frontend import frep, shapes
from mpr_tpu.tape import compile_tree
from mpr_tpu import oracle


MODELS = ["prospero", "bear", "hello_world", "architecture",
          "involute_gear_2d", "involute_gear_3d"]


def _random_boxes(rng, n):
    lo = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    width = rng.uniform(0, 0.5, (3, n)).astype(np.float32)
    hi = (lo + width).astype(np.float32)
    return lo, hi


@pytest.mark.parametrize("name", [m for m in MODELS if m != "bear"])
def test_interval_soundness(models_dir, name, rng):
    """f(point) must lie within f(box) for any point in the box.

    This is the core property the culling algorithm relies on (Alg 1 of the
    paper).  bear is excluded: it uses LOG, and the reference's interval log
    on [lo<=0, hi<1] returns the INVERTED interval [0, log(hi)] with a
    negative upper bound (/root/reference/inc/gpu_interval.hpp:382-391) —
    genuinely unsound behavior we reproduce for parity (see
    test_interval_log_quirk below).
    """
    t = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    tape = compile_tree(t)
    n = 2048
    lo, hi = _random_boxes(rng, n)
    ilo, ihi, _ = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])
    u = rng.uniform(0, 1, (3, n)).astype(np.float32)
    pt = lo + u * (hi - lo)
    val = oracle.eval_f(tape, pt[0], pt[1], pt[2])
    ok = np.isnan(ilo) | np.isnan(val) | (
        (val >= ilo - 1e-4 - 1e-5 * np.abs(ilo)) &
        (val <= ihi + 1e-4 + 1e-5 * np.abs(ihi)))
    bad = np.where(~ok)[0]
    assert bad.size == 0, (
        f"{bad.size} unsound boxes, first: box="
        f"{lo[:, bad[0]]}..{hi[:, bad[0]]} val={val[bad[0]]} "
        f"iv=[{ilo[bad[0]]},{ihi[bad[0]]}]")


@pytest.mark.parametrize("name", ["prospero", "hello_world", "architecture"])
def test_shortening_equivalence(models_dir, name, rng):
    """A shortened tape must agree with the full tape inside its tile."""
    t = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    tape = compile_tree(t)
    n_tiles = 64
    lo, hi = _random_boxes(rng, n_tiles)
    ilo, ihi, choices = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1],
                                      lo[2], hi[2])
    total_len = 0
    for i in range(n_tiles):
        short = oracle.shorten(tape, choices[:, i])
        total_len += short.length
        u = rng.uniform(0, 1, (3, 64)).astype(np.float32)
        pt = lo[:, i:i + 1] + u * (hi[:, i:i + 1] - lo[:, i:i + 1])
        want = oracle.eval_f(tape, pt[0], pt[1], pt[2])
        got = oracle.eval_f(short, pt[0], pt[1], pt[2])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"tile {i}")
    # shortening must actually shorten on average
    assert total_len < n_tiles * tape.length


def test_shortening_shrinks_substantially(models_dir, rng):
    """Paper's headline effect: small tiles -> much shorter tapes."""
    t = frep.load(str(models_dir / "prospero.frep"))[0].tree
    tape = compile_tree(t)
    # 1/16-sized tiles in the middle of the text
    n = 32
    lo, hi = _random_boxes(rng, n)
    lo *= 0.1
    hi = lo + 0.06
    ilo, ihi, choices = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1],
                                      lo[2], hi[2])
    lens = [oracle.shorten(tape, choices[:, i]).length for i in range(n)]
    assert np.mean(lens) < tape.length / 10


def test_deriv_matches_finite_differences(models_dir, rng):
    t = frep.load(str(models_dir / "hello_world.frep"))[0].tree
    tape = compile_tree(t)
    n = 256
    X, Y, Z = rng.uniform(-0.8, 0.8, (3, n)).astype(np.float32)
    v, dx, dy, dz = oracle.eval_d(tape, X, Y, Z)
    eps = 1e-3
    fdx = (oracle.eval_f(tape, X + eps, Y, Z) -
           oracle.eval_f(tape, X - eps, Y, Z)) / (2 * eps)
    # FD is only trustworthy away from min/max creases: mask out points
    # whose active min/max branches differ between x-eps and x+eps
    # (detected via degenerate-interval choice vectors).
    _, _, c_m = oracle.eval_i(tape, X - eps, X - eps, Y, Y, Z, Z)
    _, _, c_p = oracle.eval_i(tape, X + eps, X + eps, Y, Y, Z, Z)
    smooth = np.all(c_m == c_p, axis=0)
    assert smooth.mean() > 0.3  # the mask must not be vacuous
    err = np.abs(dx - fdx)
    ok = err < 0.02 * (1.0 + np.abs(dx))
    assert np.all(ok[smooth]), (
        f"max masked FD error {err[smooth].max()}")
    np.testing.assert_allclose(
        v, oracle.eval_f(tape, X, Y, Z), rtol=1e-5, atol=1e-6)


def test_interval_primitives_edge_cases():
    # divisor spanning zero -> whole line
    lo, hi = oracle.i_div(np.float32([1.0]), np.float32([2.0]),
                          np.float32([-1.0]), np.float32([1.0]))
    assert lo[0] == -np.inf and hi[0] == np.inf
    # [0,0] * [inf interval] -> 0 (the sign-case analysis, not 0*inf=NaN)
    lo, hi = oracle.i_mul(np.float32([0.0]), np.float32([0.0]),
                          np.float32([-np.inf]), np.float32([np.inf]))
    assert lo[0] == 0.0 and hi[0] == 0.0
    # sqrt of a fully-negative interval is NaN
    lo, hi = oracle.i_sqrt(np.float32([-2.0]), np.float32([-1.0]))
    assert np.isnan(lo[0]) and np.isnan(hi[0])
    # sin/cos always [-1,1] (reference quirk)
    lo, hi = oracle.i_sin(np.float32([0.1]), np.float32([0.2]))
    assert lo[0] == -1.0 and hi[0] == 1.0
    # min choice codes
    lo, hi, c = oracle.i_min(np.float32([0., 3., 0.]), np.float32([1., 4., 2.]),
                             np.float32([2., 0., 1.]), np.float32([3., 1., 3.]))
    assert list(c) == [1, 2, 0]


def test_interval_log_quirk():
    """The reference's interval log on [lo<=0, hi<1] yields an INVERTED
    interval [0, log(hi)] with log(hi) < 0 (gpu_interval.hpp:382-391).
    We reproduce this bit-for-bit; this test documents the quirk."""
    lo, hi = oracle.i_log(np.float32([-1.0]), np.float32([0.5]))
    assert lo[0] == 0.0 and hi[0] < 0.0  # inverted, as shipped upstream


def test_choice_capacity_beyond_reference(rng):
    """Choice recording stays exact past the reference's 4096-choice cap.

    The reference records at most 4096 min/max choices per tile (256
    uint32 words x 16 2-bit codes); beyond that, choices silently clamp
    to 0 = keep-both (/root/reference/src/context.cu:218-263), which is
    sound but stops shortening.  Here every choice plane is sized from
    ``tape.num_choices`` (oracle.eval_i, ops/eval_scan.eval_i, the
    kernel-A plane in ops/kernels.py), so no cap exists to overflow.
    This proves it on a union whose choice count exceeds the reference
    cap: shortening with the full choice vector remains exact, and the
    shortened tape actually collapses to the few locally-live circles.
    """
    n_circ = 4300
    centers = rng.uniform(-1, 1, (n_circ, 2)).astype(np.float32)
    t = shapes.union(*[shapes.circle(0.03, float(cx), float(cy))
                       for cx, cy in centers])
    tape = compile_tree(t)
    assert tape.num_choices >= n_circ - 1 > 4096

    # a small tile: interval eval records > 4096 choices, all usable
    bx = np.float32([0.1]), np.float32([0.2])
    by = np.float32([-0.2]), np.float32([-0.1])
    zero = np.float32([0.0])
    ilo, ihi, choices = oracle.eval_i(tape, bx[0], bx[1], by[0], by[1],
                                      zero, zero)
    assert choices.shape[0] == tape.num_choices
    short = oracle.shorten(tape, choices[:, 0])
    # with exact choices the union collapses to the locally-live handful
    # (the slot allocator's LHS-slot preference makes the accumulator
    # chain's COPY_LHS rewrites in-place, hence elided)
    assert short.length < tape.length / 20
    # ... and materially below what the reference's clamp would allow
    # (simulate it: every choice past 4096 degraded to 0 = keep-both)
    clamped = choices[:, 0].copy()
    clamped[4096:] = 0
    short_clamped = oracle.shorten(tape, clamped)
    assert short.length < short_clamped.length / 2
    u = rng.uniform(0, 1, (2, 64)).astype(np.float32)
    px = bx[0] + u[0] * (bx[1] - bx[0])
    py = by[0] + u[1] * (by[1] - by[0])
    pz = np.zeros(64, np.float32)
    np.testing.assert_allclose(oracle.eval_f(short, px, py, pz),
                               oracle.eval_f(tape, px, py, pz),
                               rtol=1e-5, atol=1e-6)
