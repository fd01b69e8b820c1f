"""JAX evaluator tests: scan interpreter vs oracle; brute render; gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpr_tpu.frontend import frep, shapes
from mpr_tpu.tape import compile_tree
from mpr_tpu import oracle
from mpr_tpu.ops import eval_scan
from mpr_tpu.ops.tape_data import TapeData
from mpr_tpu.render import brute, camera


@pytest.mark.parametrize("name", ["prospero", "hello_world", "bear"])
def test_scan_eval_f_matches_oracle(models_dir, name, rng):
    t = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    tape = compile_tree(t)
    td = TapeData.from_tape(tape)
    X, Y, Z = rng.uniform(-1, 1, (3, 1024)).astype(np.float32)
    got = np.asarray(eval_scan.eval_f(td, X, Y, Z))
    want = oracle.eval_f(tape, X, Y, Z)
    # rtol 1e-4: XLA CPU and NumPy disagree by a few ulp on transcendentals
    # (bear uses exp/log/sin, amplified through fused hypot rounding);
    # pure-arithmetic models match to 1e-6.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("name", ["prospero", "architecture"])
def test_scan_eval_i_matches_oracle(models_dir, name, rng):
    t = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    tape = compile_tree(t)
    td = TapeData.from_tape(tape)
    n = 256
    lo = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    hi = (lo + rng.uniform(0, 0.4, (3, n))).astype(np.float32)
    wl, wh, wc = oracle.eval_i(tape, lo[0], hi[0], lo[1], hi[1],
                               lo[2], hi[2])
    gl, gh, gc = eval_scan.eval_i(td, lo[0], hi[0], lo[1], hi[1],
                                  lo[2], hi[2])
    np.testing.assert_allclose(np.asarray(gl), wl, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gh), wh, rtol=1e-6, atol=1e-6)
    assert np.array_equal(np.asarray(gc), wc.astype(np.int8))


def test_brute_render_2d_matches_oracle(models_dir):
    t = frep.load(str(models_dir / "prospero.frep"))[0].tree
    tape = compile_tree(t)
    img = brute.render2d_brute(tape, size=128)
    xs = camera.pixel_centers(128)
    X, Y = np.meshgrid(xs, xs)
    want = oracle.eval_f(tape, X, Y) < 0
    assert np.array_equal(img, want)
    assert 0.05 < img.mean() < 0.3  # text on a page


def test_brute_render_3d_heightmap():
    tape = compile_tree(shapes.sphere(0.6))
    hm = brute.render3d_brute(tape, size=32)
    assert hm.shape == (32, 32)
    assert hm[16, 16] > 16  # center column reaches above midplane
    assert hm[0, 0] == 0    # corners empty
    # height symmetric in x/y
    assert abs(int(hm[16, 10]) - int(hm[16, 21])) <= 1


def test_unrolled_matches_scan(models_dir, rng):
    t = frep.load(str(models_dir / "hello_world.frep"))[0].tree
    tape = compile_tree(t)
    td = TapeData.from_tape(tape)
    f = brute.build_unrolled_f(tape)
    X, Y = rng.uniform(-1, 1, (2, 512)).astype(np.float32)
    a = np.asarray(jax.jit(f)(X, Y))
    b = np.asarray(eval_scan.eval_f(td, X, Y))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_grad_wrt_imms():
    """d(f)/d(tape constants): the differentiable-renderer core property."""
    tape = compile_tree(shapes.circle(0.8))
    td = TapeData.from_tape(tape)

    def f(imms):
        td2 = TapeData(td.packed, imms, td.runs, td.length, td.num_slots,
                       td.axis_slots, td.result_slot, td.num_choices,
                       td.ops_present, td.num_runs)
        return eval_scan.eval_f(td2, jnp.float32(0.5), jnp.float32(0.0))

    g = np.asarray(jax.grad(lambda m: f(m).sum())(td.imms))
    # circle = sqrt(x^2+y^2) - r: last clause is SUB_LHS_IMM with imm = r
    assert g[tape.length - 1] == pytest.approx(-1.0)
    # gradient w.r.t. padding immediates is zero
    assert np.all(g[tape.length:] == 0)


def test_grad_wrt_position_matches_deriv():
    tape = compile_tree(shapes.sphere(0.5))
    td = TapeData.from_tape(tape)
    x0, y0, z0 = 0.3, -0.2, 0.1
    gx = jax.grad(lambda x: eval_scan.eval_f(td, x, jnp.float32(y0),
                                             jnp.float32(z0)).sum())(
        jnp.float32(x0))
    _, dx, _, _ = oracle.eval_d(tape, np.float32([x0]), np.float32([y0]),
                                np.float32([z0]))
    assert float(gx) == pytest.approx(float(dx[0]), rel=1e-5)


def test_png_roundtrip(tmp_path):
    from mpr_tpu.io import png
    img = (np.random.default_rng(0).uniform(0, 255, (33, 47))
           .astype(np.uint8))
    p = str(tmp_path / "t.png")
    png.write_png(p, img)
    back = png.read_png_gray(p)
    assert np.array_equal(back, img)


def test_fast_transcendentals_unrolled():
    """config.fast_transcendentals routes the unrolled evaluators through
    the Cephes polynomial asin/acos/atan (ops/transcendental.py, the forms
    the Pallas kernels already use).  Values must stay within a few f32
    ulp of NumPy and derivatives must stay analytic."""
    from mpr_tpu import config
    from mpr_tpu.frontend import tree as T
    from mpr_tpu.ops import unrolled_eval as ue

    shape = (T.atan(T.x() * 3.0) + T.acos(T.y() * 0.9)
             + T.asin(T.y() * 0.7) - 1.2)
    tape = compile_tree(shape)
    rng_ = np.random.default_rng(7)
    xs = rng_.uniform(-1, 1, 2048).astype(np.float32)
    ys = rng_.uniform(-1, 1, 2048).astype(np.float32)
    want = (np.arctan(xs * 3.0) + np.arccos(ys * 0.9)
            + np.arcsin(ys * 0.7) - 1.2)
    with config.override(fast_transcendentals=True):
        f = ue.build_float(tape)
        fd = ue.build_deriv(tape)
        fi = ue.build_interval(tape)
        got = np.asarray(f(xs, ys))
        v, dx, dy, _ = (np.asarray(a) for a in
                        fd(xs, ys, np.zeros_like(xs)))
        # interval soundness on random sub-boxes
        lo_, hi_ = (np.asarray(a) for a in fi(
            xs - 0.01, xs + 0.01, ys - 0.01, ys + 0.01,
            np.zeros_like(xs), np.zeros_like(xs)))
    assert np.abs(got - want).max() < 1e-5
    assert np.abs(v - want).max() < 1e-5
    want_dx = 3.0 / (1.0 + (3.0 * xs) ** 2)
    assert np.abs(dx - want_dx).max() < 1e-5
    ok = ~np.isnan(lo_)
    assert (lo_[ok] <= got[ok] + 1e-5).all() and (
        got[ok] <= hi_[ok] + 1e-5).all()
