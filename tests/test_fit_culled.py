"""Culled-pipeline differentiable fitting (parallel.sharded.
make_fit_step_culled): forward = unrolled interval ladder under
stop_gradient, backward = soft-render VJP restricted to ambiguous 8px
tiles.  Cost is O(ambiguous tiles), not O(size²); gradients must match
the dense path to the tanh-saturation tolerance (the cull test is
widened by delta = 4/sharpness, so culled pixels' d(soft)/d(imms) is
O(sech²(4)) of a boundary pixel's — see
render/unrolled.py::_soft_render2d_impl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpr_tpu.frontend import shapes
from mpr_tpu.ops import eval_scan
from mpr_tpu.ops.tape_data import TapeData
from mpr_tpu.parallel import sharded
from mpr_tpu.tape.tape import compile_tree

SIZE = 128
SHARP = 20.0


@pytest.fixture(scope="module")
def tape():
    t = shapes.union(shapes.circle(0.55, cx=-0.15),
                     shapes.circle(0.35, cx=0.45, cy=0.25))
    return compile_tree(t)


@pytest.fixture(scope="module")
def target():
    t = shapes.union(shapes.circle(0.5, cx=-0.2),
                     shapes.circle(0.4, cx=0.5, cy=0.3))
    td = TapeData.from_tape(compile_tree(t))
    p = (jnp.arange(SIZE, dtype=jnp.float32) + 0.5) / SIZE * 2.0 - 1.0
    x = jnp.broadcast_to(p[None, :], (SIZE, SIZE))
    y = jnp.broadcast_to(p[:, None], (SIZE, SIZE))
    v = eval_scan.eval_f(td, x, y)
    return np.asarray(jnp.tanh(-SHARP * v) * 0.5 + 0.5)


def test_culled_grads_match_dense(tape, target):
    lr = 1e-2
    mesh = sharded.make_mesh(1)
    mat = jnp.asarray(np.eye(3, dtype=np.float32))
    z = jnp.float32(0.0)
    imms = jnp.asarray(tape.imms)

    step_d = sharded.make_fit_step_unrolled(tape, SIZE, mesh, lr=lr,
                                            sharpness=SHARP)
    step_c = sharded.make_fit_step_culled(tape, SIZE, mesh, lr=lr,
                                          sharpness=SHARP)
    l_d, im_d = step_d(imms, jnp.asarray(target), mat, z)
    l_c, im_c = step_c(imms, target)

    g_d = np.asarray((imms - im_d) / lr)
    g_c = np.asarray((imms - im_c) / lr)
    scale = np.abs(g_d).max()
    assert scale > 0
    np.testing.assert_allclose(g_c, g_d, rtol=0, atol=3e-3 * scale)
    # loss differs only by saturated-tile tanh tails
    assert abs(float(l_c) - float(l_d)) <= 2e-3 * max(float(l_d), 1e-6)


def test_culled_work_is_ambiguous_only(tape, target):
    """The pixel stage runs on the widened-ambiguous 8px set, a small
    fraction of the image (the O(ambiguous) claim, VERDICT r3 item 4).
    The widening band is 2*delta = 8/sharpness WORLD units around the
    surface, so the ambiguous fraction shrinks as sharpness grows (and
    production fits at high resolution should scale sharpness with
    size to keep the soft boundary ~pixels wide)."""
    step = sharded.make_fit_step_culled(tape, SIZE, sharpness=64.0)
    step(jnp.asarray(tape.imms), target)
    n8_total = (SIZE // 8) ** 2
    assert step.last_counts[1] < n8_total / 3, (step.last_counts, n8_total)


def test_culled_fit_converges():
    """Gradient descent through the culled pipeline recovers a target
    radius (the test_fit.py::test_fit_step_unrolled_matches_scan setup,
    run through the culled step)."""
    size = 64
    tape = compile_tree(shapes.circle(0.5))
    td_t = TapeData.from_tape(compile_tree(shapes.circle(0.7)))
    p = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    x = jnp.broadcast_to(p[None, :], (size, size))
    y = jnp.broadcast_to(p[:, None], (size, size))
    tgt = np.asarray(jnp.tanh(-8.0 * eval_scan.eval_f(td_t, x, y)) * 0.5
                     + 0.5)
    step = sharded.make_fit_step_culled(tape, size, lr=0.3, sharpness=8.0)
    imms = jnp.asarray(tape.imms)
    first = last = None
    for _ in range(300):
        l, imms = step(imms, tgt)
        first = float(l) if first is None else first
        last = float(l)
    assert last < first * 0.05, (first, last)
    r_pos = np.asarray(tape.imms) == 0.5
    r = float(np.asarray(imms)[r_pos][0])
    assert abs(r - 0.7) < 0.03, r


def test_window_fit_3d_recovers_radius():
    """Depth-window 3D fit (make_fit_step_3d_window): O(size²·W) per
    step at render resolution, recovers a sphere's radius from a target
    depth image (the test_fit.py::test_fit_step_3d_depth setup at
    size=64 instead of grid=16)."""
    from mpr_tpu import oracle
    from mpr_tpu.render import camera

    size = 64
    tape = compile_tree(shapes.sphere(0.75))
    c = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    Z, Y, X = np.meshgrid(c, c, c, indexing="ij")
    v = oracle.eval_f(compile_tree(shapes.sphere(0.55)), X, Y, Z)
    zi = np.arange(size, dtype=np.float32)[:, None, None] + 1.0
    target = np.max(np.where(v < 0, zi, 0.0), axis=0)     # (y, x)

    step = sharded.make_fit_step_3d_window(tape, size, lr=2e-5,
                                           sharpness=40.0, window=16)
    imms = jnp.asarray(tape.imms)
    first = last = None
    for _ in range(200):
        l, imms = step(imms, target)
        first = float(l) if first is None else first
        last = float(l)
    assert last < first * 0.15, (first, last)
    r_pos = np.asarray(tape.imms) == 0.75
    r = float(np.asarray(imms)[r_pos][0])
    assert abs(r - 0.55) < 0.06, r
