"""End-to-end differentiable rendering: gradient descent on tape constants
(the capability the CUDA reference lacks; SURVEY.md §7 step 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpr_tpu.frontend import shapes
from mpr_tpu.ops import eval_scan
from mpr_tpu.ops.tape_data import TapeData
from mpr_tpu.tape.tape import compile_tree


def _soft_render(td, size, sharpness=20.0):
    p = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    x = jnp.broadcast_to(p[None, :], (size, size))
    y = jnp.broadcast_to(p[:, None], (size, size))
    v = eval_scan.eval_f(td, x, y)
    return jnp.tanh(-sharpness * v) * 0.5 + 0.5


def _with_imms(td, imms):
    return TapeData(td.packed, imms, td.runs, td.length, td.num_slots,
                    td.axis_slots, td.result_slot, td.num_choices,
                    td.ops_present, td.num_runs)


def test_fit_circle_radius():
    """Fitting a circle's constants to a larger circle's image recovers
    the target radius."""
    size = 64
    td0 = TapeData.from_tape(compile_tree(shapes.circle(0.5)))
    target = _soft_render(
        TapeData.from_tape(compile_tree(shapes.circle(0.7))), size,
        sharpness=8.0)

    @jax.jit
    def step(imms):
        def loss_fn(imms):
            soft = _soft_render(_with_imms(td0, imms), size, sharpness=8.0)
            return jnp.mean((soft - target) ** 2)
        l, g = jax.value_and_grad(loss_fn)(imms)
        return l, imms - 0.05 * g

    imms = td0.imms
    losses = []
    for _ in range(300):
        l, imms = step(imms)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.01, losses[::60]
    # the circle tape is sqrt(x^2 + y^2) - r (SUB_LHS_IMM, imm = r)
    r_pos = np.asarray(td0.imms) == 0.5
    assert r_pos.sum() == 1
    r = float(np.asarray(imms)[r_pos][0])
    assert abs(r - 0.7) < 0.02, r


def test_grad_matches_finite_difference():
    """d(loss)/d(imms) from autodiff == central finite differences."""
    size = 32
    td = TapeData.from_tape(compile_tree(shapes.ring(0.8, 0.4)))

    def loss(imms):
        return float(jnp.sum(_soft_render(_with_imms(td, imms), size)))

    g = jax.grad(lambda i: jnp.sum(_soft_render(_with_imms(td, i), size)))(
        td.imms)
    g = np.asarray(g)
    imms0 = np.array(td.imms)
    eps = 1e-3
    for t in np.nonzero(imms0)[0][:4]:
        up = imms0.copy(); up[t] += eps
        dn = imms0.copy(); dn[t] -= eps
        fd = (loss(jnp.asarray(up)) - loss(jnp.asarray(dn))) / (2 * eps)
        assert abs(fd - g[t]) < 2e-2 * max(1.0, abs(fd)), (t, fd, g[t])


def test_fit_step_unrolled_matches_scan():
    """The production-evaluator fit step (parallel.sharded.
    make_fit_step_unrolled) takes the same gradient as the scan-
    interpreter step, and recovers the target radius the same way."""
    from mpr_tpu.parallel import sharded
    size = 64
    tape = compile_tree(shapes.circle(0.5))
    td0 = TapeData.from_tape(tape)
    target = _soft_render(
        TapeData.from_tape(compile_tree(shapes.circle(0.7))), size,
        sharpness=8.0)
    mesh = sharded.make_mesh(1)
    mat = jnp.asarray(np.eye(3, dtype=np.float32))
    z = jnp.float32(0.0)

    step_s = sharded.make_fit_step(size, mesh, lr=0.3, sharpness=8.0)
    step_u = sharded.make_fit_step_unrolled(tape, size, mesh, lr=0.3,
                                            sharpness=8.0)

    l_s, td1 = step_s(td0, target, mat, z)
    l_u, imms1 = step_u(jnp.asarray(tape.imms), target, mat, z)
    np.testing.assert_allclose(float(l_s), float(l_u), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(td1.imms)[:tape.length],
                               np.asarray(imms1), rtol=1e-4, atol=1e-7)

    # and the unrolled step trains: 300 steps recover the radius
    imms = jnp.asarray(tape.imms)
    first = last = None
    for _ in range(300):
        l, imms = step_u(imms, target, mat, z)
        first = float(l) if first is None else first
        last = float(l)
    assert last < first * 0.05, (first, last)
    r_pos = np.asarray(tape.imms) == 0.5
    r = float(np.asarray(imms)[r_pos][0])
    assert abs(r - 0.7) < 0.03, r


def test_fit_step_3d_depth():
    """3D fit: volume-compositing soft depth (make_fit_step_3d) recovers
    a sphere's radius from a target DEPTH image."""
    from mpr_tpu import oracle
    from mpr_tpu.parallel import sharded
    from mpr_tpu.render import camera

    grid = 16
    tape = compile_tree(shapes.sphere(0.75))
    # discrete target depth on the same grid via the numpy oracle
    c = (np.arange(grid, dtype=np.float32) + 0.5) / grid * 2.0 - 1.0
    Z, Y, X = np.meshgrid(c, c, c, indexing="ij")
    v = oracle.eval_f(compile_tree(shapes.sphere(0.55)), X, Y, Z)
    filled = v < 0                                    # [z, y, x]
    zi = np.arange(grid, dtype=np.float32)[:, None, None] + 1.0
    target = np.max(np.where(filled, zi, 0.0), axis=0)  # (y, x)

    mesh = sharded.make_mesh()
    step = sharded.make_fit_step_3d(tape, grid, mesh, lr=3e-4,
                                    sharpness=40.0)
    mat = jnp.asarray(camera.identity3())
    imms = jnp.asarray(tape.imms)
    target_j = jnp.asarray(target)
    first = last = None
    for _ in range(200):
        l, imms = step(imms, target_j, mat)
        first = float(l) if first is None else first
        last = float(l)
    # measured: 27.5 -> 0.65, r -> 0.525 (soft-depth bias ~ half the
    # sigmoid width; shrinks as sharpness grows)
    assert last < first * 0.1, (first, last)
    r_pos = np.asarray(tape.imms) == 0.75
    r = float(np.asarray(imms)[r_pos][0])
    assert abs(r - 0.55) < 0.06, r
