"""Unrolled-engine work heatmap (render/workmap.py): the production-
engine analog of the reference's instrumented heatmap kernels
(/root/reference/src/context.cu:1513-2340).  The unrolled engine never
shortens tapes, so per-pixel work is exactly determined by which ladder
stage decided the pixel — these tests pin that analytic accounting."""

import numpy as np
import pytest

from mpr_tpu.frontend import shapes
from mpr_tpu.render import unrolled, workmap
from mpr_tpu.tape.tape import compile_tree

SIZE = 256


@pytest.fixture(scope="module")
def tape():
    t = shapes.union(shapes.sphere(0.45, cx=-0.2),
                     shapes.sphere(0.3, cx=0.5, cy=0.3))
    return compile_tree(t)


def test_workmap2d_levels(tape):
    heat, totals = workmap.workmap2d(tape, size=SIZE)
    assert heat.shape == (SIZE, SIZE)
    base = 1.0 / 4096.0
    lvl1 = base + 1.0 / 64.0
    lvl2 = lvl1 + 1.0
    # every pixel is at one of exactly three work levels
    levels = np.unique(heat)
    ok = np.isclose(levels[:, None], np.asarray([base, lvl1, lvl2])[None, :],
                    atol=1e-6).any(axis=1)
    assert ok.all(), levels[~ok]
    # pixel-stage work exists (the spheres have a boundary) and is a
    # minority of the image
    frac_px = (heat > 1.0).mean()
    assert 0 < frac_px < 0.5, frac_px
    assert totals["executed_evals"] >= totals["attributable_evals"] > 0
    # pixel-stage pixels = ambiguous 8px tiles x 64, and those pixels
    # are exactly where the render needed per-pixel evaluation
    img = unrolled.render2d(tape, size=SIZE)
    assert img.shape == (SIZE, SIZE)


def test_workmap2d_interior_cheap(tape):
    """Deep inside / far outside the shape costs the 64px stage only."""
    heat, _ = workmap.workmap2d(tape, size=SIZE)
    assert heat[0, 0] == pytest.approx(1.0 / 4096.0)       # far corner
    # center of the big sphere (cx=-0.2 -> px x ~ 0.4*SIZE)
    assert heat[SIZE // 2, int(0.4 * SIZE)] <= 1.0 / 4096.0 + 1.0 / 64.0 + 1e-6


def test_workmap3d_accounting(tape):
    heat, totals = workmap.workmap3d(tape, size=SIZE)
    n = SIZE // 64
    assert heat.shape == (SIZE, SIZE)
    # floor: every pixel pays the 64^3 sweep of its z column
    assert heat.min() >= n / 4096.0 - 1e-6
    assert totals["executed_evals"] >= totals["attributable_evals"] > 0
    # the surface region must show voxel-stage work (well above floor)
    assert heat.max() > 1.0
    # counters are the ladder's own (match the renderer's observations)
    r = unrolled.get_renderer(tape)
    obs = r._obs.get(("3d", SIZE))
    assert obs is not None
    a0, a1, a2 = (totals["counts"][k] for k in ("64^3", "16^3", "4^3"))
    assert a0 == obs[0] and a1 == obs[1]
    if not totals["skip4"]:
        assert a2 == obs[2]
