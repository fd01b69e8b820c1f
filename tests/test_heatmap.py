"""Work-per-pixel heatmaps (render/heatmap.py) — the analytic analog of
the reference's instrumented kernels (src/context.cu:1513-2340)."""

import numpy as np

from mpr_tpu.frontend import shapes
from mpr_tpu.render.heatmap import render2d_heatmap, render3d_heatmap
from mpr_tpu.tape.tape import compile_tree


def test_heatmap2d_structure():
    tape = compile_tree(shapes.ring(0.8, 0.4))
    h = render2d_heatmap(tape, size=256)
    assert h.shape == (256, 256)
    assert np.all(h >= 0) and np.isfinite(h).all()
    # every pixel pays at least the amortized interval stage
    base = tape.length / (64 * 64) / tape.length
    assert np.all(h >= base - 1e-6)
    # the ring's boundary tiles (ambiguous) cost more than far corners
    assert h[128, 128] >= h[4, 4] or h[128, 230] > h[4, 4]


def test_heatmap3d_structure():
    tape = compile_tree(shapes.two_spheres())
    h = render3d_heatmap(tape, size=128)
    assert h.shape == (128, 128)
    assert np.all(h >= 0) and np.isfinite(h).all()
    # surface regions (voxel work) dominate empty corners
    assert h.max() > 4 * h.min()
