"""SSAO + shading effects over the 3D pipeline's depth/normal outputs
(functional parity with /root/reference/src/effects.cu via
benchmark/render_effects.cpp's capped-sphere scene)."""

import numpy as np

from mpr_tpu.frontend import shapes
from mpr_tpu.render import effects
from mpr_tpu.render.pipeline3d import render3d
from mpr_tpu.tape.tape import compile_tree


def _capped_sphere():
    # the render_effects default shape: sphere intersected with a z plane
    # (/root/reference/benchmark/render_effects.cpp)
    return shapes.capped_sphere()


def test_ssao_range_and_support():
    tape = compile_tree(_capped_sphere())
    depth, normals = render3d(tape, size=128)
    for mode in ("static", "gather"):
        occ = np.asarray(effects.draw_ssao(depth, normals, mode=mode))
        assert occ.shape == depth.shape
        m = depth > 0
        assert np.all(occ[~m] == 0.0)
        assert np.all(occ[m] >= 0.0) and np.all(occ[m] <= 1.0)
        # open areas of the cap should be mostly unoccluded
        assert occ[m].mean() > 0.5, mode


def test_ssao_static_agrees_with_gather():
    """The gather-free static-offset mode (the TPU-fast mechanism,
    effects.ssao_raw_static) must agree with the reference-mechanism
    gather mode on smooth geometry: same support, and occlusion values
    within a small mean absolute difference (the sampling patterns
    differ, so pointwise equality is not expected)."""
    tape = compile_tree(_capped_sphere())
    depth, normals = render3d(tape, size=128)
    a = np.asarray(effects.draw_ssao(depth, normals, mode="static",
                                     ao_scale=1))
    b = np.asarray(effects.draw_ssao(depth, normals, mode="gather",
                                     ao_scale=1))
    m = depth > 0
    assert (a[m] > 0).mean() > 0.95 and (b[m] > 0).mean() > 0.95
    assert np.abs(a[m] - b[m]).mean() < 0.12, np.abs(a[m] - b[m]).mean()


def test_ssao_flat_cap_brighter_than_crease():
    """The flat cap's interior is less occluded than the sphere/plane
    crease ring."""
    tape = compile_tree(_capped_sphere())
    depth, normals = render3d(tape, size=128)
    occ = np.asarray(effects.draw_ssao(depth, normals))
    c = 64
    interior = occ[c - 6:c + 6, c - 6:c + 6].mean()
    assert interior > 0.8


def test_shaded_lighting():
    tape = compile_tree(_capped_sphere())
    depth, normals = render3d(tape, size=128)
    img = np.asarray(effects.draw_shaded(depth, normals))
    m = depth > 0
    assert np.all(img[~m] == 0.0)
    assert np.all(img[m] >= 0.0) and np.all(img[m] <= 1.0)
    # ambient floor: lit pixels never fall below AMBIENT * SSAO-dimmed min
    assert img[m].min() >= 0.0
    # light at (5,5,10): the +x+y quadrant of the cap is brighter than -x-y
    q_hi = img[70:90, 70:90][depth[70:90, 70:90] > 0].mean()
    q_lo = img[38:58, 38:58][depth[38:58, 38:58] > 0].mean()
    assert q_hi > q_lo
