"""SSAO + shading effects over the 3D pipeline's depth/normal outputs
(functional parity with /root/reference/src/effects.cu via
benchmark/render_effects.cpp's capped-sphere scene).

The depth/normals INPUT is produced by the NumPy oracle with the 3D
pipeline's exact conventions (voxel-center sampling, depth = top filled
voxel index + 1, normals sampled one voxel in front) — the effects
stages are the unit under test here, and the oracle scene costs ~2 s
where compiling the interp 3D pipeline on a 1-core CPU host costs
~5 min (round-5 suite-budget work; pipeline-vs-oracle exactness is
test_pipeline3d's job)."""

import numpy as np
import pytest

from mpr_tpu import oracle
from mpr_tpu.frontend import shapes
from mpr_tpu.render import effects
from mpr_tpu.tape.tape import compile_tree


def _capped_sphere():
    # the render_effects default shape: sphere intersected with a z plane
    # (/root/reference/benchmark/render_effects.cpp)
    return shapes.capped_sphere()


@pytest.fixture(scope="module")
def scene():
    """(depth, normals) of the capped sphere @128, oracle-computed with
    render3d's conventions (render/pipeline3d.py docstring; identity
    camera)."""
    size = 128
    tape = compile_tree(_capped_sphere())
    c = ((np.arange(size) + 0.5) / size * 2.0 - 1.0).astype(np.float32)
    X = np.broadcast_to(c[None, None, :], (size, size, size))
    Y = np.broadcast_to(c[None, :, None], (size, size, size))
    Z = np.broadcast_to(c[:, None, None], (size, size, size))
    vals = oracle.eval_f(tape, X, Y, Z)                # (z, y, x)
    filled = vals < 0.0
    iz1 = (np.arange(size) + 1)[:, None, None]
    depth = np.max(np.where(filled, iz1, 0), axis=0).astype(np.int32)
    zi = np.minimum(depth, size - 1).astype(np.float32)
    zs = (zi + 0.5) / size * 2.0 - 1.0                 # one voxel in front
    _, dx, dy, dz = oracle.eval_d(tape, np.broadcast_to(c[None, :],
                                                        (size, size)),
                                  np.broadcast_to(c[:, None],
                                                  (size, size)), zs)
    n = np.stack([dx, dy, dz], axis=-1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n[depth == 0] = 0.0
    return depth, n.astype(np.float32)


def test_ssao_range_and_support(scene):
    depth, normals = scene
    for mode in ("static", "gather"):
        occ = np.asarray(effects.draw_ssao(depth, normals, mode=mode))
        assert occ.shape == depth.shape
        m = depth > 0
        assert np.all(occ[~m] == 0.0)
        assert np.all(occ[m] >= 0.0) and np.all(occ[m] <= 1.0)
        # open areas of the cap should be mostly unoccluded
        assert occ[m].mean() > 0.5, mode


def test_ssao_static_agrees_with_gather(scene):
    """The gather-free static-offset mode (the TPU-fast mechanism,
    effects.ssao_raw_static) must agree with the reference-mechanism
    gather mode on smooth geometry: same support, and occlusion values
    within a small mean absolute difference (the sampling patterns
    differ, so pointwise equality is not expected)."""
    depth, normals = scene
    a = np.asarray(effects.draw_ssao(depth, normals, mode="static",
                                     ao_scale=1))
    b = np.asarray(effects.draw_ssao(depth, normals, mode="gather",
                                     ao_scale=1))
    m = depth > 0
    assert (a[m] > 0).mean() > 0.95 and (b[m] > 0).mean() > 0.95
    assert np.abs(a[m] - b[m]).mean() < 0.12, np.abs(a[m] - b[m]).mean()


def test_ssao_flat_cap_brighter_than_crease(scene):
    """The flat cap's interior is less occluded than the sphere/plane
    crease ring."""
    depth, normals = scene
    occ = np.asarray(effects.draw_ssao(depth, normals))
    c = 64
    interior = occ[c - 6:c + 6, c - 6:c + 6].mean()
    assert interior > 0.8


def test_shaded_lighting(scene):
    depth, normals = scene
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
