"""Post-processing effects: SSAO and shaded rendering.

Functional parity with ``mpr::Effects`` (/root/reference/src/effects.cu),
re-expressed as pure jnp image ops (XLA fuses the per-pixel math; the 64
hemisphere samples run as a ``fori_loop`` of gathers so peak memory stays
O(image), not O(image x samples)).

Deliberate divergences (documented per SURVEY.md section 7):
  * sample kernels use a fixed NumPy seed instead of C ``rand()``
    (/root/reference/src/effects.cu:225-250) — reproducible across runs;
  * normals arrive as float32 vectors rather than round-tripped through
    RGBA8 quantization (:49-53) — slightly higher quality;
  * the edge-aware blur computes window stddev from the window's own
    pixels; the reference indexes stddev samples relative to the image
    ORIGIN (`tx = xmin + i` vs `x + xmin + i`, :131-140), which reads the
    top-left corner for every pixel — an apparent bug we fix rather than
    replicate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

RADIUS = 0.1
N_SAMPLES = 64
AMBIENT = 0.2
DIFFUSE = 0.8
LIGHT_POS = (5.0, 5.0, 10.0)
BLUR_RADIUS = 2

_rng = np.random.default_rng(20200716)


def _ssao_kernel() -> np.ndarray:
    """64 hemisphere samples, quadratically scaled toward the center
    (/root/reference/src/effects.cu:231-243)."""
    v = np.stack([_rng.uniform(-1, 1, N_SAMPLES),
                  _rng.uniform(-1, 1, N_SAMPLES),
                  _rng.uniform(0, 1, N_SAMPLES)], axis=1)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    scale = np.arange(N_SAMPLES) / (N_SAMPLES - 1)
    v *= ((scale * scale) * 0.9 + 0.1)[:, None]
    return v.astype(np.float32)


def _ssao_rvecs() -> np.ndarray:
    """16x16 tiled random rotation vectors in the z=0 plane (:244-249)."""
    v = np.stack([_rng.uniform(-1, 1, 256),
                  _rng.uniform(-1, 1, 256),
                  np.zeros(256)], axis=1)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


_KERNEL = _ssao_kernel()
_RVECS = _ssao_rvecs()


def _world_pos(depth, size):
    y, x = jnp.mgrid[0:size, 0:size]
    px = 2.0 * ((x + 0.5) / size - 0.5)
    py = 2.0 * ((y + 0.5) / size - 0.5)
    pz = 2.0 * ((depth + 0.5) / size - 0.5)
    return px.astype(jnp.float32), py.astype(jnp.float32), pz


@functools.partial(jax.jit, static_argnames=())
def ssao_raw(depth: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Unblurred ambient occlusion in [0,1]; 0 outside the shape
    (draw_ssao, /root/reference/src/effects.cu:17-89)."""
    size = depth.shape[0]
    px, py, pz = _world_pos(depth, size)
    n = normals

    y, x = jnp.mgrid[0:size, 0:size]
    rvec = jnp.asarray(_RVECS)[(x % 16) * 16 + (y % 16)]   # (H, W, 3)
    ndr = jnp.sum(rvec * n, axis=-1, keepdims=True)
    tangent = rvec - n * ndr
    tangent = tangent / jnp.maximum(
        jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-12)
    bitangent = jnp.cross(n, tangent)

    kern = jnp.asarray(_KERNEL)

    def body(i, occ):
        k = kern[i] * RADIUS
        sx = tangent[..., 0] * k[0] + bitangent[..., 0] * k[1] \
            + n[..., 0] * k[2] + px
        sy = tangent[..., 1] * k[0] + bitangent[..., 1] * k[1] \
            + n[..., 1] * k[2] + py
        sz = tangent[..., 2] * k[0] + bitangent[..., 2] * k[1] \
            + n[..., 2] * k[2] + pz
        ix = ((sx / 2.0 + 0.5) * size).astype(jnp.int32)
        iy = ((sy / 2.0 + 0.5) * size).astype(jnp.int32)
        inb = (ix >= 0) & (ix < size) & (iy >= 0) & (iy < size)
        h = jnp.where(inb, depth[jnp.clip(iy, 0, size - 1),
                                 jnp.clip(ix, 0, size - 1)], 0)
        actual_z = 2.0 * ((h + 0.5) / size - 0.5)
        dz = jnp.abs(sz - actual_z)
        below = sz <= actual_z
        near = jnp.where(dz < RADIUS, below.astype(jnp.float32), 0.0)
        fall = ((RADIUS - (dz - RADIUS)) / RADIUS) ** 2
        far = jnp.where((dz >= RADIUS) & (dz < 2 * RADIUS) & below,
                        fall, 0.0)
        return occ + near + far

    occ = jax.lax.fori_loop(0, N_SAMPLES, body,
                            jnp.zeros((size, size), jnp.float32))
    out = 1.0 - occ / N_SAMPLES
    return jnp.where(depth > 0, out, 0.0)


@jax.jit
def ssao_blur(depth: jnp.ndarray, raw: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware blur: of the 4 (BLUR_RADIUS+1)² windows touching the
    pixel, keep the mean of the one with the lowest stddev (blur_ssao,
    /root/reference/src/effects.cu:93-156; stddev indexing fixed)."""
    size = depth.shape[0]
    mask = (depth > 0).astype(jnp.float32)
    v = raw * mask

    pad = BLUR_RADIUS
    vp = jnp.pad(v, pad)
    v2p = jnp.pad(v * v, pad)
    mp = jnp.pad(mask, pad)

    def win_stats(ox, oy):
        # window [ox, ox+BR] x [oy, oy+BR] relative to the pixel
        s = jnp.zeros_like(v)
        s2 = jnp.zeros_like(v)
        c = jnp.zeros_like(v)
        for i in range(BLUR_RADIUS + 1):
            for j in range(BLUR_RADIUS + 1):
                dy, dx = oy + j + pad, ox + i + pad
                s = s + jax.lax.dynamic_slice(vp, (dy, dx), v.shape)
                s2 = s2 + jax.lax.dynamic_slice(v2p, (dy, dx), v.shape)
                c = c + jax.lax.dynamic_slice(mp, (dy, dx), v.shape)
        mean = s / jnp.maximum(c, 1.0)
        var = jnp.maximum(s2 / jnp.maximum(c, 1.0) - mean * mean, 0.0)
        sd = jnp.sqrt(var * c / jnp.maximum(c - 1.0, 1.0))
        sd = jnp.where(c > 0, sd, jnp.inf)
        return mean, sd

    best_mean = jnp.zeros_like(v)
    best_sd = jnp.full_like(v, jnp.inf)
    for ox in (-BLUR_RADIUS, 0):
        for oy in (-BLUR_RADIUS, 0):
            mean, sd = win_stats(ox, oy)
            take = sd < best_sd
            best_mean = jnp.where(take, mean, best_mean)
            best_sd = jnp.minimum(sd, best_sd)
    # the reference leaves blurred values on empty pixels and masks at
    # shading time (:175-178); mask here so drawSSAO output is clean
    return jnp.where((depth > 0) & jnp.isfinite(best_sd), best_mean, 0.0)


def draw_ssao(depth, normals, ao_scale: int = None) -> jnp.ndarray:
    """Blurred ambient-occlusion image in [0,1] (Effects::drawSSAO).

    ``ao_scale``: compute the raw AO at 1/ao_scale resolution and
    upsample before the full-resolution edge-aware blur.  Default: 1
    below 512², else 2.  Rationale (measured, docs/perf_notes.md
    round-4): the sample loop is 64 random gathers per pixel at
    ~10 ns/index on TPU — 727 ms at 1024² full-res, and neither window
    locality nor layout changes it; index COUNT is the only lever.  AO
    is low-frequency and blurred anyway, so half-res raw AO + full-res
    edge-aware blur is visually equivalent at a quarter the cost (a
    documented divergence from the reference, whose GPU texture fetches
    make full-res free)."""
    depth = jnp.asarray(depth)
    normals = jnp.asarray(normals)
    size = depth.shape[0]
    if ao_scale is None:
        ao_scale = 2 if size >= 512 else 1
    if ao_scale > 1:
        raw_s = ssao_raw(depth[::ao_scale, ::ao_scale],
                         normals[::ao_scale, ::ao_scale])
        raw = jnp.repeat(jnp.repeat(raw_s, ao_scale, 0), ao_scale, 1)
    else:
        raw = ssao_raw(depth, normals)
    return ssao_blur(depth, raw)


@jax.jit
def _shade(depth, normals, occ):
    size = depth.shape[0]
    px, py, pz = _world_pos(depth, size)
    lx, ly, lz = LIGHT_POS
    dx, dy, dz = lx - px, ly - py, lz - pz
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    ldn = (dx * normals[..., 0] + dy * normals[..., 1]
           + dz * normals[..., 2]) * inv
    light = jnp.maximum(0.0, ldn) * DIFFUSE * occ + AMBIENT
    light = jnp.clip(light, 0.0, 1.0)
    return jnp.where(depth > 0, light, 0.0)


def draw_shaded(depth, normals) -> jnp.ndarray:
    """Single-point-light greyscale shading x SSAO + ambient in [0,1]
    (draw_shaded, /root/reference/src/effects.cu:160-221)."""
    depth = jnp.asarray(depth)
    normals = jnp.asarray(normals)
    occ = draw_ssao(depth, normals)
    return _shade(depth, normals, occ)
