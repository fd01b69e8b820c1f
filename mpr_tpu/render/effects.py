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


# ---------------------------------------------------------------------------
# Gather-free SSAO: static screen offsets -> shifted-image reads
# ---------------------------------------------------------------------------
#
# The reference's mechanism rotates a hemisphere kernel into each pixel's
# TBN frame, making every depth lookup a data-dependent 2D index — a GPU
# texture fetch, but on TPU a random gather at ~10 ns/index: 727 ms for
# 64 x 1024² indices, irreducible within the gather mechanism (windowed
# gathers measured identical, docs/perf_notes.md round-4).  The static
# mode removes the per-pixel rotation instead (VERDICT round-4 item 4):
# sample a FIXED set of sphere offsets (Mittring-style sphere sampling),
# mask each sample to the normal's hemisphere per pixel via dot(s, n) > 0,
# and normalize by the in-hemisphere count.  Every sample's screen offset
# is then a compile-time constant, so the depth lookup is a shifted-image
# read (one static slice of a padded plane — zero per-index cost, pure
# HBM streaming) and the whole AO pass is elementwise math XLA fuses.
# The z test and the two-band distance falloff match the gather mode
# exactly; only the sampling pattern differs (documented divergence —
# the reference's pattern is itself arbitrary rand()-seeded).

N_SAMPLES_STATIC = 128   # sphere samples; ~half land in any hemisphere


def _ssao_static_kernel() -> np.ndarray:
    """Fixed sphere sample set, quadratically scaled toward the center
    like the reference's hemisphere kernel (effects.cu:231-243)."""
    rng = np.random.default_rng(20200717)
    n = N_SAMPLES_STATIC
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    scale = np.arange(n) / (n - 1)
    v *= ((scale * scale) * 0.9 + 0.1)[:, None]
    return (v * RADIUS).astype(np.float32)


_KERNEL_STATIC = _ssao_static_kernel()


@jax.jit
def ssao_raw_static(depth: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Gather-free raw AO in [0,1] (see block comment above)."""
    size = depth.shape[0]
    px, py, pz = _world_pos(depth, size)
    kern = _KERNEL_STATIC
    # world -> pixel offset: world spans [-1,1] over `size` pixels
    dxs = np.round(kern[:, 0] / 2.0 * size).astype(int)
    dys = np.round(kern[:, 1] / 2.0 * size).astype(int)
    pad = int(max(np.abs(dxs).max(), np.abs(dys).max(), 1))
    # out-of-image samples read depth 0 (empty), like the gather mode's
    # in-bounds mask
    dp = jnp.pad(depth, pad)

    occ = jnp.zeros((size, size), jnp.float32)
    cnt = jnp.zeros((size, size), jnp.float32)
    for i in range(N_SAMPLES_STATIC):
        kx, ky, kz = (float(kern[i, 0]), float(kern[i, 1]),
                      float(kern[i, 2]))
        dy, dx = int(dys[i]), int(dxs[i])
        # hemisphere mask: sample direction within 90° of the normal
        inhemi = (normals[..., 0] * kx + normals[..., 1] * ky
                  + normals[..., 2] * kz) > 0.0
        w = inhemi.astype(jnp.float32)
        h = jax.lax.dynamic_slice(dp, (pad + dy, pad + dx), (size, size))
        sz = pz + kz
        actual_z = 2.0 * ((h + 0.5) / size - 0.5)
        dz = jnp.abs(sz - actual_z)
        below = sz <= actual_z
        near = jnp.where(dz < RADIUS, below.astype(jnp.float32), 0.0)
        fall = ((RADIUS - (dz - RADIUS)) / RADIUS) ** 2
        far = jnp.where((dz >= RADIUS) & (dz < 2 * RADIUS) & below,
                        fall, 0.0)
        occ = occ + (near + far) * w
        cnt = cnt + w
    out = 1.0 - occ / jnp.maximum(cnt, 1.0)
    return jnp.where(depth > 0, out, 0.0)


def draw_ssao(depth, normals, ao_scale: int = None,
              mode: str = None) -> jnp.ndarray:
    """Blurred ambient-occlusion image in [0,1] (Effects::drawSSAO).

    ``mode`` (default ``config.ssao_mode``): "static" = gather-free
    fixed-offset sampling (TPU-fast; see ssao_raw_static), "gather" =
    the reference's per-pixel rotated-hemisphere mechanism (ssao_raw).

    ``ao_scale``: compute the raw AO at 1/ao_scale resolution and
    upsample before the full-resolution edge-aware blur.  Default
    (``config.ao_scale``, 0 = auto): full-res for static mode and
    <512² gather; 2 for gather mode at >=512² — where full-res costs
    727 ms @1024² against the ~10 ns/index gather wall (measured,
    docs/perf_notes.md round-4; index COUNT is the only in-mechanism
    lever).  AO is low-frequency and blurred anyway, so half-res raw
    AO + full-res edge-aware blur is visually equivalent at a quarter
    the cost (a documented divergence from the reference, whose GPU
    texture fetches make full-res free)."""
    from .. import config as _config
    cfg = _config.get()
    depth = jnp.asarray(depth)
    normals = jnp.asarray(normals)
    size = depth.shape[0]
    if mode is None:
        mode = cfg.ssao_mode
    raw_fn = ssao_raw_static if mode == "static" else ssao_raw
    if ao_scale is None:
        ao_scale = cfg.ao_scale
    if ao_scale == 0:
        ao_scale = 2 if (mode == "gather" and size >= 512) else 1
    if ao_scale > 1:
        raw_s = raw_fn(depth[::ao_scale, ::ao_scale],
                       normals[::ao_scale, ::ao_scale])
        raw = jnp.repeat(jnp.repeat(raw_s, ao_scale, 0), ao_scale, 1)
    else:
        raw = raw_fn(depth, normals)
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
