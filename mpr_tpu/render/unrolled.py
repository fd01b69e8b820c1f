"""Per-shape-compiled staged renderer: the "unrolled" engine.

Second render engine beside the interpreter pipelines (pipeline2d/3d).
Same staged interval-culling algorithm as the reference's
``Context::render2D/3D`` (/root/reference/src/context.cu:1136-1458), but
every evaluation — interval tile classification, concrete voxel values,
forward-mode normals — runs the tape as straight-line XLA code
(ops/unrolled_eval.py), the full-pipeline generalization of the
reference's compiled-kernel baseline (``benchmark/brute.cu:29-62`` +
``dump_tape.cpp``).  Measured on v5e, unrolled evaluation costs
1.1-3.9 ns per clause per 4096-lane plane vs ~34 ns for the run-dispatch
Pallas interpreter, which flips the design trade-offs:

  * tape shortening no longer pays: re-running the FULL tape on a culled
    lane set is cheaper than building/fetching per-tile subtapes, so
    there are no shorten codes, no compaction, and no subtape memory;
  * the ladder gets deeper (2D: 64px -> 8px -> pixel; 3D: 64^3 -> 16^3
    -> 4^3 -> voxel, the reference's full stage list,
    /root/reference/src/context.cpp:21-26) because packing only the
    *ambiguous* children of each level into dense lane planes is a plain
    cumsum compaction, not a per-tape grouping problem;
  * differentiation is free: the pixel/voxel stage is ordinary traced
    XLA, so d(image)/d(imms) flows straight through the culling
    decisions (SURVEY.md section 7 step 6's straight-through convention).

The price is a per-shape XLA compile (amortized by jit caching and the
persistent compilation cache; see utils/compcache.py).  The interpreter
engine remains the default for interactive shape editing where tapes
change every frame.

Capacity policy (the reference reallocs on overflow,
/root/reference/src/context.cu:1219-1222; resource exhaustion must cost
time, never pixels): every stage's ambiguous set is compacted into a
static-cap buffer; exact counts are returned to the host, and on
overflow the frame is re-rendered with the next power-of-two bucket.
Observed counts are remembered per (kind, size) so steady-state frames
run with snug caps (padding lanes are evaluated at full cost — the
static-shape analog of the reference's unused-warp waste).
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import interval_math as im
from ..ops import unrolled_eval as ue
from ..tape.tape import Tape
from . import camera
from .pipeline3d import _mat4_interval

ST_EMPTY, ST_FILLED, ST_AMBIG = 0, 1, 2
TILE = 64


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _get_barrier():
    """optimization_barrier stops XLA:TPU from fusing stage producers
    into the unrolled evaluation chains (measured 6x voxel-stage
    regressions without it); XLA:CPU neither needs it nor tolerates it
    (compile time/memory explode), so it is a no-op there."""
    from ..ops.kernels import _on_cpu
    if _on_cpu():
        return lambda x: x
    return jax.lax.optimization_barrier


def _classify(lo, hi):
    """0 empty / 1 filled / 2 ambiguous; NaN bounds classify ambiguous
    (matches eval_tiles_i, /root/reference/src/context.cu:293-317)."""
    return jnp.where(lo > 0.0, ST_EMPTY,
                     jnp.where(hi < 0.0, ST_FILLED, ST_AMBIG))


def _compact_ids(mask, cap: int):
    """Stable stream compaction: lane ids where ``mask`` into a (cap,)
    buffer (the ``assign_next_nodes`` analog,
    /root/reference/src/context.cu:512-551).

    XLA TPU scatters cost ~7 ns per index (measured), so this uses the
    binary left-move algorithm from ops/kernels.py kernel C v2 instead:
    each kept id moves left by (# dropped before it) in log2(n) circular
    rolls — collision-free because the move distance is monotone (see
    the proof sketch at ops/kernels.py:1099).  Pure roll/where passes:
    ~6 arrays of bandwidth per pass, no scatter.

    Returns (ids, count): count is exact and may exceed cap — the host
    checks it for the overflow-retry; ids past min(count, cap) are
    garbage and must be masked by the caller."""
    n = mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    cs = jnp.cumsum(mask.astype(jnp.int32))
    ids = jnp.where(mask, iota, 0)
    rem = jnp.where(mask, iota - (cs - 1), 0)
    for k in range(max(1, (n - 1).bit_length())):
        s = 1 << k
        if s >= n:
            break
        ids_sh = jnp.roll(ids, -s)
        rem_sh = jnp.roll(rem, -s)
        arrive = ((rem_sh >> k) & 1) == 1
        moved = ((rem >> k) & 1) == 1
        ids = jnp.where(arrive, ids_sh, ids)
        rem = jnp.where(arrive, rem_sh - s, jnp.where(moved, 0, rem))
    if cap > n:
        ids = jnp.pad(ids, (0, cap - n))
    return ids[:cap], cs[-1]


def _axis_box(idx, ngrid: int):
    f = idx.astype(jnp.float32)
    return (f / ngrid - 0.5) * 2.0, ((f + 1.0) / ngrid - 0.5) * 2.0


def _iv_scale(m, lo, hi):
    a, b = m * lo, m * hi
    return jnp.minimum(a, b), jnp.maximum(a, b)


def _mat3_interval(mat, xl, xh, yl, yh):
    """Interval 3x3 homogeneous transform (calculate_intervals_2d,
    /root/reference/src/context.cu:122-159)."""
    def row(r):
        al, ah = _iv_scale(mat[r, 0], xl, xh)
        bl, bh = _iv_scale(mat[r, 1], yl, yh)
        return al + bl + mat[r, 2], ah + bh + mat[r, 2]
    wl, wh = row(2)
    txl, txh = row(0)
    tyl, tyh = row(1)
    txl, txh = im.i_div(jnp, txl, txh, wl, wh)
    tyl, tyh = im.i_div(jnp, tyl, tyh, wl, wh)
    return txl, txh, tyl, tyh


# ---------------------------------------------------------------------------
# 2D pipeline: 64px -> 8px -> pixel
# ---------------------------------------------------------------------------

def _stages2d(fi, mat, z, size: int, p64: int, p8: int, r0, rows64: int,
              delta: float = 0.0):
    """Interval stages of the 2D ladder: 64px classification -> ambiguous
    compaction -> 8px classification -> ambiguous compaction.  Shared by
    the boolean render (_render2d_impl) and the differentiable soft
    render (_soft_render2d_impl).

    ``delta`` widens the cull test to |f| > delta (classify lo-delta,
    hi+delta): 0 for exact rendering; the soft-fit path passes ~4/
    sharpness so tiles whose tanh is not yet saturated stay ambiguous
    and keep their gradient."""
    n64 = size // 64
    n8 = size // 8
    barrier = _get_barrier()

    # ---- stage 1: 64px tiles (t = ty*n64 + tx, slab-global ids) ----------
    t = r0 * n64 + jnp.arange(rows64 * n64, dtype=jnp.int32)
    xl, xh = _axis_box(t % n64, n64)
    yl, yh = _axis_box(t // n64, n64)
    bxl, bxh, byl, byh = barrier(_mat3_interval(mat, xl, xh, yl, yh))
    zc = jnp.full_like(bxl, z)
    lo, hi = fi(bxl, bxh, byl, byh, zc, zc)
    st64 = _classify(lo - delta, hi + delta)
    ids64, n64a = barrier(_compact_ids(st64 == ST_AMBIG, p64))

    # ---- stage 2: 8px children (c = cy*8 + cx) ---------------------------
    # per-parent coordinates, lanes by broadcast; ids64 are slab-local
    # lane ids, so the y coordinate gets the slab offset back
    tx_p = ids64 % n64
    ty_p = ids64 // n64 + r0
    c = jnp.arange(64, dtype=jnp.int32)
    gx8 = (tx_p[:, None] * 8 + (c % 8)[None, :]).reshape(-1)
    gy8 = (ty_p[:, None] * 8 + (c // 8)[None, :]).reshape(-1)
    xl, xh = _axis_box(gx8, n8)
    yl, yh = _axis_box(gy8, n8)
    bxl, bxh, byl, byh = barrier(_mat3_interval(mat, xl, xh, yl, yh))
    zc = jnp.full_like(bxl, z)
    lo, hi = fi(bxl, bxh, byl, byh, zc, zc)
    lane_ok = jnp.arange(p64 * 64, dtype=jnp.int32) < (
        jnp.minimum(n64a, p64) * 64)
    st8c = jnp.where(lane_ok, _classify(lo - delta, hi + delta), ST_EMPTY)
    ids8, n8a = barrier(_compact_ids(st8c == ST_AMBIG, p8))
    return st64, ids64, n64a, st8c, ids8, n8a, gx8, gy8


def _st8_image(st64, st8c, ids64, n64a, size: int, rows64: int,
               p64: int):
    """Upsample statuses to 8px granularity: parent statuses broadcast,
    ambiguous parents' children take their own statuses (the
    copy_filled_2d upsample analog, /root/reference/src/context.cu:
    664-692).  Flat (rows64*8 * size//8,) slab-local status plane."""
    n64 = size // 64
    n8 = size // 8
    stblk = jnp.broadcast_to(st64[:, None], (rows64 * n64, 64))
    rowpar = jnp.where(jnp.arange(p64) < jnp.minimum(n64a, p64),
                       ids64, rows64 * n64)
    stblk = jnp.concatenate([stblk, jnp.zeros((1, 64), jnp.int32)])
    stblk = stblk.at[rowpar].set(st8c.reshape(p64, 64),
                                 mode="drop")[:rows64 * n64]
    return stblk.reshape(rows64, n64, 8, 8).transpose(
        0, 2, 1, 3).reshape(-1)


def _render2d_impl(fi, f, mat, z, size: int, p64: int, p8: int,
                   r0=None, rows64: Optional[int] = None):
    """2D ladder.  Index discipline (measured XLA TPU pathologies,
    docs/perf_notes.md round-2): never build per-lane chained gathers
    (``arr[ids[L // 64]]`` costs ~15 ns/lane); gather ONCE per cell and
    expand to lanes by broadcasting.  Never scatter per-pixel (~7 ns per
    scatter index); scatter 64-wide block rows.

    ``(r0, rows64)`` select a horizontal slab of 64px tile rows (the
    multi-chip unit: parallel/sharded.py gives each mesh device one
    slab; tiles have no cross-tile dependence so slabs compose exactly).
    ``r0`` may be traced (lax.axis_index), ``rows64`` is static.  The
    default is the whole image.  Returns ((rows64*64, size) image,
    (2,) exact ambiguous counters for the overflow-retry)."""
    n64 = size // 64
    n8 = size // 8
    if rows64 is None:
        rows64 = n64
    r0 = jnp.int32(0 if r0 is None else r0)
    rows8 = rows64 * 8
    barrier = _get_barrier()
    st64, ids64, n64a, st8c, ids8, n8a, gx8, gy8 = _stages2d(
        fi, mat, z, size, p64, p8, r0, rows64)

    # ---- stage 3: pixels of ambiguous 8px tiles --------------------------
    gx8_c = barrier(gx8[ids8])          # one gather layer per stage
    gy8_c = barrier(gy8[ids8])
    p = jnp.arange(64, dtype=jnp.int32)
    gpx = (gx8_c[:, None] * 8 + (p % 8)[None, :]).reshape(-1)
    gpy = (gy8_c[:, None] * 8 + (p // 8)[None, :]).reshape(-1)
    fx = (gpx.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
    fy = (gpy.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
    px_, py_ = barrier(camera.transform2(mat, fx, fy, jnp))
    v = f(px_, py_, jnp.full_like(px_, z))
    px_ok = jnp.arange(p8 * 64, dtype=jnp.int32) < (
        jnp.minimum(n8a, p8) * 64)
    fillpx = ((v < 0.0) & px_ok).reshape(p8, 64)

    # ---- composition: slab image as (rows8*n8, 64) 8px-block rows ----------
    # base: parent statuses upsampled; ambiguous parents' children take
    # their own statuses (the copy_filled_2d upsample analog,
    # /root/reference/src/context.cu:664-692).  All row indices are
    # slab-local (ids64 already is; gy8_c needs the slab offset removed).
    st8img = _st8_image(st64, st8c, ids64, n64a, size, rows64, p64)
    blocks = jnp.broadcast_to((st8img == ST_FILLED)[:, None],
                              (rows8 * n8, 64))
    rowp = jnp.where(jnp.arange(p8) < jnp.minimum(n8a, p8),
                     (gy8_c - r0 * 8) * n8 + gx8_c, rows8 * n8)
    blocks = jnp.concatenate([blocks, jnp.zeros((1, 64), blocks.dtype)])
    blocks = blocks.at[rowp].set(fillpx, mode="drop")[:rows8 * n8]
    img = blocks.reshape(rows8, n8, 8, 8).transpose(0, 2, 1, 3)
    counters = jnp.stack([n64a, n8a])
    return img.reshape(rows64 * 64, size), counters


def _soft_render2d_impl(fi, f, mat, z, size: int, p64: int, p8: int,
                        sharpness: float, r0=None,
                        rows64: Optional[int] = None):
    """Differentiable soft render restricted to ambiguous tiles — the
    culled-pipeline VJP (SURVEY.md §7 step 6's second half).

    ``fi`` must be bound to STOP-GRADIENT immediates, ``f`` to the live
    (differentiable) ones: the interval ladder is inference-only
    forward structure (straight-through convention, like the reference's
    Deriv treating min/max discontinuously,
    /root/reference/inc/gpu_deriv.hpp:106-130), while gradients flow
    through the per-pixel soft values and their scatter into the
    composed image.

    Culling is sound for gradients because the classification is
    widened by delta = 4/sharpness (_stages2d ``delta``): a culled tile
    has |f| > delta everywhere, so its pixels' tanh(-sharpness*f) sits
    within tanh(4)≈1-2.5e-4 of saturation and d(soft)/d(imms) is
    O(sech²(4))≈1.3e-3 of a boundary pixel's — the dense and culled
    losses agree to that tolerance while the culled cost is
    O(ambiguous tiles), not O(size²).

    Returns ((rows64*64, size) f32 soft image, (2,) exact counters)."""
    n64 = size // 64
    n8 = size // 8
    if rows64 is None:
        rows64 = n64
    r0 = jnp.int32(0 if r0 is None else r0)
    rows8 = rows64 * 8
    barrier = _get_barrier()
    delta = 4.0 / float(sharpness)
    st64, ids64, n64a, st8c, ids8, n8a, gx8, gy8 = _stages2d(
        fi, mat, z, size, p64, p8, r0, rows64, delta=delta)

    # pixels of ambiguous 8px tiles (same layout as _render2d_impl
    # stage 3); garbage lanes past the count are pinned to pixel (0,0)'s
    # CENTER — a regular evaluation point like any dense-path pixel.
    # (Pinning them to exactly (0, 0) NaN-poisoned gradients: tapes with
    # hypot/sqrt are singular at the origin, and NaN partials survive
    # multiplication by the dropped lanes' zero cotangents.)
    gx8_c = barrier(gx8[ids8])
    gy8_c = barrier(gy8[ids8])
    p = jnp.arange(64, dtype=jnp.int32)
    gpx = (gx8_c[:, None] * 8 + (p % 8)[None, :]).reshape(-1)
    gpy = (gy8_c[:, None] * 8 + (p // 8)[None, :]).reshape(-1)
    px_ok = jnp.arange(p8 * 64, dtype=jnp.int32) < (
        jnp.minimum(n8a, p8) * 64)
    gpx = jnp.where(px_ok, gpx, 0)
    gpy = jnp.where(px_ok, gpy, 0)
    fx = (gpx.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
    fy = (gpy.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
    px_, py_ = barrier(camera.transform2(mat, fx, fy, jnp))
    v = f(px_, py_, jnp.full_like(px_, z))
    soft = jnp.tanh(-sharpness * v) * 0.5 + 0.5

    # composition: culled tiles contribute their saturated constant
    # (FILLED -> 1, EMPTY -> 0); ambiguous tiles their soft pixels
    st8img = _st8_image(st64, st8c, ids64, n64a, size, rows64, p64)
    base = jnp.where(st8img == ST_FILLED, 1.0, 0.0)
    blocks = jnp.broadcast_to(base[:, None], (rows8 * n8, 64))
    rowp = jnp.where(jnp.arange(p8) < jnp.minimum(n8a, p8),
                     (gy8_c - r0 * 8) * n8 + gx8_c, rows8 * n8)
    blocks = jnp.concatenate([blocks, jnp.zeros((1, 64), blocks.dtype)])
    blocks = blocks.at[rowp].set(soft.reshape(p8, 64),
                                 mode="drop")[:rows8 * n8]
    img = blocks.reshape(rows8, n8, 8, 8).transpose(0, 2, 1, 3)
    counters = jnp.stack([n64a, n8a])
    return img.reshape(rows64 * 64, size), counters


def _render2d_sharded_impl(fi, f, mat, z, size: int, p64: int, p8: int,
                           mesh, rows: int, imms=None):
    """Multi-chip 2D ladder: each mesh device renders one slab of
    ``rows`` 64px tile rows through the full unrolled pipeline
    (slab-local culling; caps are per slab), and the output sharding
    reassembles the image — one gather, the only per-frame collective
    (SURVEY.md §2.5).  Counters come back per-device so the host's
    overflow-retry can take the max.  ``imms`` (imm-input renderers) is
    replicated to every device — parameter edits stay shard-oblivious."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    def local(mat, z, *im):
        fi_ = (lambda *a: fi(*a, imms=im[0])) if im else fi
        f_ = (lambda *a: f(*a, imms=im[0])) if im else f
        r0 = (lax.axis_index("dp") * mesh.shape["sp"]
              + lax.axis_index("sp")) * rows
        img, cnt = _render2d_impl(fi_, f_, mat, z, size, p64, p8,
                                  r0=r0, rows64=rows)
        return img, cnt[None]

    extra = () if imms is None else (imms,)
    g = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(), P()) + (P(),) * len(extra),
                      out_specs=(P(("dp", "sp"), None),
                                 P(("dp", "sp"), None)), check_vma=False)
    return g(mat, z, *extra)


# ---------------------------------------------------------------------------
# 3D pipeline: 64^3 -> 16^3 -> 4^3 -> voxel -> normals
# ---------------------------------------------------------------------------

def _cell_boxes_3d(mat, gx, gy, gz, ngrid: int):
    xl, xh = _axis_box(gx, ngrid)
    yl, yh = _axis_box(gy, ngrid)
    zl, zh = _axis_box(gz, ngrid)
    return _mat4_interval(mat, xl, xh, yl, yh, zl, zh)


def _unblock_rect(blocks, nby: int, nbx: int, bs: int):
    """(nby*nbx, bs*bs) row-blocked image -> (nby*bs, nbx*bs), inner
    index iy*bs + ix (rectangular: a slab of block rows)."""
    return blocks.reshape(nby, nbx, bs, bs).transpose(0, 2, 1, 3).reshape(
        nby * bs, nbx * bs)


def _unblock(blocks, nb: int, bs: int):
    """(nb*nb, bs*bs) row-blocked image -> (nb*bs, nb*bs), inner index
    iy*bs + ix."""
    return _unblock_rect(blocks, nb, nb, bs)


def _zmax4(hit_flat):
    """Max over cz of a (C*64,) plane with inner order (cz*4+cy)*4+cx ->
    (C, 16) patches.  Static minor-dim slices keep arrays at lane-width
    64/16; reshaping to (C, 4, 4, 4) would make XLA pad the minor dims
    to (8, 128) — a 64x memory blowup measured as ~6x voxel-stage cost."""
    h = hit_flat.reshape(-1, 64)
    return jnp.maximum(jnp.maximum(h[:, 0:16], h[:, 16:32]),
                       jnp.maximum(h[:, 32:48], h[:, 48:64]))


def _row_max(blocks, rows, patch, nrows: int):
    """Scatter-max (C, W) patches into (nrows, W) block rows; rows may
    repeat (painter's-algorithm depth composition as row-blocked
    scatter — scalar scatters cost ~7 ns/index on TPU, rows amortize W
    indices into one)."""
    blocks = jnp.concatenate(
        [blocks, jnp.zeros((1, blocks.shape[1]), blocks.dtype)])
    return blocks.at[rows].max(patch, mode="drop")[:nrows]


def _render3d_impl(fi, f, fd, mat, size: int, p0: int, c1: int, c2: int,
                   pn: int, with_normals: bool, skip4: bool = False,
                   debug_stage: str = "", r0=None,
                   rows: Optional[int] = None, c2a: int = 0,
                   c2b: int = 0, c3: int = 0):
    """3D ladder 64^3 -> 16^3 -> 4^3 -> voxel (the reference's full stage
    list, /root/reference/src/context.cpp:21-26), with occlusion culling
    between every stage (mask_filled_tiles analog,
    /root/reference/src/context.cu:471-495) via granularity-matched
    heightmap block images.  Same index discipline as _render2d_impl.

    ``(r0, rows)`` select a slab of screen-space 64px tile ROWS (full z
    columns stay within a slab, so occlusion culling is exact
    slab-locally — the multi-chip unit, SURVEY.md §2.5); ``r0`` may be
    traced, ``rows`` is static.  Default = whole image.  Output depth /
    normals cover (rows*64, size)."""
    n = size // 64
    if rows is None:
        rows = n
    r0 = jnp.int32(0 if r0 is None else r0)
    barrier = _get_barrier()
    c4 = jnp.arange(64, dtype=jnp.int32)
    cx4, cy4, cz4 = c4 % 4, (c4 // 4) % 4, c4 // 16

    # ---- stage A: 64^3 tiles, t = (tz*rows + tyl)*n + tx ------------------
    # (tyl = slab-local tile row; geometry uses the global ty = tyl + r0)
    t = jnp.arange(n * rows * n, dtype=jnp.int32)
    tx, tyl, tz = t % n, (t // n) % rows, t // (n * rows)
    ty = tyl + r0
    lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, tx, ty, tz, n))))
    st0 = _classify(lo, hi)
    # heightmap (tyl*n+tx,) of filled-tile top depth values ((tz+1)*64:
    # depth image convention is top filled voxel index + 1)
    h0 = jnp.max(jnp.where((st0 == ST_FILLED).reshape(n, rows, n),
                           (jnp.arange(n, dtype=jnp.int32) + 1)[:, None,
                                                                None] * 64,
                           0), axis=0).reshape(-1)
    occl0 = (tz + 1) * 64 <= h0[tyl * n + tx]
    ids0, n0 = barrier(_compact_ids((st0 == ST_AMBIG) & ~occl0, p0))
    if debug_stage == "A":
        return None, None, jnp.zeros((6,), jnp.int32) + ids0[0] + n0


    # ---- stage B: 16^3 children (c = (cz*4+cy)*4 + cx) --------------------
    # ids0 are slab-local lane ids; geometry needs the global tile row
    txp = ids0 % n
    typl = (ids0 // n) % rows
    tzp = ids0 // (n * rows)
    g16x = (txp[:, None] * 4 + cx4[None, :]).reshape(-1)
    g16y = ((typl + r0)[:, None] * 4 + cy4[None, :]).reshape(-1)
    g16z = (tzp[:, None] * 4 + cz4[None, :]).reshape(-1)
    lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, g16x, g16y, g16z, 4 * n))))
    okB = jnp.arange(p0 * 64) < jnp.minimum(n0, p0) * 64
    st1 = jnp.where(okB, _classify(lo, hi), ST_EMPTY)

    # h16 block image: row = parent xy tile (slab-local tyl*n+tx),
    # inner = cy*4+cx
    top1 = (g16z + 1) * 16                                 # per lane
    patch16 = _zmax4(jnp.where(st1 == ST_FILLED, top1, 0))
    rows_p = jnp.where(jnp.arange(p0) < jnp.minimum(n0, p0),
                       typl * n + txp, rows * n)
    h16blk = _row_max(jnp.broadcast_to(h0[:, None], (rows * n, 16)),
                      rows_p, patch16, rows * n)
    hb = h16blk[jnp.minimum(rows_p, rows * n - 1)]         # (p0, 16)
    occl1 = (top1 <= jnp.tile(hb, (1, 4)).reshape(-1))
    ids1, n1 = barrier(_compact_ids((st1 == ST_AMBIG) & ~occl1, c1))
    if debug_stage == "B":
        return None, None, jnp.zeros((6,), jnp.int32) + ids1[0] + n1


    g16x_c = barrier(g16x[ids1])
    g16y_c = barrier(g16y[ids1])
    g16z_c = barrier(g16z[ids1])

    if skip4:
        # Interval-hostile models (bear: EXP blends leave ~45% of 4^3
        # children ambiguous at 1024) spend more on the 4^3 interval
        # stage than it saves at the voxel stage; evaluate the 16^3
        # cells' 4096 voxels directly instead (the host picks this per
        # model from observed counts, render3d below).
        vv = jnp.arange(4096, dtype=jnp.int32)
        vx16, vy16 = vv % 16, (vv // 16) % 16
        gvx = (g16x_c[:, None] * 16 + vx16[None, :]).reshape(-1)
        gvy = (g16y_c[:, None] * 16 + vy16[None, :]).reshape(-1)
        gvz = (g16z_c[:, None] * 16 + (vv // 256)[None, :]).reshape(-1)
        fx = (gvx.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        fy = (gvy.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        fz = (gvz.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        wx, wy, wz = barrier(camera.transform3(mat, fx, fy, fz, jnp))
        val = f(wx, wy, wz)
        okV = jnp.arange(c1 * 4096) < jnp.minimum(n1, c1) * 4096
        hit = jnp.where((val < 0.0) & okV, gvz + 1, 0).reshape(c1, 4096)
        patchv = hit[:, 0:256]
        for k in range(1, 16):
            patchv = jnp.maximum(patchv, hit[:, 256 * k:256 * (k + 1)])
        rows_v = jnp.where(jnp.arange(c1) < jnp.minimum(n1, c1),
                           (g16y_c - r0 * 4) * (4 * n) + g16x_c,
                           16 * rows * n)
        h16flat = _unblock_rect(h16blk, rows, n, 4).reshape(-1)
        dblk = _row_max(jnp.broadcast_to(h16flat[:, None],
                                         (16 * rows * n, 256)),
                        rows_v, patchv, 16 * rows * n)
        depth = _unblock_rect(dblk, 4 * rows, 4 * n, 16)
        z0 = jnp.int32(0)
        counters = jnp.stack([n0, n1, z0, z0, z0, z0])
        if not with_normals:
            return depth, None, counters
        return _normals_pass(fd, mat, depth, size, pn, counters,
                             r0=r0, rows=rows)

    # ---- stage B': 4^3 children -------------------------------------------
    g4x = (g16x_c[:, None] * 4 + cx4[None, :]).reshape(-1)
    g4y = (g16y_c[:, None] * 4 + cy4[None, :]).reshape(-1)
    g4z = (g16z_c[:, None] * 4 + cz4[None, :]).reshape(-1)
    lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, g4x, g4y, g4z, 16 * n))))
    okC = jnp.arange(c1 * 64) < jnp.minimum(n1, c1) * 64
    st2 = jnp.where(okC, _classify(lo, hi), ST_EMPTY)

    # h4 block image: row = 16px texel (slab-local y16l*(4n)+g16x),
    # inner = cy*4+cx
    top2 = (g4z + 1) * 4                                   # per lane
    patch4 = _zmax4(jnp.where(st2 == ST_FILLED, top2, 0))
    rows_c = jnp.where(jnp.arange(c1) < jnp.minimum(n1, c1),
                       (g16y_c - r0 * 4) * (4 * n) + g16x_c,
                       16 * rows * n)
    h16flat = _unblock_rect(h16blk, rows, n, 4).reshape(-1)
    h4blk = _row_max(jnp.broadcast_to(h16flat[:, None],
                                      (16 * rows * n, 16)),
                     rows_c, patch4, 16 * rows * n)
    hb = h4blk[jnp.minimum(rows_c, 16 * rows * n - 1)]     # (c1, 16)
    occl2 = (top2 <= jnp.tile(hb, (1, 4)).reshape(-1))
    surv2 = (st2 == ST_AMBIG) & ~occl2
    n4 = 16 * n
    rows4 = 16 * rows
    h4flat = _unblock_rect(h4blk, 4 * rows, 4 * n, 4).reshape(-1)
    zero6 = jnp.zeros((6,), jnp.int32)

    def eval_cells(ids, count, cap):
        """Evaluate the 64 voxels of ``cap`` compacted 4^3 cells; return
        the (cap, 16) depth patches + their 4px-column block rows."""
        g4x_c = barrier(g4x[ids])
        g4y_c = barrier(g4y[ids])
        g4z_c = barrier(g4z[ids])
        gvx = (g4x_c[:, None] * 4 + cx4[None, :]).reshape(-1)
        gvy = (g4y_c[:, None] * 4 + cy4[None, :]).reshape(-1)
        gvz = (g4z_c[:, None] * 4 + cz4[None, :]).reshape(-1)
        fx = (gvx.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        fy = (gvy.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        fz = (gvz.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        wx, wy, wz = barrier(camera.transform3(mat, fx, fy, fz, jnp))
        val = f(wx, wy, wz)
        okV = jnp.arange(cap * 64) < jnp.minimum(count, cap) * 64
        patchv = _zmax4(jnp.where((val < 0.0) & okV, gvz + 1, 0))
        rows_v = jnp.where(jnp.arange(cap) < jnp.minimum(count, cap),
                           (g4y_c - r0 * 16) * n4 + g4x_c, rows4 * n4)
        return patchv, rows_v

    if c2a > 0:
        # ---- TWO-PHASE voxel stage (front-to-back; the z-sweep idea
        # measured round 1 for the interp engine, profitable here
        # because re-culling is one compaction, not a prepass clone).
        # Phase 1: only each 4px column's TOPMOST ambiguous cell.
        # Its composed depths then cull phase 2 against the per-column
        # MINIMUM (exactness: a cell may be skipped only when EVERY
        # pixel of its footprint already has depth >= the cell's top —
        # a column-max test would drop geometry at partial coverage).
        n2 = surv2.sum().astype(jnp.int32)
        ambtop = _zmax4(jnp.where(surv2, g4z + 1, 0))      # (c1, 16)
        ambcol = _row_max(jnp.zeros((16 * rows * n, 16), jnp.int32),
                          rows_c, ambtop, 16 * rows * n)
        ab = ambcol[jnp.minimum(rows_c, 16 * rows * n - 1)]
        is_top = surv2 & (g4z + 1 == jnp.tile(ab, (1, 4)).reshape(-1))
        ids_a, na = barrier(_compact_ids(is_top, c2a))
        if debug_stage == "Bp":
            return None, None, zero6 + ids_a[0] + na
        patch_a, rows_va = eval_cells(ids_a, na, c2a)
        if debug_stage == "V":
            return None, None, zero6 + patch_a[0, 0]
        dblk = _row_max(jnp.broadcast_to(h4flat[:, None],
                                         (rows4 * n4, 16)),
                        rows_va, patch_a, rows4 * n4)
        # per-4px-column minimum depth, re-blocked to 16px-texel rows
        # (row = y16l*(4n)+x16, entry = cy*4+cx) for one row-gather
        m4min = barrier(dblk.min(axis=1))
        m4blk = m4min.reshape(4 * rows, 4, 4 * n, 4).transpose(
            0, 2, 1, 3).reshape(16 * rows * n, 16)
        mb = m4blk[jnp.minimum(rows_c, 16 * rows * n - 1)]
        deeper = top2 > jnp.tile(mb, (1, 4)).reshape(-1)
        ids_b, nb = barrier(_compact_ids(surv2 & ~is_top & deeper, c2b))
        patch_b, rows_vb = eval_cells(ids_b, nb, c2b)
        dblk = _row_max(dblk, rows_vb, patch_b, rows4 * n4)
        counters = jnp.stack([n0, n1, n2, na, nb, jnp.int32(0)])
    elif c3 > 0:
        # ---- 2^3 SUB-REFINEMENT (VERDICT r4 item 7 lever (b)): before
        # evaluating all 64 voxels of each surviving 4^3 cell, interval-
        # classify its eight 2^3 children and voxel-evaluate only the
        # ambiguous ones (8 voxels each); filled children compose their
        # top depth directly.  Lane-layout discipline: children and
        # voxels live in FLAT block-concatenated vectors (block k =
        # contiguous (cap,) slice), never (N, 4/8)-shaped arrays whose
        # minor dim XLA:TPU would pad to 128 (see _zmax4's measured 6x).
        ids2, n2 = barrier(_compact_ids(surv2, c2))
        if debug_stage == "Bp":
            return None, None, zero6 + ids2[0] + n2
        g4x_c = barrier(g4x[ids2])
        g4y_c = barrier(g4y[ids2])
        g4z_c = barrier(g4z[ids2])
        ok2 = jnp.arange(c2, dtype=jnp.int32) < jnp.minimum(n2, c2)
        # children block layout: lane = k*c2 + i, k = (cz2*2+cy2)*2+cx2
        kx = [k % 2 for k in range(8)]
        ky = [(k // 2) % 2 for k in range(8)]
        kz = [k // 4 for k in range(8)]
        g2x = jnp.concatenate([g4x_c * 2 + kx[k] for k in range(8)])
        g2y = jnp.concatenate([g4y_c * 2 + ky[k] for k in range(8)])
        g2z = jnp.concatenate([g4z_c * 2 + kz[k] for k in range(8)])
        lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, g2x, g2y, g2z,
                                                  2 * n4))))
        okc = jnp.tile(ok2, 8)
        st3 = jnp.where(okc, _classify(lo, hi), ST_EMPTY)
        if debug_stage == "R":
            m3 = (st3 == ST_AMBIG).sum().astype(jnp.int32)
            return None, None, zero6 + m3
        # filled children -> per-parent (c2, 16) patch (columns expand
        # 2x2; value = child top depth, maxed over the two cz2 blocks)
        ftop = jnp.where(st3 == ST_FILLED, (g2z + 1) * 2, 0)
        fm = [jnp.maximum(ftop[k * c2:(k + 1) * c2],
                          ftop[(k + 4) * c2:(k + 5) * c2])
              for k in range(4)]                     # k = cy2*2+cx2
        patchf = jnp.stack(
            [fm[(e // 8) * 2 + (e % 4) // 2] for e in range(16)], axis=1)
        rows_v = jnp.where(ok2, (g4y_c - r0 * 16) * n4 + g4x_c,
                           rows4 * n4)
        # ambiguous children -> 8-voxel evaluation, block layout
        # lane = v*c3 + j, v = (vz*2+vy)*2+vx
        ids3, m3 = barrier(_compact_ids(st3 == ST_AMBIG, c3))
        k3 = ids3 // c2
        par3 = ids3 % c2
        g2x_c = barrier(g4x_c[par3] * 2 + (k3 % 2))
        g2y_c = barrier(g4y_c[par3] * 2 + ((k3 // 2) % 2))
        g2z_c = barrier(g4z_c[par3] * 2 + (k3 // 4))
        gvx = jnp.concatenate([g2x_c * 2 + kx[v] for v in range(8)])
        gvy = jnp.concatenate([g2y_c * 2 + ky[v] for v in range(8)])
        gvz = jnp.concatenate([g2z_c * 2 + kz[v] for v in range(8)])
        fx = (gvx.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        fy = (gvy.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        fz = (gvz.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
        wx, wy, wz = barrier(camera.transform3(mat, fx, fy, fz, jnp))
        val = f(wx, wy, wz)
        ok3 = jnp.tile(jnp.arange(c3, dtype=jnp.int32)
                       < jnp.minimum(m3, c3), 8)
        vtop = jnp.where((val < 0.0) & ok3, gvz + 1, 0)
        cm = [jnp.maximum(vtop[v * c3:(v + 1) * c3],
                          vtop[(v + 4) * c3:(v + 5) * c3])
              for v in range(4)]                     # v = vy*2+vx
        cy2 = (k3 // 2) % 2
        cx2 = k3 % 2
        patcha = jnp.stack(
            [jnp.where((jnp.int32(e // 8) == cy2)
                       & (jnp.int32((e % 4) // 2) == cx2),
                       cm[((e // 4) % 2) * 2 + (e % 2)], 0)
             for e in range(16)], axis=1)
        rows_a = jnp.where(jnp.arange(c3) < jnp.minimum(m3, c3),
                           (g2y_c // 2 - r0 * 16) * n4 + g2x_c // 2,
                           rows4 * n4)
        if debug_stage == "V":
            return None, None, zero6 + patcha[0, 0] + patchf[0, 0]
        dblk = _row_max(jnp.broadcast_to(h4flat[:, None],
                                         (rows4 * n4, 16)),
                        rows_v, patchf, rows4 * n4)
        dblk = _row_max(dblk, rows_a, patcha, rows4 * n4)
        counters = jnp.stack([n0, n1, n2, m3, jnp.int32(0), jnp.int32(0)])
    else:
        # ---- single-phase: all surviving ambiguous cells at once ------
        ids2, n2 = barrier(_compact_ids(surv2, c2))
        if debug_stage == "Bp":
            return None, None, zero6 + ids2[0] + n2
        patchv, rows_v = eval_cells(ids2, n2, c2)
        if debug_stage == "V":
            return None, None, zero6 + patchv[0, 0]
        dblk = _row_max(jnp.broadcast_to(h4flat[:, None],
                                         (rows4 * n4, 16)),
                        rows_v, patchv, rows4 * n4)
        counters = jnp.stack([n0, n1, n2, jnp.int32(0), jnp.int32(0),
                              jnp.int32(0)])

    depth = _unblock_rect(dblk, rows4, n4, 4)
    if not with_normals:
        return depth, None, counters
    return _normals_pass(fd, mat, depth, size, pn, counters, r0=r0,
                         rows=rows)


def _normals_pass(fd, mat, depth, size: int, pn: int, counters,
                  r0=None, rows: Optional[int] = None):
    """Normals: forward-mode AD at one voxel in front of the surface
    (eval_pixels_d, /root/reference/src/context.cu:978-1132; z sampling
    one voxel in front per :1001-1005).  One 64px tile per compacted
    content row.  ``(r0, rows)``: the depth slab being processed (tile
    rows; geometry uses global pixel coordinates)."""
    n = size // 64
    if rows is None:
        rows = n
    r0 = jnp.int32(0 if r0 is None else r0)
    barrier = _get_barrier()
    blocks = depth.reshape(rows, TILE, n, TILE).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(rows * n, TILE * TILE)
    content = blocks.max(axis=1) > 0
    idsN, nN = barrier(_compact_ids(content, pn))
    tx_c, ty_c = idsN % n, idsN // n + r0      # global tile row
    d = barrier(blocks[idsN])                              # (pn, 4096)
    pp = jnp.arange(TILE * TILE, dtype=jnp.int32)
    gpx = (tx_c[:, None] * TILE + (pp % TILE)[None, :]).reshape(-1)
    gpy = (ty_c[:, None] * TILE + (pp // TILE)[None, :]).reshape(-1)
    zi = jnp.minimum(d.reshape(-1), size - 1).astype(jnp.float32)
    fx = (gpx.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
    fy = (gpy.astype(jnp.float32) + 0.5) / size * 2.0 - 1.0
    fz = (zi + 0.5) / size * 2.0 - 1.0
    wx, wy, wz = barrier(camera.transform3(mat, fx, fy, fz, jnp))
    _, dx, dy, dz = fd(wx, wy, wz)
    norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv = jnp.where(d.reshape(-1) > 0, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    rows_n = jnp.where(jnp.arange(pn) < jnp.minimum(nN, pn),
                       idsN, rows * n)
    planes = []
    for comp in (dx * inv, dy * inv, dz * inv):
        blk = jnp.zeros((rows * n + 1, TILE * TILE), jnp.float32)
        blk = blk.at[rows_n].set(comp.reshape(pn, TILE * TILE),
                                 mode="drop")[:rows * n]
        planes.append(_unblock_rect(blk, rows, n, TILE))
    nimg = jnp.stack(planes, axis=-1)
    counters = counters.at[5].set(nN)
    return depth, nimg, counters


def _render3d_sharded_impl(fi, f, fd, mat, size: int, p0: int, c1: int,
                           c2: int, pn: int, with_normals: bool,
                           skip4: bool, mesh, rows: int, imms=None,
                           c2a: int = 0, c2b: int = 0):
    """Multi-chip 3D ladder: one slab of 64px tile rows per mesh device
    (full z columns per slab, so the heightmap occlusion culling is
    exact without any cross-device exchange); depth/normal slabs are
    reassembled by the output sharding.  Counters come back per-device
    for the host's max-based overflow-retry."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    def local(mat, *im):
        bind = (lambda fn: (lambda *a: fn(*a, imms=im[0]))) if im \
            else (lambda fn: fn)
        r0 = (lax.axis_index("dp") * mesh.shape["sp"]
              + lax.axis_index("sp")) * rows
        depth, nimg, cnt = _render3d_impl(bind(fi), bind(f), bind(fd),
                                          mat, size, p0, c1,
                                          c2, pn, with_normals, skip4,
                                          r0=r0, rows=rows, c2a=c2a,
                                          c2b=c2b)
        if nimg is None:
            return depth, cnt[None]
        return depth, nimg, cnt[None]

    if with_normals:
        out_specs = (P(("dp", "sp"), None), P(("dp", "sp"), None, None),
                     P(("dp", "sp"), None))
    else:
        out_specs = (P(("dp", "sp"), None), P(("dp", "sp"), None))
    extra = () if imms is None else (imms,)
    g = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(),) + (P(),) * len(extra),
                      out_specs=out_specs, check_vma=False)
    return g(mat, *extra)


# ---------------------------------------------------------------------------
# host-side renderer with cap buckets + overflow retry
# ---------------------------------------------------------------------------

def _bucket(x: int, floor: int, ceil_: int) -> int:
    """Smallest 1.25^k-ish bucket >= x within [floor, ceil], aligned to
    256.  Geometric steps bound the number of distinct compiles while a
    camera orbit varies the ambiguous counts; 1.25 keeps padding-lane
    waste (evaluated at full cost) under ~25%."""
    b = floor
    while b < min(x, ceil_):
        b = -(-int(b * 1.25) // 256) * 256
    return min(b, ceil_)


def tape_key(tape: Tape, imm_inputs: bool = False) -> str:
    """Cache key for a renderer: the tape contents PLUS the semantic
    config flags the unrolled evaluators latch at build time
    (tight_sincos / fast_transcendentals).  Including them here means
    ``config.override(tight_sincos=True)`` builds a distinct renderer
    (and a distinct obs file — the flags change ambiguity counts)
    instead of silently reusing an executable traced under the other
    semantics.

    With ``imm_inputs`` the key is STRUCTURAL: the immediates are
    runtime inputs of the compiled functions (libfive CONST_VAR spirit,
    frontend var()), so two tapes differing only in constants share one
    executable — a slider drag or fit step never recompiles."""
    from .. import config as _config
    cfg = _config.get()
    h = hashlib.sha1()
    planes = (tape.ops, tape.outs, tape.lhss, tape.rhss) if imm_inputs \
        else (tape.ops, tape.outs, tape.lhss, tape.rhss, tape.imms)
    for a in planes:
        h.update(np.ascontiguousarray(a).tobytes())
    h.update(bytes(tape.axis_slots) + bytes([tape.result_slot]))
    h.update(bytes([cfg.tight_sincos, cfg.fast_transcendentals,
                    cfg.widen_intervals, imm_inputs]))
    h.update(np.float32(cfg.compile_effort).tobytes())
    return h.hexdigest()


class UnrolledRenderer:
    """Per-tape compiled render functions + observed-count cap memory.

    ``imm_inputs=True`` compiles the immediates as runtime INPUTS rather
    than baked constants: the executable (and its persistent-cache entry)
    is keyed by tape STRUCTURE only, so constant-level edits — viewer
    slider drags (frontend var()), ``cli --set``, fit steps — re-render
    with zero recompilation.  Baked mode (the default) lets XLA constant-
    fold the immediates and is what the headline benchmarks measure; the
    A/B cost of imm-input mode is recorded in docs/perf_notes.md."""

    def __init__(self, tape: Tape, imm_inputs: bool = False):
        from ..utils import compcache
        from .. import config as _config
        compcache.enable()
        self.tape = tape
        self.imm_inputs = bool(imm_inputs)
        self._key = tape_key(tape, self.imm_inputs)
        # XLA optimization-effort trade for the per-shape compiles
        # (config.compile_effort; 0.0 = backend default).  Latched at
        # build time like the semantic flags above.
        effort = float(_config.get().compile_effort)
        self._copts = None if effort == 0.0 else {
            "exec_time_optimization_effort": effort}
        jit = jax.jit if self._copts is None else partial(
            jax.jit, compiler_options=self._copts)
        self.f = ue.build_float(tape, take_imms=self.imm_inputs)
        self.fi = ue.build_interval(tape, take_imms=self.imm_inputs)
        self.fd = ue.build_deriv(tape, take_imms=self.imm_inputs)
        self._imms_j = jnp.asarray(np.asarray(tape.imms, np.float32))
        if self.imm_inputs:
            def bind(fn, imms):
                return lambda *a: fn(*a, imms=imms)
        else:
            def bind(fn, imms):
                return fn
        self._bind = bind
        self._fns: Dict = {}
        self._r2s = jit(
            lambda imms, mat, z, size, p64, p8, mesh, rows:
            _render2d_sharded_impl(self.fi, self.f, mat, z, size, p64, p8,
                                   mesh, rows,
                                   imms=imms if self.imm_inputs else None),
            static_argnames=("size", "p64", "p8", "mesh", "rows"))
        self._r3s = jit(
            lambda imms, mat, size, p0, c1, c2, pn, with_normals, skip4,
            mesh, rows, c2a=0, c2b=0:
            _render3d_sharded_impl(self.fi, self.f, self.fd, mat, size,
                                   p0, c1, c2, pn, with_normals, skip4,
                                   mesh, rows,
                                   imms=imms if self.imm_inputs else None,
                                   c2a=c2a, c2b=c2b),
            static_argnames=("size", "p0", "c1", "c2", "pn",
                             "with_normals", "skip4", "mesh", "rows",
                             "c2a", "c2b"))
        self._obs, self._hits = compcache.load_obs(self._key)
        self._skip4_age: Dict = {}
        # front-to-back two-phase voxel stage (see _render3d_impl) —
        # default OFF: measured @1024 the per-column-MIN re-cull fires
        # on ~0 cells for every paper model (ambiguous cells concentrate
        # at edges/silhouettes whose 4x4px footprints never reach full
        # coverage, so the exactness-preserving min test cannot cull;
        # gears 53.65 vs 54.08 ms, architecture 15.73 vs 15.30 — a
        # wash; docs/perf_notes.md round-4).  Kept as a measured
        # experiment + for camera angles with face-on coverage.
        self.two_phase = False

    def _fn(self, name: str, static: tuple, builder, example_args):
        """Per-(stage, static-config) callable, trace+lowering persisted
        as a jax.export artifact (compcache.cached_lowering) so later
        processes skip straight to the persistent-cache-covered XLA
        compile.  ``static`` must fully determine the traced structure
        (sizes, caps, flags); self._key already covers tape structure,
        semantic config flags, and compile_effort."""
        key = (name,) + tuple(static)
        fn = self._fns.get(key)
        if fn is None:
            from ..utils import compcache
            skey = (self._key[:16] + "_" + name + "_"
                    + "x".join(str(int(s)) for s in static))
            fn = compcache.cached_lowering(skey, builder, *example_args,
                                           compiler_options=self._copts)
            self._fns[key] = fn
        return fn

    def _r2(self, imms, mat, z, size: int, p64: int, p8: int):
        def builder(imms, mat, z):
            return _render2d_impl(self._bind(self.fi, imms),
                                  self._bind(self.f, imms),
                                  mat, z, size, p64, p8)
        return self._fn("r2", (size, p64, p8), builder,
                        (imms, mat, z))(imms, mat, z)

    def _r3(self, imms, mat, size: int, p0: int, c1: int, c2: int,
            pn: int, with_normals: bool, skip4: bool, c2a: int = 0,
            c2b: int = 0):
        def builder(imms, mat):
            return _render3d_impl(self._bind(self.fi, imms),
                                  self._bind(self.f, imms),
                                  self._bind(self.fd, imms),
                                  mat, size, p0, c1, c2, pn,
                                  with_normals, skip4, c2a=c2a, c2b=c2b)
        return self._fn("r3", (size, p0, c1, c2, pn, with_normals, skip4,
                               c2a, c2b),
                        builder, (imms, mat))(imms, mat)

    def _imms_arg(self, imms):
        """Resolve a render call's imms override (None = the tape's own)."""
        if imms is None:
            return self._imms_j
        if not self.imm_inputs:
            raise ValueError("imms overrides need imm_inputs=True "
                             "(get_renderer(tape, imm_inputs=True))")
        return jnp.asarray(imms, jnp.float32)

    def _record(self, key, counts) -> None:
        from ..utils import compcache
        prev = self._obs.get(key)
        phits = self._hits.get(key, 0)
        hits = 0
        if prev is not None:
            same = all(abs(c - p) <= max(8, 0.03 * max(c, p))
                       for c, p in zip(counts, prev))
            hits = phits + 1 if same else 0
        self._hits[key] = min(hits, 3)     # saturate: snug needs >= 2
        self._obs[key] = counts
        # persist only when the observation actually changed or the key
        # just reached the snug tier (so a later process starts snug):
        # in steady state (the sub-ms frame loop) counts repeat exactly
        # and a per-frame json rewrite would dominate the host path
        if counts != prev or (hits == 2 and phits < 2):
            compcache.save_obs(self._key, self._obs, self._hits)

    def _snug(self, key) -> bool:
        """Steady state: the same ambiguous counts (±3%) seen on
        consecutive frames.  Snug caps drop the 1.25-bucket headroom
        (~25% padding lanes evaluated at full cost); a fixed-camera
        benchmark loop reaches this on its second frame, while an orbit
        keeps the geometric buckets to bound recompiles."""
        return self._hits.get(key, 0) >= 2

    @staticmethod
    def _snug_cap(x: int, floor: int, ceil_: int) -> int:
        return min(ceil_, max(floor, -(-(int(x * 1.03) + 17) // 256) * 256))

    # -- 2D ------------------------------------------------------------------

    def _caps2d(self, size: int) -> Tuple[int, int]:
        n64, n8 = size // 64, size // 8
        obs = self._obs.get(("2d", size))
        if obs is not None:
            a64, a8 = obs
            if self._snug(("2d", size)):
                return (self._snug_cap(a64, 64, n64 * n64),
                        self._snug_cap(a8, 512, n8 * n8))
            return (_bucket(int(a64 * 1.25) + 1, 64, n64 * n64),
                    _bucket(int(a8 * 1.25) + 1, 512, n8 * n8))
        return (min(n64 * n64, max(64, n64 * n64 // 2 + 4 * n64)),
                min(n8 * n8, max(512, n8 * n8 // 3)))

    def render2d(self, mat=None, z: float = 0.0, size: int = 256,
                 imms=None):
        mat = camera.identity2() if mat is None else np.asarray(
            mat, np.float32)
        im = self._imms_arg(imms)
        p64, p8 = self._caps2d(size)
        n64, n8 = size // 64, size // 8
        while True:
            img, cnt = self._r2(im, jnp.asarray(mat), jnp.float32(z), size,
                                p64, p8)
            a64, a8 = (int(v) for v in np.asarray(cnt))
            self._record(("2d", size), (a64, a8))
            if a64 <= p64 and a8 <= p8:
                return np.asarray(img)
            # overflow: grow to the observed counts and re-render — time,
            # never pixels (/root/reference/src/context.cu:1219-1222)
            p64 = _bucket(a64, 64, n64 * n64)
            p8 = _bucket(a8, 512, n8 * n8)

    def render2d_sharded(self, mat=None, z: float = 0.0, size: int = 256,
                         mesh=None, imms=None):
        """Multi-chip unrolled 2D render: the production engine sharded
        over a device mesh — each device owns a slab of 64px tile rows
        (see _render2d_sharded_impl).  Same contract as render2d."""
        from ..parallel.sharded import make_mesh
        mesh = make_mesh() if mesh is None else mesh
        nd = int(mesh.devices.size)
        n64 = size // 64
        if n64 % nd:
            raise ValueError(f"size {size}: {nd} devices must divide "
                             f"{n64} tile rows")
        rows = n64 // nd
        mat = camera.identity2() if mat is None else np.asarray(
            mat, np.float32)
        key = ("2ds", size * 1000 + nd)    # obs keys are (kind, int)
        obs = self._obs.get(key)
        if obs is not None:
            a64, a8 = obs
            if self._snug(key):
                p64 = self._snug_cap(a64, 64, rows * n64)
                p8 = self._snug_cap(a8, 512, rows * n64 * 64)
            else:
                p64 = _bucket(int(a64 * 1.25) + 1, 64, rows * n64)
                p8 = _bucket(int(a8 * 1.25) + 1, 512, rows * n64 * 64)
        else:
            # first frame: the single-slab share of the whole-image
            # heuristic, padded — slabs are less uniform than the image
            p64 = min(rows * n64, max(64, rows * n64 // 2 + 4 * n64))
            p8 = min(rows * n64 * 64, max(512, rows * n64 * 64 // 3))
        while True:
            img, cnts = self._r2s(self._imms_arg(imms), jnp.asarray(mat),
                                  jnp.float32(z), size, p64, p8, mesh, rows)
            a = np.asarray(cnts).max(axis=0)       # worst slab governs
            a64, a8 = int(a[0]), int(a[1])
            self._record(key, (a64, a8))
            if a64 <= p64 and a8 <= p8:
                return np.asarray(img)
            # overflow: grow to the observed max and re-render — time,
            # never pixels (/root/reference/src/context.cu:1219-1222)
            p64 = _bucket(a64, 64, rows * n64)
            p8 = _bucket(a8, 512, rows * n64 * 64)

    # -- 3D ------------------------------------------------------------------

    def _caps3d_for(self, key, size: int, rows: int):
        """Stage caps (p0, c1, c2, c2a, c2b, pn) for a slab of ``rows``
        64px tile rows under obs ``key`` (whole image: rows = size//64).

        (c2a, c2b) are the two-phase voxel-stage caps (phase 1 = one
        cell per 4px column, phase 2 = unoccluded remainder); c2 is the
        single-phase cap, used when two_phase is off or skip4 is on.
        Pre-round-4 obs tuples (4 values, single-phase counters) are
        discarded — the ladder graph changed shape anyway."""
        n = size // 64
        nxy = rows * n             # xy 64px tiles in the slab
        ncol = nxy * n             # 64^3 cells in the slab
        ncol4 = 256 * nxy          # 4px columns in the slab
        obs = self._obs.get(key)
        if obs is not None and len(obs) == 6:
            a0, a1, a2, aa, ab_, aN = obs
            cap = self._snug_cap if self._snug(key) else (
                lambda x, lo, hi: _bucket(int(x * 1.25) + 1, lo, hi))
            return (cap(a0, 64, ncol),
                    cap(a1, 512, ncol * 64),
                    cap(a2, 2048, ncol * 64 * 64),
                    cap(aa, 512, ncol4),
                    cap(ab_, 1024, ncol * 64 * 64),
                    cap(aN, 16, nxy))
        return (min(ncol, max(64, 8 * nxy)),
                min(64 * 8 * nxy, max(1024, 96 * nxy)),
                min(64 * 96 * nxy, max(4096, 768 * nxy)),
                min(ncol4, max(512, ncol4 // 2)),
                min(64 * 96 * nxy, max(4096, 512 * nxy)),
                min(nxy, max(16, nxy // 2)))

    def _caps3d(self, size: int, with_normals: bool = True):
        return self._caps3d_for(("3d", size), size, size // 64)

    def _skip4(self, size: int) -> bool:
        return self._skip4_key(("3d", size))

    def _skip4_key(self, key) -> bool:
        """Skip the 4^3 interval stage when observation says it loses.

        The (cells, 64)-shaped voxel stage pays ~0.9 ns/lane of coordinate/
        patch/layout overhead on top of the ~0.19 ns/lane-per-501-clause
        tape cost, so short-tape models with fat ambiguous shells do
        better evaluating whole 16^3 cells (4096 dense lanes).  Fitting
        the measured 1024^2 break-evens (bear 501 clauses, amb2/amb1=28.8:
        skip wins 29 vs 77 ms; gears 1670 @22.3: stage wins 78 vs 105;
        architecture 1271 @9.2: stage wins) gives the rule
        amb2/amb1 > 10 + clauses/60."""
        obs = self._obs.get(key)
        if obs is None:
            return False
        thr = 10.0 + self.tape.length / 60.0
        return obs[2] > thr * max(obs[1], 1)

    def _skip4_decide(self, key) -> bool:
        """The frame-loop skip4 decision: the _skip4_key predicate plus a
        staleness bound — while skipping, the 4^3 stage never runs, so
        its observed count freezes; re-run the full ladder every 64th
        frame to refresh it (~1.5% amortized cost when the skip is
        right) so a stale count cannot latch the skip forever."""
        if not self._skip4_key(key):
            self._skip4_age[key] = 0
            return False
        age = self._skip4_age.get(key, 0)
        if age >= 64:
            self._skip4_age[key] = 0
            return False
        self._skip4_age[key] = age + 1
        return True

    def render3d(self, mat=None, size: int = 256, with_normals: bool = True,
                 imms=None):
        mat = camera.identity3() if mat is None else np.asarray(
            mat, np.float32)
        im = self._imms_arg(imms)
        key = ("3d", size)
        p0, c1, c2, c2a, c2b, pn = self._caps3d(size)
        skip4 = self._skip4_decide(key)
        two = self.two_phase and not skip4
        if skip4:
            c2 = 256
        if not two:
            c2a = c2b = 0
        n = size // 64
        ncol4 = 256 * n * n
        cmax = n * n * n * 64 * 64
        while True:
            depth, normals, cnt = self._r3(im, jnp.asarray(mat), size, p0,
                                           c1, c2, pn, with_normals, skip4,
                                           c2a, c2b)
            a0, a1, a2, aa, ab_, aN = (int(v) for v in np.asarray(cnt))
            prev = self._obs.get(key)
            if prev is None or len(prev) != 6:
                prev = (0, 0, 0, 0, 0, 1)   # incl. pre-round-4 4-tuples
            if not with_normals:
                aN = prev[5]   # keep the observed normals-tile count
            if skip4:
                # the 4^3 stage / phases didn't run; keep their counts
                a2, aa, ab_ = prev[2], prev[3], prev[4]
            elif not two:
                aa, ab_ = prev[3], prev[4]
            self._record(key, (a0, a1, a2, aa, ab_, max(aN, 1)))
            ok2 = skip4 or (aa <= c2a and ab_ <= c2b if two else a2 <= c2)
            if a0 <= p0 and a1 <= c1 and ok2 and (
                    not with_normals or aN <= pn):
                return (np.asarray(depth),
                        None if normals is None else np.asarray(normals))
            p0 = max(p0, _bucket(a0, 64, n * n * n))
            c1 = max(c1, _bucket(a1, 512, n * n * n * 64))
            if two:
                c2a = max(c2a, _bucket(aa, 512, ncol4))
                c2b = max(c2b, _bucket(ab_, 1024, cmax))
            elif not skip4:
                c2 = max(c2, _bucket(a2, 2048, cmax))
            pn = max(pn, _bucket(aN, 16, n * n))

    def steady_frame3d(self, mat, size: int, with_normals: bool = True):
        """Benchmark helper: converge the capacity buckets to the snug
        steady-state tier (<= 4 renders), then return ``frame(mat) ->
        (depth, normals)`` dispatching the compiled ladder with frozen
        caps — the closure every 3D benchmark times (callers stay
        insulated from the cap/phase plumbing)."""
        mat_np = np.asarray(mat, np.float32)
        for _ in range(4):
            self.render3d(mat=mat_np, size=size, with_normals=with_normals)
            if self._snug(("3d", size)):
                break
        p0, c1, c2, c2a, c2b, pn = self._caps3d(size)
        skip4 = self._skip4_key(("3d", size))
        two = self.two_phase and not skip4
        if skip4:
            c2 = 256
        if not two:
            c2a = c2b = 0

        def frame(mat):
            d, nrm, _ = self._r3(self._imms_j, mat, size, p0, c1, c2, pn,
                                 with_normals, skip4, c2a, c2b)
            return d, nrm
        return frame

    def render3d_sharded(self, mat=None, size: int = 256, mesh=None,
                         with_normals: bool = True, imms=None):
        """Multi-chip unrolled 3D render: each device owns a slab of
        64px tile rows (full z columns — occlusion culling stays exact
        slab-locally) and runs the whole ladder; the output sharding
        reassembles depth/normals.  Same contract as render3d."""
        from ..parallel.sharded import make_mesh
        mesh = make_mesh() if mesh is None else mesh
        nd = int(mesh.devices.size)
        n = size // 64
        if n % nd:
            raise ValueError(f"size {size}: {nd} devices must divide "
                             f"{n} tile rows")
        rows = n // nd
        mat = camera.identity3() if mat is None else np.asarray(
            mat, np.float32)
        key = ("3ds", size * 1000 + nd)    # obs keys are (kind, int)
        p0, c1, c2, c2a, c2b, pn = self._caps3d_for(key, size, rows)
        skip4 = self._skip4_decide(key)
        two = self.two_phase and not skip4
        if skip4:
            c2 = 256
        if not two:
            c2a = c2b = 0
        ncol4 = 256 * rows * n
        cmax = rows * n * n * 64 * 64
        while True:
            out = self._r3s(self._imms_arg(imms), jnp.asarray(mat), size,
                            p0, c1, c2, pn, with_normals, skip4, mesh,
                            rows, c2a, c2b)
            if with_normals:
                depth, normals, cnts = out
            else:
                depth, cnts = out
                normals = None
            a = np.asarray(cnts).max(axis=0)       # worst slab governs
            a0, a1, a2, aa, ab_, aN = (int(v) for v in a)
            prev = self._obs.get(key)
            if prev is None or len(prev) != 6:
                prev = (0, 0, 0, 0, 0, 1)   # incl. pre-round-4 4-tuples
            if not with_normals:
                aN = prev[5]
            if skip4:
                a2, aa, ab_ = prev[2], prev[3], prev[4]
            elif not two:
                aa, ab_ = prev[3], prev[4]
            self._record(key, (a0, a1, a2, aa, ab_, max(aN, 1)))
            ok2 = skip4 or (aa <= c2a and ab_ <= c2b if two else a2 <= c2)
            if a0 <= p0 and a1 <= c1 and ok2 and (
                    not with_normals or aN <= pn):
                return (np.asarray(depth),
                        None if normals is None else np.asarray(normals))
            p0 = max(p0, _bucket(a0, 64, rows * n * n))
            c1 = max(c1, _bucket(a1, 512, rows * n * n * 64))
            if two:
                c2a = max(c2a, _bucket(aa, 512, ncol4))
                c2b = max(c2b, _bucket(ab_, 1024, cmax))
            elif not skip4:
                c2 = max(c2, _bucket(a2, 2048, cmax))
            pn = max(pn, _bucket(aN, 16, rows * n))


_RENDERERS: Dict[str, UnrolledRenderer] = {}


def get_renderer(tape: Tape, imm_inputs: bool = False) -> UnrolledRenderer:
    key = tape_key(tape, imm_inputs)
    r = _RENDERERS.get(key)
    if r is None:
        r = UnrolledRenderer(tape, imm_inputs)
        _RENDERERS[key] = r
    elif imm_inputs:
        # structural key: reuse the executables, but adopt the caller's
        # tape (its imms become the new default imm vector)
        r.tape = tape
        r._imms_j = jnp.asarray(np.asarray(tape.imms, np.float32))
    return r


def render2d(tape: Tape, mat=None, z: float = 0.0,
             size: int = 256) -> np.ndarray:
    """Unrolled-engine 2D render; same contract as pipeline2d.render2d.

    Tapes with named parameters (frontend var()) get imm-input
    renderers: one compile per shape STRUCTURE, so viewer sliders /
    ``cli --set`` / fit loops re-render parameter edits with zero
    recompilation."""
    return get_renderer(tape, imm_inputs=bool(tape.params)).render2d(
        mat, z, size)


def render3d(tape: Tape, mat=None, size: int = 256,
             with_normals: bool = True):
    """Unrolled-engine 3D render; same contract as pipeline3d.render3d.
    Parameter-carrying tapes use imm-input renderers (see render2d)."""
    return get_renderer(tape, imm_inputs=bool(tape.params)).render3d(
        mat, size, with_normals)
