"""Staged 3D render pipeline: depth heightmap + AD normals.

TPU-shaped re-design of ``Context::render3D``
(/root/reference/src/context.cu:1282-1458).  The reference runs
64³ -> 16³ -> 4³ interval stages with per-stage host readbacks, a global
subtape arena, and atomicMax depth writes; here (see docs/perf_notes.md
"3D pipeline design" for the reasoning):

  1. stage A — kernel A interval-classifies all (n/64)³ 64³ tiles against
     the full tape (ops/kernels.py::interval_shorten);
  2. occlusion — a heightmap from filled tiles culls ambiguous tiles whose
     top lies at or below the filled height over their whole screen block
     (the ``mask_filled_tiles`` analog, :471-495, as pure jnp max/compare);
  3. stage B — kernel A again over the 64 16³ children of each surviving
     ambiguous parent, full tape, emitting shorten codes; children of
     filled/empty parents are never evaluated (lane-block skip);
  4. per-child tapes — the existing prepass + batched bit-shift compaction
     turn child codes into dense run-structured tapes;
  5. stage C — ops/kernels3d.py::voxel_eval_3d evaluates each ambiguous
     child's 16³ voxels with its own tape;
  6. depth compose — painter's-algorithm maximum composition
     (the atomicMax heightmap, :932-948) as jnp scatter-max;
  7. normals — per-xy-column tapes (interval over the full z extent, so
     one tape is valid at every depth of the column) + the Deriv kernel
     (ops/kernels3d.py::deriv_eval_3d), replacing the reference's
     per-pixel tile-hierarchy tape lookup (:1034-1066).

Depth convention: int32 per pixel, 0 = empty, else top filled voxel
index + 1 (matches render/brute.py::render3d_brute and the reference's
z-index image).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import interval_math as im
from ..ops import kernels, kernels3d
from ..ops.kernels import ST_AMBIG, ST_EMPTY, ST_FILLED
from ..ops.tape_data import TapeData
from ..tape.tape import Tape
from . import camera
from .pipeline2d import _shorten_prepass

TILE = 64


def _iv_mul_scalar(m, lo, hi):
    a, b = m * lo, m * hi
    return jnp.minimum(a, b), jnp.maximum(a, b)


def _mat4_interval(mat, xl, xh, yl, yh, zl, zh):
    """Interval-valued projective mat4 transform (the interval analog of
    calculate_intervals_3d, /root/reference/src/context.cu:78-121)."""
    def row(r):
        al, ah = _iv_mul_scalar(mat[r, 0], xl, xh)
        bl, bh = _iv_mul_scalar(mat[r, 1], yl, yh)
        cl, ch = _iv_mul_scalar(mat[r, 2], zl, zh)
        return al + bl + cl + mat[r, 3], ah + bh + ch + mat[r, 3]

    wl, wh = row(3)
    outs = []
    for r in range(3):
        rl, rh = row(r)
        outs.extend(im.i_div(jnp, rl, rh, wl, wh))
    return outs  # xl xh yl yh zl zh


def _axis_iv(n: int, idx):
    lo = (idx.astype(jnp.float32) / n - 0.5) * 2.0
    hi = ((idx.astype(jnp.float32) + 1.0) / n - 0.5) * 2.0
    return lo, hi


def _tile_boxes_3d(n: int, mat, row0=0, n_rows: int = None):
    """Boxes for the 64³ tiles of screen-tile rows [row0, row0+n_rows);
    LOCAL tile id t = (tz*n_rows + ty_local)*n + tx."""
    if n_rows is None:
        n_rows = n
    t = jnp.arange(n * n_rows * n, dtype=jnp.int32)
    xl, xh = _axis_iv(n, t % n)
    yl, yh = _axis_iv(n, row0 + (t // n) % n_rows)
    zl, zh = _axis_iv(n, t // (n * n_rows))
    return jnp.stack(_mat4_interval(mat, xl, xh, yl, yh, zl, zh))


def _child_boxes_3d(n: int, mat, parents, row0=0, n_rows: int = None):
    """Boxes for the 64 16³ children of each LOCAL parent tile id in
    ``parents`` (local ids index the slab's (tz, ty_local, tx) grid).

    Child lane = pslot*64 + c with c = (czi*4 + cyi)*4 + cxi."""
    if n_rows is None:
        n_rows = n
    p = parents
    tx = p % n
    ty = row0 + (p // n) % n_rows
    tz = p // (n * n_rows)
    c = jnp.arange(64, dtype=jnp.int32)
    cx, cy, cz = c % 4, (c // 4) % 4, c // 16
    gx = (tx[:, None] * 4 + cx[None, :]).reshape(-1)
    gy = (ty[:, None] * 4 + cy[None, :]).reshape(-1)
    gz = (tz[:, None] * 4 + cz[None, :]).reshape(-1)
    xl, xh = _axis_iv(4 * n, gx)
    yl, yh = _axis_iv(4 * n, gy)
    zl, zh = _axis_iv(4 * n, gz)
    return jnp.stack(_mat4_interval(mat, xl, xh, yl, yh, zl, zh))


def _column_boxes(n: int, mat, row0=0, n_rows: int = None):
    """Boxes for the slab's xy screen tiles, z spanning the full [-1,1]."""
    if n_rows is None:
        n_rows = n
    t = jnp.arange(n_rows * n, dtype=jnp.int32)
    xl, xh = _axis_iv(n, t % n)
    yl, yh = _axis_iv(n, row0 + t // n)
    zl = jnp.full_like(xl, -1.0)
    zh = jnp.full_like(xl, 1.0)
    return jnp.stack(_mat4_interval(mat, xl, xh, yl, yh, zl, zh))


def _caps(n: int, n_rows: int = None, cfg=None) -> Tuple[int, int]:
    """Static capacities for ambiguous 64³ tiles / 16³ cells.

    Sized from surface-area scaling: a closed surface crosses O(k²) of the
    k³ cells at granularity k, with a small constant for multi-component /
    high-curvature shapes (multipliers from mpr_tpu.config).  Overflow
    degrades to missing surface regions and warns (see render3d)."""
    from .. import config as _config
    cfg = _config.get() if cfg is None else cfg
    if n_rows is None:
        n_rows = n
    p0 = min(n * n_rows * n, max(64, cfg.p0_scale * n * n_rows))
    c1 = min(p0 * 64, max(512, cfg.c1_scale * n * n_rows))
    # compaction (tpi) and voxel (cpi) batching need aligned counts
    align = max(cfg.tpi, cfg.cpi, 4)
    c1 = -(-c1 // align) * align
    return p0, c1


def render3d_rows(td: TapeData, mat, size: int, row0, n_rows: int,
                  with_normals: bool = True, cfg=None, meta=None,
                  s_cap: int = None):
    """Render screen-tile rows [row0, row0+n_rows) of a size² 3D frame.

    The sharded renderer calls this per shard (each device owns a
    horizontal slab; all stages — classification, occlusion, voxel eval,
    normals — are slab-local because tiles have no cross-tile data
    dependence); the single-chip path uses the whole grid.

    ``meta`` (optional int32[8]: length, num_slots, result_slot, sx, sy,
    sz, num_runs, 0) makes the volatile tape metadata a RUNTIME input —
    the traced structure then depends only on (padded capacity,
    ops_present, ``s_cap`` slot bucket, size, caps config), so one
    executable serves every tape sharing those: the 3D half of the
    zero-recompile interactive-editing contract (see cached_frame3d; the
    reference gets this for free by re-uploading the tape buffer,
    /root/reference/src/tape.cpp:223-227)."""
    from .. import config as _config
    cfg = _config.get() if cfg is None else cfg
    n = size // TILE
    p0_cap, c_cap = _caps(n, n_rows, cfg)
    if s_cap is None:
        s_cap = max(8, -(-td.num_slots // 8) * 8)
    branch_ops, remap = kernels.build_remap(td.ops_present)
    remap_j = jnp.asarray(remap)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    if meta is None:
        meta = jnp.asarray([td.length, td.num_slots, td.result_slot,
                            td.axis_slots[0], td.axis_slots[1],
                            td.axis_slots[2], td.num_runs, 0],
                           dtype=jnp.int32)
    else:
        meta = jnp.asarray(meta, jnp.int32)
    length = meta[0]
    matf = mat.reshape(16)
    # Per-cell tape cap = Tcap/2 (compacted tapes span 4 of the 8 plane
    # rows in flat order): blobby 3D models (bear: EXP blends, 27 choices
    # in 544 clauses) barely shorten, and an overflowing cell falls back
    # to the FULL tape — at cap Tcap/8 that fallback dominated the voxel
    # stage (docs/perf_notes.md).
    cap = td.capacity // cfg.cap_div
    n_tiles0 = n * n_rows * n

    # ---- stage A: 64^3 tiles, full tape ---------------------------------
    boxesA = _tile_boxes_3d(n, mat, row0, n_rows)
    status0, _ = kernels.interval_shorten(meta, td.packed, td.imms,
                                          runs_full, boxesA,
                                          branch_ops=branch_ops,
                                          s_cap=s_cap,
                                          widen=cfg.widen_intervals)
    st0 = status0.reshape(n, n_rows, n)                  # [tz, ty_l, tx]
    tz_idx = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    h0 = jnp.max(jnp.where(st0 == ST_FILLED, (tz_idx + 1) * TILE, 0),
                 axis=0)                                  # (ty_l, tx)

    # occlusion cull of ambiguous tiles fully at/below the filled height
    t_all = jnp.arange(n_tiles0, dtype=jnp.int32)
    top0 = (t_all // (n * n_rows) + 1) * TILE
    amb0 = (status0 == ST_AMBIG) & (top0 > h0.reshape(-1)[
        (t_all // n) % n_rows * n + t_all % n])
    order0 = jnp.argsort(jnp.logical_not(amb0), stable=True)
    order0 = order0[:p0_cap].astype(jnp.int32)
    n_amb0 = jnp.minimum(amb0.sum(), p0_cap).astype(jnp.int32)

    # ---- stage B: 16^3 children of ambiguous parents --------------------
    parents = order0
    boxesB = _child_boxes_3d(n, mat, parents, row0, n_rows)
    metaB = meta.at[7].set(n_amb0 * 64)
    status1, codes1 = kernels.interval_shorten(metaB, td.packed, td.imms,
                                               runs_full, boxesB,
                                               branch_ops=branch_ops,
                                               s_cap=s_cap,
                                               widen=cfg.widen_intervals)
    lane = jnp.arange(p0_cap * 64, dtype=jnp.int32)
    status1 = jnp.where(lane < n_amb0 * 64, status1, ST_EMPTY)

    # child 16-cell coordinates (x global, y slab-local)
    p_of = parents[lane // 64]
    c_of = lane % 64
    gx16 = (p_of % n) * 4 + c_of % 4
    gy16 = ((p_of // n) % n_rows) * 4 + (c_of // 4) % 4
    gz16 = (p_of // (n * n_rows)) * 4 + c_of // 16
    top1 = (gz16 + 1) * 16

    # 16-px-granular heightmap: filled parents upsampled + filled children
    h16 = jnp.repeat(jnp.repeat(h0, 4, 0), 4, 1)          # (4*n_rows, 4n)
    fill1 = status1 == ST_FILLED
    h16 = h16.at[gy16, gx16].max(jnp.where(fill1, top1, 0))

    amb1 = (status1 == ST_AMBIG) & (top1 > h16[gy16, gx16])
    order1 = jnp.argsort(jnp.logical_not(amb1), stable=True)
    order1 = order1[:c_cap].astype(jnp.int32)
    n_amb1 = jnp.minimum(amb1.sum(), c_cap).astype(jnp.int32)

    # ---- per-child tapes --------------------------------------------------
    codes_sel = codes1[order1]
    wrw, irw, rem, lens = _shorten_prepass(codes_sel, td.packed, td.imms,
                                           length, remap_j)
    cmeta = jnp.asarray([0, cap, cap, 0, 0, 0, 0, 0],
                        jnp.int32).at[0].set(n_amb1)
    tw, ti_bits, runsC, gmetaC = kernels.compact_bitshift_batched(
        cmeta, lens, wrw, irw, rem, cap=cap, tpi=cfg.tpi)
    ti = jax.lax.bitcast_convert_type(ti_bits, jnp.float32)

    # ---- stage C: voxel evaluation ---------------------------------------
    nmeta = meta.at[0].set(n_amb1).at[7].set(row0)
    vals = kernels3d.voxel_eval_3d(nmeta, order1, parents, matf,
                                   td.packed, td.imms, runs_full,
                                   branch_ops, tw, ti, runsC, gmetaC,
                                   n_side=n, n_rows=n_rows,
                                   s_cap=s_cap, cpi=cfg.cpi)

    # ---- depth composition (slab-local image) -----------------------------
    h_px = n_rows * TILE
    base = jnp.repeat(jnp.repeat(h16, 16, 0), 16, 1)      # (h_px, size)
    v = vals.reshape(c_cap, 16, 16, 16)                   # [vz, vy, vx]
    cz0 = (gz16[order1] * 16)[:, None, None, None]
    vz = jnp.arange(16, dtype=jnp.int32)[None, :, None, None]
    hit = jnp.where(v < 0.0, cz0 + vz + 1, 0)
    slot_ok = (jnp.arange(c_cap) < n_amb1)[:, None, None]
    dep_c = jnp.where(slot_ok, jnp.max(hit, axis=1), 0)   # (c_cap, 16, 16)
    py = (gy16[order1] * 16)[:, None, None] + \
        jnp.arange(16, dtype=jnp.int32)[None, :, None]
    px = (gx16[order1] * 16)[:, None, None] + \
        jnp.arange(16, dtype=jnp.int32)[None, None, :]
    flat = (py * size + px).reshape(-1)
    depth = base.reshape(-1).at[flat].max(dep_c.reshape(-1))
    depth = depth.reshape(h_px, size).astype(jnp.int32)

    counters = jnp.stack([amb0.sum(), amb1.sum(),
                          jnp.asarray(p0_cap), jnp.asarray(c_cap)])

    if not with_normals:
        return depth, None, counters

    # ---- normals: column tapes + Deriv kernel -----------------------------
    n_cols = n_rows * n
    boxesD = _column_boxes(n, mat, row0, n_rows)
    _, codesD = kernels.interval_shorten(meta, td.packed, td.imms,
                                         runs_full, boxesD,
                                         branch_ops=branch_ops, s_cap=s_cap,
                                         widen=cfg.widen_intervals)
    blocks = depth.reshape(n_rows, TILE, n, TILE).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(n_cols, TILE * TILE)
    content = (blocks.max(axis=1) > 0)
    orderD = jnp.argsort(jnp.logical_not(content),
                         stable=True).astype(jnp.int32)
    n_act = content.sum().astype(jnp.int32)

    codes_selD = codesD[orderD]
    wrwD, irwD, remD, lensD = _shorten_prepass(codes_selD, td.packed,
                                               td.imms, length, remap_j)
    cmetaD = jnp.asarray([0, cap, cap, 0, 0, 0, 0, 0],
                         jnp.int32).at[0].set(n_act)
    # prepass may pad rows up to 256 (see _shorten_prepass); compact at
    # the padded count, then slice back to the real column count
    GD = wrwD.shape[0]
    lensD = jnp.pad(lensD, (0, GD - lensD.shape[0]))
    tpiD = cfg.tpi if GD % cfg.tpi == 0 else 1
    twD, tiD_bits, runsD, gmetaD = kernels.compact_bitshift_batched(
        cmetaD, lensD, wrwD, irwD, remD, cap=cap, tpi=tpiD)
    twD, tiD_bits = twD[:n_cols], tiD_bits[:n_cols]
    runsD, gmetaD = runsD[:n_cols], gmetaD[:n_cols]
    tiD = jax.lax.bitcast_convert_type(tiD_bits, jnp.float32)

    nmetaD = meta.at[0].set(n_act).at[7].set(row0)
    out = kernels3d.deriv_eval_3d(nmetaD, orderD, matf, td.packed, td.imms,
                                  runs_full, branch_ops, twD, tiD, runsD,
                                  gmetaD, blocks, n_side=n, n_rows=n_rows,
                                  s_cap=s_cap)
    # scatter rows back to tile order, normalize, mask empties
    g_idx = jnp.arange(n_cols)
    rows_ok = (g_idx < n_act)[:, None, None]
    out = jnp.where(rows_ok, out, 0.0)
    all_blocks = jnp.zeros((n_cols, 4, TILE * TILE), jnp.float32)
    all_blocks = all_blocks.at[orderD].set(out)
    grad = all_blocks[:, 1:4]                              # (n_cols, 3, 4096)
    norm = jnp.sqrt(jnp.sum(grad * grad, axis=1, keepdims=True))
    grad = grad / jnp.maximum(norm, 1e-12)
    img = grad.reshape(n_rows, n, 3, TILE, TILE).transpose(0, 3, 1, 4, 2)
    img = img.reshape(h_px, size, 3)
    img = jnp.where((depth > 0)[:, :, None], img, 0.0)
    return depth, img, counters


@functools.partial(jax.jit, static_argnames=("size", "with_normals", "cfg"))
def _render3d_jit(td: TapeData, mat: jnp.ndarray, size: int,
                  with_normals: bool = True, cfg=None):
    return render3d_rows(td, mat, size, jnp.int32(0), size // TILE,
                         with_normals, cfg)


_FRAME3D_CACHE: dict = {}


def cached_frame3d(td: TapeData, size: int, with_normals: bool = True,
                   cfg=None):
    """``frame(td, mat) -> (depth, normals, counters)`` with PERSISTED
    lowering and a structure-erased cache key — the 3D half of the
    zero-recompile interactive contract (2D: pipeline2d.cached_frame).

    The traced structure depends only on (padded tape capacity,
    ops_present branch set, slot bucket, size, with_normals, config):
    the volatile metadata (length, slots, runs) rides in a runtime
    int32[8], so any edit whose tape stays inside the same capacity
    bucket and op set re-renders with the SAME executable.  The ~minutes
    of Mosaic lowering on a small host is persisted as a jax.export
    artifact (compcache.cached_lowering).  The reference needs no analog:
    its kernels are tape-generic and a shape edit is just a tape
    re-upload (/root/reference/src/tape.cpp:223-227)."""
    import dataclasses
    from .. import config as _config
    from ..utils import compcache
    from .pipeline2d import _canonical_td, _meta_arr
    cfg = _config.get() if cfg is None else cfg
    s_cap = max(8, -(-td.num_slots // 8) * 8)
    key = ("3d", td.ops_present, td.capacity, s_cap, size, with_normals,
           dataclasses.astuple(cfg))
    fn = _FRAME3D_CACHE.get(key)
    if fn is None:
        import hashlib
        skey = ("interp3d_"
                + hashlib.sha1(repr(key).encode()).hexdigest()[:16])
        n_rows = size // TILE

        def builder(td, meta, mat):
            return render3d_rows(td, mat, size, jnp.int32(0), n_rows,
                                 with_normals, cfg, meta=meta, s_cap=s_cap)

        raw = compcache.cached_lowering(
            skey, builder, _canonical_td(td, s_cap), _meta_arr(td),
            jnp.asarray(camera.identity3()))
        fn = lambda td, mat: raw(_canonical_td(td, s_cap),  # noqa: E731
                                 _meta_arr(td), mat)
        _FRAME3D_CACHE[key] = fn
    return fn


def render3d(tape: Tape, mat=None, size: int = 256,
             with_normals: bool = True):
    """Render depth (+ normals) like render3D
    (/root/reference/inc/context.hpp:50-54).

    Returns (depth int32 (size, size), normals f32 (size, size, 3) or
    None).  Depth: 0 = empty, else top filled voxel index + 1."""
    from .. import config as _config
    import dataclasses
    td = TapeData.from_tape(tape)
    mat = camera.identity3() if mat is None else np.asarray(mat, np.float32)
    cfg = _config.get()
    n = size // TILE
    while True:
        frame = cached_frame3d(td, size, with_normals, cfg)
        depth, normals, counters = frame(td, jnp.asarray(mat))
        c = np.asarray(counters)
        if c[0] <= c[2] and c[1] <= c[3]:
            return np.asarray(depth), (None if normals is None
                                       else np.asarray(normals))
        # Stage caps exceeded: re-render with doubled capacity scales —
        # resource exhaustion must cost time, never pixels (the
        # reference reallocs its tile arrays on overflow,
        # /root/reference/src/context.cu:1219-1222).  Bounded: _caps
        # clamps p0 at n^3 and c1 at p0*64, so doubling terminates.
        grow = {}
        if c[0] > c[2]:
            grow["p0_scale"] = cfg.p0_scale * 2
        if c[1] > c[3]:
            grow["c1_scale"] = cfg.c1_scale * 2
        cfg = dataclasses.replace(cfg, **grow)
        if cfg.p0_scale > 64 * n and cfg.c1_scale > 64 * 64 * n:
            # caps already at their structural maxima; nothing to grow
            return np.asarray(depth), (None if normals is None
                                       else np.asarray(normals))
