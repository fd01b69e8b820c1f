"""Staged 2D render pipeline (Alg 3 of the paper, TPU-shaped).

The reference's ``Context::render2D`` (/root/reference/src/context.cu:
1136-1280) runs 64px -> 8px -> pixel stages with a blocking host readback of
the active-tile count between stages.  The TPU pipeline is fully on-device
with static shapes:

  1. kernel A (ops/kernels.py::interval_shorten): interval-evaluate all
     (N/64)^2 64-px tiles against the full tape, classify
     empty/filled/ambiguous, and emit per-clause shorten codes;
  2. XLA compaction: top_k turns the code planes into dense per-tile
     shortened tapes (replaces the reference's atomic subtape arena);
  3. a stable argsort moves ambiguous tiles to the front (replaces
     ``assign_next_nodes`` stream compaction + host count readback,
     /root/reference/src/context.cu:512-551, 1208-1210);
  4. kernel B (pixel_eval): one grid instance per ambiguous tile evaluates
     its 64x64 pixels with the tile's shortened tape (4096 VPU lanes);
  5. scatter composes the final image: filled tiles paint 64x64 blocks
     (the analog of ``copy_filled_2d`` upsampling, :664-692), ambiguous
     tiles take their per-pixel signs.

Two levels (64px -> pixels) rather than the reference's three: on TPU the
pixel stage is grouped by the 64-px parent so each kernel instance owns
4096 lanes; a middle 8px interval stage would only shrink tapes for
instance groups too small (64 lanes) to pay for themselves.  See
docs/perf_notes.md for the measurements behind this.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels
from ..ops.kernels import ST_AMBIG, ST_FILLED
from ..ops.tape_data import TapeData
from ..tape.tape import Tape
from ..tape.opcodes import Op
from . import camera

TILE = 64


def tape_meta(td: TapeData) -> np.ndarray:
    sx, sy, sz = td.axis_slots
    return np.asarray([td.length, td.num_slots, td.result_slot,
                       sx, sy, sz, 0, 0], dtype=np.int32)


def _iv_mul_scalar(m, lo, hi):
    """interval * compile-time-traced scalar."""
    a, b = m * lo, m * hi
    return jnp.minimum(a, b), jnp.maximum(a, b)


def _tile_boxes_2d(n_side: int, mat, z, row0=0, n_rows: int = None,
                   col0=0, n_cols: int = None):
    """Interval-transform tile AABBs for the tile block
    [row0, row0+n_rows) x [col0, col0+n_cols), like calculate_intervals_2d
    (/root/reference/src/context.cu:122-159).  ``row0``/``col0`` may be
    traced (sharded rendering passes the shard's offsets); the extents must
    be static."""
    if n_rows is None:
        n_rows = n_side
    if n_cols is None:
        n_cols = n_side
    cidx = col0 + jnp.arange(n_cols, dtype=jnp.float32)
    lo = (cidx / n_side - 0.5) * 2.0
    hi = ((cidx + 1.0) / n_side - 0.5) * 2.0
    ridx = row0 + jnp.arange(n_rows, dtype=jnp.float32)
    rlo = (ridx / n_side - 0.5) * 2.0
    rhi = ((ridx + 1.0) / n_side - 0.5) * 2.0
    # tile t = (ty, tx): x box from tx, y box from ty
    xl = jnp.tile(lo, n_rows)
    xh = jnp.tile(hi, n_rows)
    yl = jnp.repeat(rlo, n_cols)
    yh = jnp.repeat(rhi, n_cols)

    def affine(r):
        al, ah = _iv_mul_scalar(mat[r, 0], xl, xh)
        bl, bh = _iv_mul_scalar(mat[r, 1], yl, yh)
        return al + bl + mat[r, 2], ah + bh + mat[r, 2]

    txl, txh = affine(0)
    tyl, tyh = affine(1)
    twl, twh = affine(2)
    # projective divide (interval): assume w does not span 0 for sane
    # cameras; fall back to the exact interval division if it does.
    from ..ops import interval_math as im
    txl, txh = im.i_div(jnp, txl, txh, twl, twh)
    tyl, tyh = im.i_div(jnp, tyl, tyh, twl, twh)
    zf = jnp.full_like(xl, z)
    return jnp.stack([txl, txh, tyl, tyh, zf, zf])


def _pixel_coords_2d(n_side: int, mat, z, row0=0, n_rows: int = None,
                     col0=0, n_cols: int = None):
    """Per-tile pixel-center coordinates after transform, shaped
    (n_tiles, 3, 4096) with lane k of tile (ty,tx) at pixel
    (ty*64 + k//64, tx*64 + k%64) — matches calculate_pixels
    (/root/reference/src/context.cu:764-813).  Covers the tile block
    [row0, row0+n_rows) x [col0, col0+n_cols)."""
    if n_rows is None:
        n_rows = n_side
    if n_cols is None:
        n_cols = n_side
    size = n_side * TILE
    k = jnp.arange(TILE * TILE)
    dy = (k // TILE).astype(jnp.float32)
    dx = (k % TILE).astype(jnp.float32)
    tc = (col0 + jnp.arange(n_cols, dtype=jnp.float32)) * TILE
    tr = (row0 + jnp.arange(n_rows, dtype=jnp.float32)) * TILE
    # global pixel coords per (tile_row/col, lane)
    gx = tc[:, None] + dx[None, :]         # (n_cols, 4096)
    gy = tr[:, None] + dy[None, :]         # (n_rows, 4096)
    fx = ((gx + 0.5) / size - 0.5) * 2.0
    fy = ((gy + 0.5) / size - 0.5) * 2.0
    # broadcast to full tile grid
    fx = jnp.tile(fx[None, :, :], (n_rows, 1, 1)).reshape(-1, TILE * TILE)
    fy = jnp.repeat(fy[:, None, :], n_cols, axis=1).reshape(-1, TILE * TILE)
    w = mat[2, 0] * fx + mat[2, 1] * fy + mat[2, 2]
    x = (mat[0, 0] * fx + mat[0, 1] * fy + mat[0, 2]) / w
    y = (mat[1, 0] * fx + mat[1, 1] * fy + mat[1, 2]) / w
    zz = jnp.full_like(x, z)
    return jnp.stack([x, y, zz], axis=1)   # (n_tiles, 3, 4096)


def compact_tapes(codes: jnp.ndarray, words: jnp.ndarray,
                  imms: jnp.ndarray, length: int,
                  cap: int):
    """Turn per-clause 4-bit shorten codes into dense per-tile tapes.

    This is the XLA replacement for the reference's backward-writing into
    an atomically-allocated subtape arena (/root/reference/src/context.cu:
    341-458): a top_k over "kept clause" keys compacts each lane's kept
    clauses, preserving order; COPY rewrites patch the opcode byte.

    Args:
      codes: (L, Tcap//8) int32 packed 4-bit codes from kernel A
      words: (Tcap,) int32; imms: (Tcap,) f32 shared source tape
      length: true clause count (<= Tcap)
      cap: output capacity per tile

    Returns:
      (tape_words (L, cap) int32, tape_imms (L, cap) f32, lens (L,) int32)
    """
    L, tw = codes.shape
    tcap = words.shape[0]
    # unpack nibbles -> (L, Tcap)
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    nib = (codes[:, :, None] >> shifts[None, None, :]) & 15
    nib = nib.reshape(L, tcap)
    t_idx = jnp.arange(tcap, dtype=jnp.int32)
    nib = jnp.where(t_idx[None, :] < length, nib, 0)
    keep = nib > 0
    # keys: kept clauses get descending positives in t-order; dropped get
    # negatives — top_k then yields kept clauses in original order.
    key = jnp.where(keep, tcap - t_idx, -1 - t_idx)
    _, idx = jax.lax.top_k(key, cap)                     # (L, cap)
    valid = jnp.take_along_axis(keep, idx, axis=1)
    wsel = words[idx]
    code = jnp.take_along_axis(nib, idx, axis=1)
    new_op = jnp.where(code == kernels.CODE_KEEP, wsel & 0xFF,
              jnp.where(code == kernels.CODE_COPY_LHS, int(Op.COPY_LHS),
               jnp.where(code == kernels.CODE_COPY_RHS, int(Op.COPY_RHS),
                         int(Op.COPY_IMM))))
    word = jnp.where(valid, (wsel & ~0xFF) | new_op, 0)
    imm = jnp.where(valid, imms[idx], 0.0)
    lens = keep.sum(axis=1).astype(jnp.int32)
    return word, imm, lens




def _shorten_prepass(codes, words, imms, length, remap, rows: int = 8):
    """Vectorized XLA prepass for the bit-shift compaction kernel.

    Unpacks kernel A's 4-bit shorten codes, applies the run-preserving
    rewrites (see kernels.py kernel C comments), replaces the opcode byte
    with the kernel branch id, and computes each kept clause's leftward
    move distance (= dropped clauses before it).

    Returns (wrw, irw, rem) as (L, rows, Tcap/rows) int32 planes + lens
    (L,).  ``rows`` sets the compacted-tape capacity (= Tcap/rows, the
    plane's row 0): 8 for 2D (tapes shorten far below Tcap/8), 2 for the
    3D child stage whose blobby models barely shorten.
    """
    from ..tape.opcodes import Op as _Op
    L, tw_words = codes.shape
    # XLA lowers this fusion pathologically for row counts below 256
    # (measured on v5e: L=64 -> 4.2 ms, L=128 -> 8.4 ms, L=256 -> ~0.07 ms
    # for identical per-row work); pad rows up — downstream consumers
    # index rows through `order`/slot ids and never touch the padding.
    L_orig = L
    if L < 256:
        codes = jnp.pad(codes, ((0, 256 - L), (0, 0)))
        L = 256
    tcap = words.shape[0]
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    nib = (codes[:, :, None] >> shifts[None, None, :]) & 15
    nib = nib.reshape(L, tcap)
    t_idx = jnp.arange(tcap, dtype=jnp.int32)
    nib = jnp.where(t_idx[None, :] < length, nib, 0)
    keep = nib > 0

    word = words[None, :]
    op = word & 0xFF
    lhs = (word >> 16) & 0xFF
    rhs = (word >> 24) & 0xFF
    is_min_imm = op == int(_Op.MIN_LHS_IMM)
    is_max_imm = op == int(_Op.MAX_LHS_IMM)
    imm_form = is_min_imm | is_max_imm
    # choice-op rewrites (run-preserving; see kernels.py kernel C)
    dup_rhs = (nib == kernels.CODE_COPY_LHS) & ~imm_form
    take_rhs = nib == kernels.CODE_COPY_RHS
    inf_imm = (nib == kernels.CODE_COPY_LHS) & imm_form
    to_copy_imm = nib == kernels.CODE_COPY_IMM
    new_lhs = jnp.where(take_rhs, rhs, lhs)
    new_rhs = jnp.where(dup_rhs, lhs, rhs)
    new_op = jnp.where(to_copy_imm, int(Op.COPY_IMM), op)
    bid = remap[new_op]
    wrw = jnp.where(keep,
                    bid | (word & 0xFF00) | (new_lhs << 16) | (new_rhs << 24),
                    0)
    imm_bits = jax.lax.bitcast_convert_type(imms, jnp.int32)[None, :]
    pos_inf = jnp.int32(0x7F800000)
    neg_inf = jnp.int32(np.int32(np.float32(-np.inf).view(np.int32)))
    new_imm = jnp.where(inf_imm,
                        jnp.where(is_min_imm, pos_inf, neg_inf), imm_bits)
    irw = jnp.where(keep, new_imm, 0)
    incl = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    rem = jnp.where(keep, t_idx[None, :] - (incl - 1), 0)
    lens = incl[:, -1][:L_orig]
    wr = tcap // rows
    return (wrw.reshape(L, rows, wr), irw.reshape(L, rows, wr),
            rem.reshape(L, rows, wr), lens)


def render_tile_block(td: TapeData, mat, z, size: int, row0, n_rows: int,
                      col0=0, n_cols: int = None, meta=None,
                      s_cap: int = None):
    """Render the tile block [row0, row0+n_rows) x [col0, col0+n_cols) of a
    size² image.

    This is the full staged pipeline over one rectangular slab; the sharded
    renderer (parallel/sharded.py) calls it per shard with the shard's tile
    offsets, the single-chip path with the whole grid.  Returns
    (block image (n_rows*64, n_cols*64) bool, status (n_rows*n_cols,) i32).

    ``meta`` (optional int32[8]: length, num_slots, result_slot, sx, sy,
    sz, num_runs, 0) makes the volatile tape metadata a RUNTIME input:
    the traced structure then depends only on the padded capacity, the
    branch set (ops_present) and the ``s_cap`` slot bucket, so one
    executable serves every tape sharing those — the zero-recompile
    interactive-editing contract (see cached_frame).  Without it the
    metadata is baked from ``td`` as before.
    """
    n_side = size // TILE
    if n_cols is None:
        n_cols = n_side
    n_tiles = n_rows * n_cols
    if s_cap is None:
        s_cap = max(8, -(-td.num_slots // 8) * 8)
    if meta is None:
        meta = jnp.asarray([td.length, td.num_slots, td.result_slot,
                            td.axis_slots[0], td.axis_slots[1],
                            td.axis_slots[2], td.num_runs, 0],
                           dtype=jnp.int32)
    else:
        meta = jnp.asarray(meta, jnp.int32)
    length = meta[0]
    branch_ops, remap = kernels.build_remap(td.ops_present)
    remap_j = jnp.asarray(remap)
    # full-tape run headers with op byte remapped to branch ids
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    from .. import config as _config
    widen = _config.get().widen_intervals
    boxes = _tile_boxes_2d(n_side, mat, z, row0, n_rows, col0, n_cols)
    status, codes = kernels.interval_shorten(meta, td.packed, td.imms,
                                             runs_full, boxes,
                                             branch_ops=branch_ops,
                                             s_cap=s_cap, widen=widen)

    amb = status == ST_AMBIG
    order = jnp.argsort(jnp.logical_not(amb), stable=True).astype(jnp.int32)
    n_amb = amb.sum().astype(jnp.int32)

    # vectorized bit-shift compaction -> per-group run-structured tapes.
    # Per-tile cap: small images shorten less per tile (each tile covers
    # more of the shape), so they get Tcap/4 (measured @512: Tcap/8
    # overflowed into the full-tape fallback); large images keep Tcap/8 —
    # smaller SMEM blocks DMA faster in the pixel kernel.
    # Rows are gathered into `order` order up front so the batched
    # compaction kernel (tpi tiles/instance) applies — 16x fewer grid
    # instances than the order-indirected variant.
    cap = td.capacity // (8 if n_side >= 16 else 4)
    codes_sel = codes[order]
    wrw, irw, rem, lens = _shorten_prepass(codes_sel, td.packed, td.imms,
                                           length, remap_j)
    G = wrw.shape[0]
    lens = jnp.pad(lens, (0, G - lens.shape[0]))
    cmeta = jnp.asarray([0, cap, cap, 0, 0, 0, 0, 0],
                        jnp.int32).at[0].set(n_amb)
    tpi = 16 if G % 16 == 0 else 1
    tw, ti_bits, runs, gmeta = kernels.compact_bitshift_batched(
        cmeta, lens, wrw, irw, rem, cap=cap, tpi=tpi)
    tw, ti_bits = tw[:n_tiles], ti_bits[:n_tiles]
    runs, gmeta = runs[:n_tiles], gmeta[:n_tiles]
    ti = jax.lax.bitcast_convert_type(ti_bits, jnp.float32)

    nmeta = meta.at[0].set(n_amb)
    coords = _pixel_coords_2d(n_side, mat, z, row0, n_rows, col0, n_cols)
    # kernel B writes TILE-indexed 0/1 blocks (ambiguous tiles: per-pixel
    # signs; others: their interval decision), so composition is a reshape
    fill = kernels.pixel_eval_runs(nmeta, order, status, td.packed,
                                   td.imms, runs_full, branch_ops, tw, ti,
                                   runs, gmeta, coords, s_cap=s_cap)
    img = (fill > 0).reshape(n_rows, n_cols, TILE, TILE)
    img = img.transpose(0, 2, 1, 3)
    return img.reshape(n_rows * TILE, n_cols * TILE), status


@functools.partial(jax.jit, static_argnames=("size",))
def _render2d_jit(td: TapeData, mat: jnp.ndarray, z: jnp.ndarray, size: int):
    n_side = size // TILE
    return render_tile_block(td, mat, z, size, jnp.int32(0), n_side,
                             jnp.int32(0), n_side)


_FRAME_CACHE: dict = {}


def _canonical_td(td: TapeData, s_cap: int) -> TapeData:
    """Shape-erased clone: same array leaves, volatile aux zeroed (the
    real values travel in the runtime ``meta`` argument instead), so the
    pytree aux — part of every jit/export cache key — is identical for
    every tape sharing (capacity, ops_present, s_cap)."""
    return TapeData(td.packed, td.imms, td.runs, length=0,
                    num_slots=s_cap, axis_slots=(0, 0, 0), result_slot=0,
                    num_choices=0, ops_present=td.ops_present, num_runs=0)


def _meta_arr(td: TapeData) -> jnp.ndarray:
    return jnp.asarray([td.length, td.num_slots, td.result_slot,
                        td.axis_slots[0], td.axis_slots[1],
                        td.axis_slots[2], td.num_runs, 0], jnp.int32)


def cached_frame(td: TapeData, size: int):
    """``frame(td, mat, z) -> (img, status)`` with PERSISTED lowering and
    a structure-erased cache key — the zero-recompile interactive path.

    Two layers make a cold interactive edit cheap:

      * the traced structure depends only on (padded tape capacity,
        ops_present branch set, slot bucket, size): the volatile
        metadata (length, slots, runs) rides in a runtime int32[8]
        argument, so ANY edit whose tape stays inside the same capacity
        bucket and op set re-renders with the SAME executable — no
        retrace, no recompile (the reference achieves this by
        re-uploading the tape buffer, /root/reference/src/tape.cpp:
        223-227; here the tape planes are simply inputs);
      * the lowering itself (~220 s of Mosaic kernel lowering on a
        1-core host) is persisted as a jax.export artifact
        (compcache.cached_lowering), so even the first edit that DOES
        change the op set pays seconds, not minutes, once any process
        has rendered that op set at this size."""
    from .. import config as _config
    from ..utils import compcache
    cfg = _config.get()
    s_cap = max(8, -(-td.num_slots // 8) * 8)
    key = ("2d", td.ops_present, td.capacity, s_cap, size,
           cfg.tight_sincos, cfg.fast_transcendentals, cfg.widen_intervals)
    fn = _FRAME_CACHE.get(key)
    if fn is None:
        import hashlib
        skey = ("interp2d_"
                + hashlib.sha1(repr(key).encode()).hexdigest()[:16])
        n_side = size // TILE

        def builder(td, meta, mat, z):
            return render_tile_block(td, mat, z, size, jnp.int32(0),
                                     n_side, jnp.int32(0), n_side,
                                     meta=meta, s_cap=s_cap)

        raw = compcache.cached_lowering(
            skey, builder, _canonical_td(td, s_cap), _meta_arr(td),
            jnp.asarray(camera.identity2()), jnp.float32(0.0))
        fn = lambda td, mat, z: raw(_canonical_td(td, s_cap),  # noqa: E731
                                    _meta_arr(td), mat, z)
        _FRAME_CACHE[key] = fn
    return fn


def render2d(tape: Tape, mat=None, z: float = 0.0,
             size: int = 256) -> np.ndarray:
    """Render a boolean fill image (row=y up, col=x), like render2D
    (/root/reference/inc/context.hpp:38-44)."""
    td = TapeData.from_tape(tape)
    mat = camera.identity2() if mat is None else np.asarray(mat, np.float32)
    img, _ = cached_frame(td, size)(td, jnp.asarray(mat), jnp.float32(z))
    return np.asarray(img)
