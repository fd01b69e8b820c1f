"""Work-per-pixel heatmap instrumentation.

The reference duplicates its kernels with an interpreted-clause counter
spread over each tile's pixels (``eval_tiles_i_heatmap`` /
``eval_voxels_f_heatmap``, /root/reference/src/context.cu:1513-2340) to
visualize how much tape each pixel costs.  Here the same quantity falls
out analytically: the run-dispatch interpreters execute exactly the
shortened-tape lengths the compaction pass reports, so the heatmap is the
pipeline's own bookkeeping — status + kept-clause counts — upsampled to
pixels.  No instrumented kernels, no second render.

Normalization matches the reference: clause counts divided by the source
tape length (they use ``tape.length - 2`` to skip their header/terminator
words, /root/reference/src/context.cu:2140-2144; our tape has neither).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels
from ..ops.kernels import ST_AMBIG
from ..ops.tape_data import TapeData
from ..tape.tape import Tape
from . import camera
from .pipeline2d import (TILE, _shorten_prepass, _tile_boxes_2d,
                         tape_meta)


@functools.partial(jax.jit, static_argnames=("size",))
def _heatmap2d_jit(td: TapeData, mat, z, size: int):
    n_side = size // TILE
    meta = jnp.asarray(tape_meta(td)).at[6].set(td.num_runs)
    branch_ops, remap = kernels.build_remap(td.ops_present)
    remap_j = jnp.asarray(remap)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)

    s_cap = max(8, -(-td.num_slots // 8) * 8)
    boxes = _tile_boxes_2d(n_side, mat, z)
    status, codes = kernels.interval_shorten(meta, td.packed, td.imms,
                                             runs_full, boxes,
                                             branch_ops=branch_ops,
                                             s_cap=s_cap)
    _, _, _, lens = _shorten_prepass(codes, td.packed, td.imms,
                                     td.length, remap_j)
    cap = td.capacity // 8
    T = jnp.float32(td.length)
    amb = status == ST_AMBIG
    # per-pixel work: interval stage amortized over the 64x64 tile
    # + the pixel stage's shortened tape (full tape on overflow)
    pix = jnp.where(lens > cap, T, lens.astype(jnp.float32))
    per_tile = T / (TILE * TILE) + jnp.where(amb, pix, 0.0)
    heat = per_tile.reshape(n_side, n_side)
    heat = jnp.repeat(jnp.repeat(heat, TILE, 0), TILE, 1)
    return heat / T


def render2d_heatmap(tape: Tape, mat=None, z: float = 0.0,
                     size: int = 256) -> np.ndarray:
    """Per-pixel normalized clause-evaluation count, like
    Context::render2D_heatmap (/root/reference/src/context.cu:2009-2147)."""
    td = TapeData.from_tape(tape)
    mat = camera.identity2() if mat is None else np.asarray(mat, np.float32)
    return np.asarray(_heatmap2d_jit(td, jnp.asarray(mat),
                                     jnp.float32(z), size))


@functools.partial(jax.jit, static_argnames=("size",))
def _heatmap3d_jit(td: TapeData, mat, size: int):
    from .pipeline3d import (_caps, _child_boxes_3d, _tile_boxes_3d)
    from ..ops.kernels import ST_EMPTY, ST_FILLED
    n = size // TILE
    p0_cap, c_cap = _caps(n)
    meta = jnp.asarray(tape_meta(td)).at[6].set(td.num_runs)
    branch_ops, remap = kernels.build_remap(td.ops_present)
    remap_j = jnp.asarray(remap)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    T = jnp.float32(td.length)
    cap = td.capacity // 2   # matches pipeline3d's per-cell cap

    # stage A work: T per 64^3 tile, amortized over its 64^2 pixels,
    # summed over the n z-tiles of each screen column
    heat_xy = jnp.full((n, n), n * float(td.length) / (TILE * TILE),
                       jnp.float32)

    s_cap = max(8, -(-td.num_slots // 8) * 8)
    boxesA = _tile_boxes_3d(n, mat)
    status0, _ = kernels.interval_shorten(meta, td.packed, td.imms,
                                          runs_full, boxesA,
                                          branch_ops=branch_ops,
                                          s_cap=s_cap)
    amb0 = status0 == ST_AMBIG
    order0 = jnp.argsort(jnp.logical_not(amb0),
                         stable=True)[:p0_cap].astype(jnp.int32)
    n_amb0 = jnp.minimum(amb0.sum(), p0_cap).astype(jnp.int32)

    # stage B work: T per 16^3 child over its 16^2 pixels; every ambiguous
    # parent contributes its 64 children's share to its xy block
    t_all = jnp.arange(n ** 3)
    txy = ((t_all // n) % n) * n + (t_all % n)
    w_b = jnp.where(amb0, 64.0 * float(td.length) / (16 * 16), 0.0)
    heat_xy = heat_xy.reshape(-1).at[txy].add(
        w_b / (4.0 * 4.0)).reshape(n, n)
    # (each child covers 1/16 of the parent's 64x64 block: scale by 16/256)

    boxesB = _child_boxes_3d(n, mat, order0)
    metaB = meta.at[7].set(n_amb0 * 64)
    status1, codes1 = kernels.interval_shorten(metaB, td.packed, td.imms,
                                               runs_full, boxesB,
                                               branch_ops=branch_ops,
                                               s_cap=s_cap)
    lane = jnp.arange(p0_cap * 64)
    status1 = jnp.where(lane < n_amb0 * 64, status1, ST_EMPTY)
    amb1 = status1 == ST_AMBIG
    _, _, _, lens1 = _shorten_prepass(codes1, td.packed, td.imms,
                                      td.length, remap_j)
    # voxel work: 16 voxels per pixel of an ambiguous child's 16x16 block
    pix1 = jnp.where(lens1 > cap, T, lens1.astype(jnp.float32)) * 16.0
    pix1 = jnp.where(amb1, pix1, 0.0)
    p_of = order0[lane // 64]
    c_of = lane % 64
    gx16 = (p_of % n) * 4 + c_of % 4
    gy16 = ((p_of // n) % n) * 4 + (c_of // 4) % 4
    heat16 = jnp.zeros((4 * n, 4 * n), jnp.float32)
    heat16 = heat16.at[gy16, gx16].add(pix1)

    heat = jnp.repeat(jnp.repeat(heat_xy, TILE, 0), TILE, 1) + \
        jnp.repeat(jnp.repeat(heat16, 16, 0), 16, 1)
    return heat / T


def render3d_heatmap(tape: Tape, mat=None, size: int = 256) -> np.ndarray:
    """3D analog (Context::render3D_heatmap,
    /root/reference/src/context.cu:2150-2340); normals work excluded."""
    td = TapeData.from_tape(tape)
    mat = camera.identity3() if mat is None else np.asarray(mat, np.float32)
    return np.asarray(_heatmap3d_jit(td, jnp.asarray(mat), size))
