"""Work-per-pixel instrumentation for the UNROLLED (production) engine.

The reference instruments its production kernels with clause counters
(``eval_tiles_i_heatmap`` etc., /root/reference/src/context.cu:1513-2340).
The unrolled engine needs no counters: it never shortens tapes, so every
evaluation costs exactly ``tape.length`` clauses and the per-pixel work
is fully determined by the ladder's stage statuses — which stage decided
each pixel, and how many deeper evaluations its cells paid.  This module
re-runs the interval stages (cheap relative to a full render: no pixel/
voxel stage) and composes the analytic count image.

Per-pixel attribution (normalized by tape length like the reference,
/root/reference/src/context.cu:2140-2144):

  2D:  1/4096                        every pixel (64px stage, amortized)
     + 1/64    if its 64px tile was ambiguous      (8px children stage)
     + 1       if its 8px tile was ambiguous       (pixel stage)

  3D:  n/4096 summed over the z column's 64^3 cells, then per surviving
     (ambiguous & unoccluded) cell: 64 interval evals over its xy block
     at each refinement, and 64 float evals per ambiguous 4^3 cell; + 1
     per pixel of a content tile for the normals pass.

Static-shape padding lanes (capacity minus true count) are evaluated at
full cost on TPU but belong to no pixel; their share is reported in the
returned ``totals`` dict so the heatmap stays honest about the
difference between attributable and executed work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tape.tape import Tape
from . import camera
from .unrolled import (ST_AMBIG, ST_FILLED, _cell_boxes_3d, _classify,
                       _compact_ids, _get_barrier, _st8_image, _stages2d,
                       _zmax4, get_renderer)


def _workmap2d_impl(fi, mat, z, size: int, p64: int, p8: int):
    n64 = size // 64
    st64, ids64, n64a, st8c, ids8, n8a, gx8, gy8 = _stages2d(
        fi, mat, z, size, p64, p8, jnp.int32(0), n64)
    st8img = _st8_image(st64, st8c, ids64, n64a, size, n64, p64)
    amb64 = (st64 == ST_AMBIG).astype(jnp.float32)        # (n64²,)
    amb8 = (st8img == ST_AMBIG).astype(jnp.float32)       # (n8²,) y-major
    amb64_up = jnp.repeat(jnp.repeat(amb64.reshape(n64, n64), 8, 0), 8, 1)
    w8 = 1.0 / 4096.0 + amb64_up.reshape(-1) / 64.0 + amb8
    heat = jnp.repeat(jnp.repeat(w8.reshape(size // 8, size // 8), 8, 0),
                      8, 1)
    return heat, jnp.stack([n64a, n8a])


def workmap2d(tape: Tape, mat=None, z: float = 0.0, size: int = 256
              ) -> Tuple[np.ndarray, dict]:
    """(per-pixel normalized clause count, totals) for the unrolled 2D
    ladder — the production-engine analog of render/heatmap.py (which
    instruments the interp pipeline's shortened tapes)."""
    r = get_renderer(tape, imm_inputs=bool(tape.params))
    # converge caps exactly as a render would (work follows the caps)
    r.render2d(mat, z, size)
    p64, p8 = r._caps2d(size)
    mat = camera.identity2() if mat is None else np.asarray(mat, np.float32)

    def builder(imms, mat, z):
        fi = r._bind(r.fi, imms)
        return _workmap2d_impl(fi, mat, z, size, p64, p8)

    fn = r._fn("w2", (size, p64, p8), builder,
               (r._imms_j, jnp.asarray(mat), jnp.float32(z)))
    heat, cnt = fn(r._imms_j, jnp.asarray(mat), jnp.float32(z))
    a64, a8 = (int(v) for v in np.asarray(cnt))
    L = tape.length
    totals = {
        "clauses": L,
        "stage_lanes": {"64px": size * size // 4096, "8px": p64 * 64,
                        "pixel": p8 * 64},
        "attributable_evals": (size * size // 4096 + a64 * 64
                               + a8 * 64) * L,
        "executed_evals": (size * size // 4096 + p64 * 64 + p8 * 64) * L,
        "padding_evals": ((p64 - a64) + (p8 - a8)) * 64 * L,
    }
    return np.asarray(heat), totals


def _workmap3d_impl(fi, mat, size: int, p0: int, c1: int, c2: int,
                    skip4: bool):
    """Interval stages of the 3D ladder (mirroring
    unrolled._render3d_impl including occlusion culling and skip4), with
    per-stage work scattered into granularity-matched xy images."""
    n = size // 64
    barrier = _get_barrier()
    c4 = jnp.arange(64, dtype=jnp.int32)
    cx4, cy4, cz4 = c4 % 4, (c4 // 4) % 4, c4 // 16

    # stage A: every 64^3 cell costs one interval eval over its 64² px
    t = jnp.arange(n * n * n, dtype=jnp.int32)
    tx, ty, tz = t % n, (t // n) % n, t // (n * n)
    lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, tx, ty, tz, n))))
    st0 = _classify(lo, hi)
    h0 = jnp.max(jnp.where((st0 == ST_FILLED).reshape(n, n, n),
                           (jnp.arange(n, dtype=jnp.int32) + 1)[:, None,
                                                                None] * 64,
                           0), axis=0).reshape(-1)
    occl0 = (tz + 1) * 64 <= h0[ty * n + tx]
    surv0 = (st0 == ST_AMBIG) & ~occl0
    ids0, n0 = barrier(_compact_ids(surv0, p0))
    heat64 = jnp.full((n * n,), n / 4096.0, jnp.float32)
    # stage B share: 64 children × L intervals over the parent's 64² px
    heat64 = heat64 + jnp.zeros((n * n,)).at[ty * n + tx].add(
        jnp.where(surv0, 64.0 / 4096.0, 0.0))

    # stage B: statuses + heightmap for its survivors
    txp = ids0 % n
    typ = (ids0 // n) % n
    tzp = ids0 // (n * n)
    g16x = (txp[:, None] * 4 + cx4[None, :]).reshape(-1)
    g16y = (typ[:, None] * 4 + cy4[None, :]).reshape(-1)
    g16z = (tzp[:, None] * 4 + cz4[None, :]).reshape(-1)
    lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, g16x, g16y, g16z,
                                              4 * n))))
    okB = jnp.arange(p0 * 64) < jnp.minimum(n0, p0) * 64
    st1 = jnp.where(okB, _classify(lo, hi), 0)
    top1 = (g16z + 1) * 16
    h16 = jnp.zeros((4 * n * 4 * n,), jnp.int32).at[
        g16y * (4 * n) + g16x].max(
        jnp.where(st1 == ST_FILLED, top1, 0))
    h16 = jnp.maximum(h16, jnp.repeat(jnp.repeat(
        h0.reshape(n, n), 4, 0), 4, 1).reshape(-1))
    occl1 = top1 <= h16[g16y * (4 * n) + g16x]
    surv1 = (st1 == ST_AMBIG) & ~occl1
    ids1, n1 = barrier(_compact_ids(surv1, c1))
    heat16 = jnp.zeros((4 * n * 4 * n,), jnp.float32)
    if skip4:
        # surviving 16^3 cells evaluate their 4096 voxels directly:
        # 4096 float evals over a 16² px block = 16 per px
        heat16 = heat16.at[g16y * (4 * n) + g16x].add(
            jnp.where(surv1, 16.0, 0.0))
        n2 = jnp.int32(0)
        heat4 = jnp.zeros((16 * n * 16 * n,), jnp.float32)
    else:
        # stage B' share: 64 children × L intervals over 16² px
        heat16 = heat16.at[g16y * (4 * n) + g16x].add(
            jnp.where(surv1, 64.0 / 256.0, 0.0))
        g16x_c = barrier(g16x[ids1])
        g16y_c = barrier(g16y[ids1])
        g16z_c = barrier(g16z[ids1])
        g4x = (g16x_c[:, None] * 4 + cx4[None, :]).reshape(-1)
        g4y = (g16y_c[:, None] * 4 + cy4[None, :]).reshape(-1)
        g4z = (g16z_c[:, None] * 4 + cz4[None, :]).reshape(-1)
        lo, hi = fi(*barrier(tuple(_cell_boxes_3d(mat, g4x, g4y, g4z,
                                                  16 * n))))
        okC = jnp.arange(c1 * 64) < jnp.minimum(n1, c1) * 64
        st2 = jnp.where(okC, _classify(lo, hi), 0)
        top2 = (g4z + 1) * 4
        h4 = jnp.zeros((16 * n * 16 * n,), jnp.int32).at[
            g4y * (16 * n) + g4x].max(
            jnp.where(st2 == ST_FILLED, top2, 0))
        h4 = jnp.maximum(h4, jnp.repeat(jnp.repeat(
            h16.reshape(4 * n, 4 * n), 4, 0), 4, 1).reshape(-1))
        occl2 = top2 <= h4[g4y * (16 * n) + g4x]
        surv2 = (st2 == ST_AMBIG) & ~occl2
        _, n2 = _compact_ids(surv2, c2)
        # voxel stage: 64 float evals over the 4² px block = 4 per px
        heat4 = jnp.zeros((16 * n * 16 * n,), jnp.float32).at[
            g4y * (16 * n) + g4x].add(jnp.where(surv2, 4.0, 0.0))

    heat = (jnp.repeat(jnp.repeat(heat64.reshape(n, n), 64, 0), 64, 1)
            + jnp.repeat(jnp.repeat(heat16.reshape(4 * n, 4 * n), 16, 0),
                         16, 1)
            + jnp.repeat(jnp.repeat(heat4.reshape(16 * n, 16 * n), 4, 0),
                         4, 1))
    return heat, jnp.stack([n0, n1, n2])


def workmap3d(tape: Tape, mat=None, size: int = 256
              ) -> Tuple[np.ndarray, dict]:
    """(per-pixel normalized clause count, totals) for the unrolled 3D
    ladder; the normals pass adds 1 per pixel of a content tile
    (one Deriv eval per pixel, clause-counted like the reference's
    heatmaps, which also exclude shading)."""
    r = get_renderer(tape, imm_inputs=bool(tape.params))
    depth, _ = r.render3d(mat, size, with_normals=False)
    key = ("3d", size)
    p0, c1, c2, _c2a, _c2b, pn = r._caps3d(size)
    # NOTE: accounting mirrors the single-phase ladder; with the
    # two-phase voxel stage the renderer may execute FEWER cells
    # (phase-2 occlusion), so these totals are an upper bound
    skip4 = r._skip4_key(key)
    if skip4:
        c2 = 256
    mat = camera.identity3() if mat is None else np.asarray(mat, np.float32)

    def builder(imms, mat):
        fi = r._bind(r.fi, imms)
        return _workmap3d_impl(fi, mat, size, p0, c1, c2, skip4)

    fn = r._fn("w3", (size, p0, c1, c2, skip4), builder,
               (r._imms_j, jnp.asarray(mat)))
    heat, cnt = fn(r._imms_j, jnp.asarray(mat))
    heat = np.asarray(heat)
    # normals pass: one Deriv eval per pixel of every content 64px tile
    content = np.asarray(depth).reshape(size // 64, 64, size // 64, 64)
    content = content.max(axis=(1, 3)) > 0
    heat = heat + np.repeat(np.repeat(content.astype(np.float32), 64, 0),
                            64, 1)
    a0, a1, a2 = (int(v) for v in np.asarray(cnt))
    L = tape.length
    # stage A: one interval eval per 64^3 cell; each surviving cell's 64
    # children; each surviving 16^3's 64 children; each surviving 4^3's
    # 64 voxels (skip4: 4096 voxels per surviving 16^3 instead)
    lanes_attr = (size // 64) ** 3 + a0 * 64 + (
        a1 * 4096 if skip4 else (a1 * 64 + a2 * 64))
    lanes_exec = (size // 64) ** 3 + p0 * 64 + (
        c1 * 4096 if skip4 else (c1 * 64 + c2 * 64))
    totals = {
        "clauses": L, "skip4": bool(skip4),
        "counts": {"64^3": a0, "16^3": a1, "4^3": a2},
        "caps": {"64^3": p0, "16^3": c1, "4^3": c2, "normals": pn},
        "attributable_evals": lanes_attr * L,
        "executed_evals": lanes_exec * L,
        "padding_evals": (lanes_exec - lanes_attr) * L,
    }
    return heat, totals
