"""Pallas TPU kernels for the 3D pipeline: voxel evaluation and normals.

Two kernels complement ops/kernels.py for the 3D render path
(docs/perf_notes.md "3D pipeline design"):

  * :func:`voxel_eval_3d` — the ``eval_voxels_f<3>`` analog
    (/root/reference/src/context.cu:707-762, 932-948): each grid instance
    evaluates CPI ambiguous 16³ cells, 4096 voxels per cell (one full VPU
    lane plane), with the cell's shortened tape in SMEM.  Voxel world
    coordinates are computed IN-KERNEL from the cell id + the camera
    matrix (16 f32 scalars in SMEM) — precomputing them in XLA would
    materialize a >200 MB HBM array.

  * :func:`deriv_eval_3d` — the ``eval_pixels_d`` analog
    (/root/reference/src/context.cu:978-1132): forward-mode dual numbers
    (value + d/dx,d/dy,d/dz — the reference's ``Deriv`` float4,
    /root/reference/inc/gpu_deriv.hpp) over a 4-plane register file; one
    instance per 64-px screen tile, 4096 pixel lanes, z sampled one voxel
    in front of the depth surface (:1001-1005); tape = the tile's
    z-COLUMN-shortened tape (valid at every depth of the column — the TPU
    replacement for the reference's per-pixel tile-hierarchy descent,
    :1034-1066).

Both use run-level dispatch over branch-id run headers (kernel C output)
with a full-tape fallback when a tile's shortened tape overflowed its
capacity (the reference's keep-the-parent-tape degradation,
/root/reference/src/context.cu:336-347).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import _float_branch_list, _on_cpu
from ..tape.opcodes import Op


def _iota_plane(shape):
    row = lax.broadcasted_iota(jnp.int32, shape, 0)
    col = lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * shape[1] + col


def _mat4_apply(matf_ref, wx, wy, wz):
    """Projective mat4 transform of coordinate vectors with scalar matrix
    entries (matches /root/reference/src/context.cu:739-747)."""
    def m(r, c):
        return matf_ref[r * 4 + c]
    w = m(3, 0) * wx + m(3, 1) * wy + m(3, 2) * wz + m(3, 3)
    x = (m(0, 0) * wx + m(0, 1) * wy + m(0, 2) * wz + m(0, 3)) / w
    y = (m(1, 0) * wx + m(1, 1) * wy + m(1, 2) * wz + m(1, 3)) / w
    z = (m(2, 0) * wx + m(2, 1) * wy + m(2, 2) * wz + m(2, 3)) / w
    return x, y, z


def _run_interp(branch_ops, regs_set, regs_get, run_src, w_src, i_src,
                n_runs, branches):
    """Shared run-dispatch interpreter loop (see kernels.py kernel B v2)."""
    def outer(r, t0):
        hdr = run_src(r)
        bid = hdr & 0xFF
        cnt = hdr >> 8

        def mk_branch(o):
            f = branches[o]

            def br(t0, cnt):
                def inner(k, _):
                    t = t0 + k
                    w = w_src(t)
                    out = (w >> 8) & 0xFF
                    lhs = (w >> 16) & 0xFF
                    rhs = (w >> 24) & 0xFF
                    regs_set(out, f(regs_get(lhs), regs_get(rhs), i_src(t)))
                    return 0
                lax.fori_loop(0, cnt, inner, 0)
                return 0
            return br

        def nop_branch(t0, cnt):
            return 0

        table = [nop_branch] + [mk_branch(o) for o in branch_ops]
        lax.switch(bid, table, t0, cnt)
        return t0 + cnt
    lax.fori_loop(0, n_runs, outer, jnp.int32(0))


# ---------------------------------------------------------------------------
# Voxel evaluation (3D leaf stage)
# ---------------------------------------------------------------------------

def _make_voxel_kernel(branch_ops, s_cap, cpi, n_side, n_rows):
    all_br = _float_branch_list()
    size = n_side * 64  # voxels per axis (full image, not the slab)

    def kernel(nmeta_ref,   # (8,) i32 [n_amb1, S, res, sx, sy, sz,
               #            n_runs_full, row0]
               order_ref,   # (C_CAP,) i32: child slots, amb-first
               order0_ref,  # (P0_CAP,) i32: parent TILE id per parent slot
               matf_ref,    # (16,) f32 mat4 row-major
               words_ref, imms_ref, runsF_ref,   # full tape (fallback)
               tw_ref,      # (1, cpi, W) i32 SMEM child tapes (pre-ordered)
               ti_ref,      # (1, cpi, W) f32
               runs_ref,    # (1, cpi, W) i32
               gmeta_ref,   # (1, cpi, 8) i32
               vals_ref,    # (1, cpi, 8, 512) f32
               regs_ref):   # (s_cap, 8, 512) f32
        g = pl.program_id(0)
        n_amb1 = nmeta_ref[0]
        res = nmeta_ref[2]
        sx, sy, sz = nmeta_ref[3], nmeta_ref[4], nmeta_ref[5]
        row0 = nmeta_ref[7]

        l = _iota_plane((8, 512))
        vz = (l // 256).astype(jnp.float32)
        vy = ((l // 16) % 16).astype(jnp.float32)
        vx = (l % 16).astype(jnp.float32)

        for k in range(cpi):
            slot = g * cpi + k

            @pl.when(slot < n_amb1)
            def _(k=k, slot=slot):
                child = order_ref[slot]
                pslot = child // 64
                c = child % 64
                p = order0_ref[pslot]
                # slab-local parent id p = (tz * n_rows + ty_l) * n + tx
                tx = p % n_side
                ty = row0 + (p // n_side) % n_rows
                tz = p // (n_side * n_rows)
                # child c = (czi * 4 + cyi) * 4 + cxi, 16^3 voxels each
                cxi = c % 4
                cyi = (c // 4) % 4
                czi = c // 16
                bx = (tx * 64 + cxi * 16).astype(jnp.float32)
                by = (ty * 64 + cyi * 16).astype(jnp.float32)
                bz = (tz * 64 + czi * 16).astype(jnp.float32)
                wx = (bx + vx + 0.5) / size * 2.0 - 1.0
                wy = (by + vy + 0.5) / size * 2.0 - 1.0
                wz = (bz + vz + 0.5) / size * 2.0 - 1.0
                x, y, z = _mat4_apply(matf_ref, wx, wy, wz)

                regs_ref[pl.ds(sx, 1)] = x[None]
                regs_ref[pl.ds(sy, 1)] = y[None]
                regs_ref[pl.ds(sz, 1)] = z[None]
                regs_ref[0] = jnp.zeros_like(x)

                def regs_set(out, v):
                    regs_ref[pl.ds(out, 1)] = v[None]

                def regs_get(i):
                    return regs_ref[pl.ds(i, 1)][0]

                overflow = gmeta_ref[0, k, 2]

                @pl.when(overflow == 0)
                def _():
                    _run_interp(branch_ops, regs_set, regs_get,
                                lambda r: runs_ref[0, k, r],
                                lambda t: tw_ref[0, k, t],
                                lambda t: ti_ref[0, k, t],
                                gmeta_ref[0, k, 1], all_br)

                @pl.when(overflow != 0)
                def _():
                    _run_interp(branch_ops, regs_set, regs_get,
                                lambda r: runsF_ref[r],
                                lambda t: words_ref[t],
                                lambda t: imms_ref[t],
                                nmeta_ref[6], all_br)

                vals_ref[0, k] = regs_ref[pl.ds(res, 1)][0]

    return kernel


def voxel_eval_3d(nmeta, order, order0, matf, words, imms, runs_full,
                  branch_ops, tw, ti, runs, gmeta,
                  n_side: int, n_rows: int, s_cap: int, cpi: int = 4):
    """Evaluate CPI ambiguous 16³ cells per instance, 4096 voxels each.

    tw/ti/runs/gmeta: per-cell tapes from compact_bitshift_batched, rows in
    ``order`` order (identity indexing).  Returns vals (C_CAP, 4096) f32
    with lane layout l = vz*256 + vy*16 + vx.
    """
    gcap, cap = tw.shape
    assert gcap % cpi == 0
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(gcap // cpi,),
        in_specs=[
            pl.BlockSpec((1, cpi, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cpi, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cpi, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cpi, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, cpi, 8, 512), lambda g, *_: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_cap, 8, 512), jnp.float32)],
    )
    vals = pl.pallas_call(
        _make_voxel_kernel(branch_ops, s_cap, cpi, n_side, n_rows),
        out_shape=jax.ShapeDtypeStruct((gcap // cpi, cpi, 8, 512),
                                       jnp.float32),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(nmeta, order, order0, matf, words, imms, runs_full,
      tw.reshape(gcap // cpi, cpi, cap), ti.reshape(gcap // cpi, cpi, cap),
      runs.reshape(gcap // cpi, cpi, cap),
      gmeta.reshape(gcap // cpi, cpi, 8))
    return vals.reshape(gcap, 4096)


# ---------------------------------------------------------------------------
# Normals: forward-mode dual-number evaluation
# ---------------------------------------------------------------------------

def _deriv_branch_list():
    """Branches over Deriv 4-tuples (v, dx, dy, dz): (a, b, imm) -> tuple.

    Dual-number rules matching /root/reference/inc/gpu_deriv.hpp; min/max
    pick the winning branch's derivative discontinuously (:106-130)."""
    def d0(v, like):
        z = like[1] * 0.0
        return (v, z, z, z)

    def lift(val_f, dcoef_f):
        """Unary: value = val_f(a.v), derivs scaled by dcoef_f(a.v)."""
        def f(a, b, imm):
            c = dcoef_f(a[0])
            return (val_f(a[0]), c * a[1], c * a[2], c * a[3])
        return f

    def select(c, a, b):
        return tuple(jnp.where(c, x, y) for x, y in zip(a, b))

    def add(a, b, imm):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2], a[3] + b[3])

    def add_imm(a, b, imm):
        return (a[0] + imm, a[1], a[2], a[3])

    def mul(a, b, imm):
        return (a[0] * b[0],
                a[0] * b[1] + b[0] * a[1],
                a[0] * b[2] + b[0] * a[2],
                a[0] * b[3] + b[0] * a[3])

    def mul_imm(a, b, imm):
        return (a[0] * imm, a[1] * imm, a[2] * imm, a[3] * imm)

    def sub(a, b, imm):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2], a[3] - b[3])

    def sub_imm(a, b, imm):
        return (a[0] - imm, a[1], a[2], a[3])

    def sub_imm_rhs(a, b, imm):
        return (imm - b[0], -b[1], -b[2], -b[3])

    def div(a, b, imm):
        inv = 1.0 / b[0]
        v = a[0] * inv
        return (v, (a[1] - v * b[1]) * inv, (a[2] - v * b[2]) * inv,
                (a[3] - v * b[3]) * inv)

    def div_imm(a, b, imm):
        inv = 1.0 / imm
        return (a[0] * inv, a[1] * inv, a[2] * inv, a[3] * inv)

    def div_imm_rhs(a, b, imm):
        v = imm / b[0]
        c = -v / b[0]
        return (v, c * b[1], c * b[2], c * b[3])

    def min_rhs(a, b, imm):
        return select(a[0] < b[0], a, b)

    def min_imm(a, b, imm):
        return select(a[0] < imm, a, d0(jnp.full_like(a[0], imm), a))

    def max_rhs(a, b, imm):
        return select(a[0] > b[0], a, b)

    def max_imm(a, b, imm):
        return select(a[0] > imm, a, d0(jnp.full_like(a[0], imm), a))

    def square(a, b, imm):
        c = 2.0 * a[0]
        return (a[0] * a[0], c * a[1], c * a[2], c * a[3])

    def neg(a, b, imm):
        return (-a[0], -a[1], -a[2], -a[3])

    def abs_(a, b, imm):
        s = jnp.where(a[0] < 0.0, -1.0, 1.0)
        return (jnp.abs(a[0]), s * a[1], s * a[2], s * a[3])

    def hypot_(a, b, imm):
        v = jnp.sqrt(a[0] * a[0] + b[0] * b[0])
        inv = 1.0 / v
        return (v, (a[0] * a[1] + b[0] * b[1]) * inv,
                (a[0] * a[2] + b[0] * b[2]) * inv,
                (a[0] * a[3] + b[0] * b[3]) * inv)

    def addsq_(a, b, imm):
        c = 2.0 * a[0]
        return (a[0] * a[0] + b[0], c * a[1] + b[1], c * a[2] + b[2],
                c * a[3] + b[3])

    from . import transcendental as tc
    branches = [None] * 32
    branches[int(Op.INVALID)] = lambda a, b, imm: d0(a[0] * 0.0, a)
    branches[int(Op.JUMP)] = branches[int(Op.INVALID)]
    branches[int(Op.SQUARE_LHS)] = square
    branches[int(Op.SQRT_LHS)] = lift(
        jnp.sqrt, lambda v: 0.5 / jnp.sqrt(v))
    branches[int(Op.NEG_LHS)] = neg
    branches[int(Op.SIN_LHS)] = lift(jnp.sin, jnp.cos)
    branches[int(Op.COS_LHS)] = lift(jnp.cos, lambda v: -jnp.sin(v))
    branches[int(Op.ASIN_LHS)] = lift(
        tc.asin, lambda v: 1.0 / jnp.sqrt(1.0 - v * v))
    branches[int(Op.ACOS_LHS)] = lift(
        tc.acos, lambda v: -1.0 / jnp.sqrt(1.0 - v * v))
    branches[int(Op.ATAN_LHS)] = lift(
        tc.atan, lambda v: 1.0 / (1.0 + v * v))
    branches[int(Op.EXP_LHS)] = lift(jnp.exp, jnp.exp)
    branches[int(Op.ABS_LHS)] = abs_
    branches[int(Op.LOG_LHS)] = lift(jnp.log, lambda v: 1.0 / v)
    branches[int(Op.ADD_LHS_IMM)] = add_imm
    branches[int(Op.ADD_LHS_RHS)] = add
    branches[int(Op.MUL_LHS_IMM)] = mul_imm
    branches[int(Op.MUL_LHS_RHS)] = mul
    branches[int(Op.MIN_LHS_IMM)] = min_imm
    branches[int(Op.MIN_LHS_RHS)] = min_rhs
    branches[int(Op.MAX_LHS_IMM)] = max_imm
    branches[int(Op.MAX_LHS_RHS)] = max_rhs
    branches[int(Op.SUB_LHS_IMM)] = sub_imm
    branches[int(Op.SUB_IMM_RHS)] = sub_imm_rhs
    branches[int(Op.SUB_LHS_RHS)] = sub
    branches[int(Op.DIV_LHS_IMM)] = div_imm
    branches[int(Op.DIV_IMM_RHS)] = div_imm_rhs
    branches[int(Op.DIV_LHS_RHS)] = div
    branches[int(Op.COPY_IMM)] = lambda a, b, imm: d0(
        jnp.full_like(a[0], imm), a)
    branches[int(Op.COPY_LHS)] = lambda a, b, imm: a
    branches[int(Op.COPY_RHS)] = lambda a, b, imm: b
    branches[int(Op.HYPOT_LHS_RHS)] = hypot_
    branches[int(Op.ADDSQ_LHS_RHS)] = addsq_
    return branches


def _make_deriv_kernel(branch_ops, s_cap, n_side, n_rows):
    all_br = _deriv_branch_list()
    size = n_side * 64

    def kernel(nmeta_ref,   # (8,) i32 [n_tiles_active, S, res, sx, sy, sz,
               #            n_runs_full, row0]
               order_ref,   # (n2,) i32 xy tile ids, content-first
               matf_ref,    # (16,) f32
               words_ref, imms_ref, runsF_ref,
               tw_ref, ti_ref, runs_ref, gmeta_ref,   # column tapes (1,1,W)
               depth_ref,   # (1, 8, 512) i32 per-tile depth block
               out_ref,     # (1, 4, 8, 512) f32: v, dx, dy, dz
               regs_ref):   # (s_cap, 4, 8, 512) f32
        g = pl.program_id(0)
        n_act = nmeta_ref[0]
        res = nmeta_ref[2]
        sx, sy, sz = nmeta_ref[3], nmeta_ref[4], nmeta_ref[5]

        @pl.when(g < n_act)
        def _():
            t = order_ref[g]           # slab-local xy tile id
            tx = t % n_side
            ty = nmeta_ref[7] + t // n_side
            l = _iota_plane((8, 512))
            px = (l % 64).astype(jnp.float32)
            py = (l // 64).astype(jnp.float32)
            d = depth_ref[0]
            # sample one voxel in FRONT of the surface: depth stores top
            # filled voxel index + 1, so voxel index d is the first empty
            # (/root/reference/src/context.cu:1001-1005)
            zi = jnp.minimum(d, size - 1).astype(jnp.float32)
            wx = (tx * 64 + px + 0.5) / size * 2.0 - 1.0
            wy = (ty * 64 + py + 0.5) / size * 2.0 - 1.0
            wz = (zi + 0.5) / size * 2.0 - 1.0
            x, y, z = _mat4_apply(matf_ref, wx, wy, wz)

            one = jnp.ones_like(x)
            zero = jnp.zeros_like(x)
            # seeds: transformed coords with unit world derivatives
            # (/root/reference/src/context.cu:1009-1029)
            regs_ref[pl.ds(sx, 1), 0] = x[None]
            regs_ref[pl.ds(sx, 1), 1] = one[None]
            regs_ref[pl.ds(sx, 1), 2] = zero[None]
            regs_ref[pl.ds(sx, 1), 3] = zero[None]
            regs_ref[pl.ds(sy, 1), 0] = y[None]
            regs_ref[pl.ds(sy, 1), 1] = zero[None]
            regs_ref[pl.ds(sy, 1), 2] = one[None]
            regs_ref[pl.ds(sy, 1), 3] = zero[None]
            regs_ref[pl.ds(sz, 1), 0] = z[None]
            regs_ref[pl.ds(sz, 1), 1] = zero[None]
            regs_ref[pl.ds(sz, 1), 2] = zero[None]
            regs_ref[pl.ds(sz, 1), 3] = one[None]
            regs_ref[0, 0] = zero
            regs_ref[0, 1] = zero
            regs_ref[0, 2] = zero
            regs_ref[0, 3] = zero

            def regs_set(out, v4):
                regs_ref[pl.ds(out, 1), 0] = v4[0][None]
                regs_ref[pl.ds(out, 1), 1] = v4[1][None]
                regs_ref[pl.ds(out, 1), 2] = v4[2][None]
                regs_ref[pl.ds(out, 1), 3] = v4[3][None]

            def regs_get(i):
                r = regs_ref[pl.ds(i, 1)][0]
                return (r[0], r[1], r[2], r[3])

            overflow = gmeta_ref[0, 0, 2]

            @pl.when(overflow == 0)
            def _():
                _run_interp(branch_ops, regs_set, regs_get,
                            lambda r: runs_ref[0, 0, r],
                            lambda t_: tw_ref[0, 0, t_],
                            lambda t_: ti_ref[0, 0, t_],
                            gmeta_ref[0, 0, 1], all_br)

            @pl.when(overflow != 0)
            def _():
                _run_interp(branch_ops, regs_set, regs_get,
                            lambda r: runsF_ref[r],
                            lambda t_: words_ref[t_],
                            lambda t_: imms_ref[t_],
                            nmeta_ref[6], all_br)

            out_ref[0] = regs_ref[pl.ds(res, 1)][0]

    return kernel


def deriv_eval_3d(nmeta, order, matf, words, imms, runs_full, branch_ops,
                  tw, ti, runs, gmeta, depth_blocks,
                  n_side: int, n_rows: int, s_cap: int):
    """Normals pass: one instance per content-bearing 64-px screen tile.

    depth_blocks: (n², 4096) i32, pixel-major l = py*64 + px, indexed by
    TILE id (order indirection applied via index_map).  Returns
    (n², 4, 4096) f32: value + gradient per pixel, rows in ORDER order.
    """
    gcap, cap = tw.shape
    n2 = depth_blocks.shape[0]
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(gcap,),
        in_specs=[
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 512),
                         lambda g, nmeta, order, *_: (order[g], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 8, 512), lambda g, *_: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_cap, 4, 8, 512), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_deriv_kernel(branch_ops, s_cap, n_side, n_rows),
        out_shape=jax.ShapeDtypeStruct((gcap, 4, 8, 512), jnp.float32),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(nmeta, order, matf, words, imms, runs_full,
      tw[:, None, :], ti[:, None, :], runs[:, None, :], gmeta[:, None, :],
      depth_blocks.reshape(n2, 8, 512))
    return out.reshape(gcap, 4, 4096)
