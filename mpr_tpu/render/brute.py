"""Brute-force renderers: full tape at every pixel/voxel, no culling.

Functional parity with ``Context::render2D_brute``
(/root/reference/src/context.cu:1461-1508) and the compiled-kernel baseline
of ``benchmark/brute.cu``.  These exist as (a) the correctness backstop for
the staged pipeline and (b) the benchmark baseline that quantifies how much
interval culling + tape shortening win (mirroring brute.cu's three-way
comparison).

Two strategies:
  * ``render2d_brute`` / ``render3d_brute`` — scan-based data-tape
    interpreter (ops/eval_scan.py).  One executable per tape bucket,
    no per-shape recompile.
  * The ``unrolled=True`` variants trace the tape into straight-line XLA ops
    (the analog of the reference's ``dump_tape`` codegen) — per-shape
    compile, maximal XLA fusion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import eval_scan
from ..ops.tape_data import TapeData
from ..tape.tape import Tape
from . import camera


@partial(jax.jit, static_argnames=("size",))
def _render2d_brute_jit(td: TapeData, mat: jnp.ndarray, z: jnp.ndarray,
                        size: int):
    p = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    fx = p[None, :]
    fy = p[:, None]
    x, y = camera.transform2(mat, fx, fy, jnp)
    x = jnp.broadcast_to(x, (size, size))
    y = jnp.broadcast_to(y, (size, size))
    zz = jnp.broadcast_to(z, (size, size))
    v = eval_scan.eval_f(td, x, y, zz)
    return v < 0.0


def render2d_brute(tape: Tape, mat=None, z: float = 0.0,
                   size: int = 256) -> np.ndarray:
    """Render a bool fill image; row index = y (y-up), col = x."""
    td = TapeData.from_tape(tape)
    mat = camera.identity2() if mat is None else np.asarray(mat, np.float32)
    img = _render2d_brute_jit(td, jnp.asarray(mat), jnp.float32(z), size)
    return np.asarray(img)


@partial(jax.jit, static_argnames=("size",))
def _render3d_brute_jit(td: TapeData, mat: jnp.ndarray, size: int):
    p = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    fx = p[None, :, None]     # (1, W, 1)
    fy = p[:, None, None]     # (H, 1, 1)
    fz = p[None, None, :]     # (1, 1, D)
    x, y, z = camera.transform3(mat, fx, fy, fz, jnp)
    shape = (size, size, size)
    v = eval_scan.eval_f(td,
                         jnp.broadcast_to(x, shape),
                         jnp.broadcast_to(y, shape),
                         jnp.broadcast_to(z, shape))
    # Heightmap composition: highest filled voxel index + 1, 0 if empty
    # (matches the reference's atomicMax depth image,
    # /root/reference/src/context.cu:932-948).
    zidx = jnp.arange(1, size + 1, dtype=jnp.int32)[None, None, :]
    heights = jnp.where(v < 0.0, zidx, 0)
    return jnp.max(heights, axis=2)


def render3d_brute(tape: Tape, mat=None, size: int = 128) -> np.ndarray:
    """Render an int32 heightmap (0 = empty, else z index + 1)."""
    td = TapeData.from_tape(tape)
    mat = camera.identity3() if mat is None else np.asarray(mat, np.float32)
    img = _render3d_brute_jit(td, jnp.asarray(mat), size)
    return np.asarray(img)


# ---------------------------------------------------------------------------
# Unrolled (per-shape compiled) variant — dump_tape analog
# ---------------------------------------------------------------------------

def build_unrolled_f(tape: Tape):
    """Trace the tape into a straight-line jnp function f(x, y, z, imms).

    The XLA analog of the reference's dump_tape codegen
    (/root/reference/benchmark/dump_tape.cpp:43-171): the shape is compiled,
    not interpreted.  ``imms`` defaults to the tape's constants and is
    differentiable.
    """
    ops = tape.ops.tolist()
    outs = tape.outs.tolist()
    lhss = tape.lhss.tolist()
    rhss = tape.rhss.tolist()
    from ..tape.opcodes import Op

    def f(x, y, z=None, imms=None):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        z = jnp.zeros_like(x) if z is None else jnp.asarray(z, jnp.float32)
        imms = tape.imms if imms is None else imms
        slots = {0: jnp.zeros_like(x)}
        sx, sy, sz = tape.axis_slots
        if sx:
            slots[sx] = x
        if sy:
            slots[sy] = y
        if sz:
            slots[sz] = z
        for t in range(tape.length):
            op, o, l, r = ops[t], outs[t], lhss[t], rhss[t]
            a = slots.get(l)
            b = slots.get(r)
            imm = imms[t]
            if op == Op.SQUARE_LHS:
                res = a * a
            elif op == Op.SQRT_LHS:
                res = jnp.sqrt(a)
            elif op == Op.NEG_LHS:
                res = -a
            elif op == Op.SIN_LHS:
                res = jnp.sin(a)
            elif op == Op.COS_LHS:
                res = jnp.cos(a)
            elif op == Op.ASIN_LHS:
                res = jnp.arcsin(a)
            elif op == Op.ACOS_LHS:
                res = jnp.arccos(a)
            elif op == Op.ATAN_LHS:
                res = jnp.arctan(a)
            elif op == Op.EXP_LHS:
                res = jnp.exp(a)
            elif op == Op.ABS_LHS:
                res = jnp.abs(a)
            elif op == Op.LOG_LHS:
                res = jnp.log(a)
            elif op == Op.ADD_LHS_IMM:
                res = a + imm
            elif op == Op.ADD_LHS_RHS:
                res = a + b
            elif op == Op.MUL_LHS_IMM:
                res = a * imm
            elif op == Op.MUL_LHS_RHS:
                res = a * b
            elif op == Op.MIN_LHS_IMM:
                res = jnp.minimum(a, imm)
            elif op == Op.MIN_LHS_RHS:
                res = jnp.minimum(a, b)
            elif op == Op.MAX_LHS_IMM:
                res = jnp.maximum(a, imm)
            elif op == Op.MAX_LHS_RHS:
                res = jnp.maximum(a, b)
            elif op == Op.SUB_LHS_IMM:
                res = a - imm
            elif op == Op.SUB_IMM_RHS:
                res = imm - b
            elif op == Op.SUB_LHS_RHS:
                res = a - b
            elif op == Op.DIV_LHS_IMM:
                res = a / imm
            elif op == Op.DIV_IMM_RHS:
                res = imm / b
            elif op == Op.DIV_LHS_RHS:
                res = a / b
            elif op == Op.COPY_IMM:
                res = jnp.broadcast_to(imm, x.shape)
            elif op == Op.COPY_LHS:
                res = a
            elif op == Op.COPY_RHS:
                res = b
            elif op == Op.HYPOT_LHS_RHS:
                res = jnp.sqrt(a * a + b * b)
            elif op == Op.ADDSQ_LHS_RHS:
                res = a * a + b
            else:
                raise ValueError(f"bad opcode {op}")
            slots[o] = res
        return slots[tape.result_slot]

    return f
