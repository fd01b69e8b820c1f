"""Per-shape unrolled evaluators: the tape traced into straight-line XLA.

The TPU analog of the reference's ``dump_tape`` code generation
(/root/reference/benchmark/dump_tape.cpp:43-171), generalized to three
semantics over the same clause walk:

  * :func:`build_float`    — concrete values (``eval_voxels_f`` semantics,
    /root/reference/src/context.cu:707-964);
  * :func:`build_interval` — interval bounds for tile classification
    (``eval_tiles_i`` semantics, /root/reference/src/context.cu:188-317);
  * :func:`build_deriv`    — forward-mode dual numbers (v, dx, dy, dz)
    (``eval_pixels_d`` / ``mpr::Deriv`` semantics,
    /root/reference/inc/gpu_deriv.hpp).

Why unroll at all: the run-dispatch Pallas interpreter (ops/kernels.py)
costs ~34 ns per clause per 4096-lane plane — the scalar-unit floor for
dynamically-addressed register files.  A statically traced tape lets XLA
keep values in vector registers and fuse the whole chain: measured
1.1-3.9 ns per clause per plane on v5e (docs/perf_notes.md round-2 table),
a 10-30x per-clause win that more than pays for skipping tape shortening
entirely.  The cost is a per-shape XLA compile (seconds to minutes,
amortized by the persistent compilation cache) — the same trade the
reference's compiled-kernel ``brute.cu`` baseline makes, applied to the
full staged pipeline (render/unrolled.py).

Interval semantics come from ops/interval_math.py with ONE documented
divergence: ``mul``/``div`` use min/max over the four endpoint products
instead of the reference's sign-case analysis (fewer XLA ops — compile
time scales with graph size).  0 * inf lanes then produce NaN bounds,
which classify as AMBIGUOUS (NaN compares false against both cull
thresholds) — sound, merely unprunable, and only reachable through
div-by-zero-spanning intervals.  The sin/cos always-[-1,1] quirk
(/root/reference/inc/gpu_interval.hpp:346-380) is preserved unless
``config.tight_sincos`` selects interval_math.i_sin_tight/i_cos_tight.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..tape.opcodes import Op
from ..tape.tape import Tape


class _FastXP:
    """jnp façade whose asin/acos/atan are the Cephes polynomial forms
    (ops/transcendental.py) — the same implementations the Pallas
    interpreter kernels use.  Selected by ``config.fast_transcendentals``
    for the transcendental-bound models (gears: 3.85 vs ~1.2 ns/clause
    with XLA's builtin lowering, docs/perf_notes.md)."""

    def __getattr__(self, k):
        return getattr(jnp, k)


def _trig_fns():
    from .. import config as _config
    if _config.get().fast_transcendentals:
        from . import transcendental as tc
        xp = _FastXP()
        xp.arcsin, xp.arccos, xp.arctan = tc.asin, tc.acos, tc.atan
        return tc.asin, tc.acos, tc.atan, xp
    return jnp.arcsin, jnp.arccos, jnp.arctan, jnp


def _walk(tape: Tape, sem, x, y, z, imms):
    """Shared clause walk: ``sem`` maps opcodes to value-domain callables.

    ``sem.lift(value_array)`` injects raw arrays (axis seeds), ``sem.const``
    injects immediates; slots is a plain dict — dead stores are garbage
    collected by XLA, and slot reuse is just rebinding.
    """
    ops = tape.ops.tolist()
    outs = tape.outs.tolist()
    lhss = tape.lhss.tolist()
    rhss = tape.rhss.tolist()
    slots = {0: sem.zero_like(x)}
    sx, sy, sz = tape.axis_slots
    if sx:
        slots[sx] = sem.seed(x, 0)
    if sy:
        slots[sy] = sem.seed(y, 1)
    if sz:
        slots[sz] = sem.seed(z, 2)
    post = getattr(sem, "post", None)
    for t in range(tape.length):
        op, o, l, r = ops[t], outs[t], lhss[t], rhss[t]
        a = slots.get(l)
        b = slots.get(r)
        v = sem.table[op](a, b, imms[t])
        slots[o] = post(v) if post is not None else v
    return slots[tape.result_slot]


class _FloatSem:
    """Concrete float32 semantics (matches ops/kernels.py float branches)."""

    def zero_like(self, x):
        return jnp.zeros_like(x)

    def seed(self, v, axis):
        return v

    def __init__(self):
        self.op_min = lambda a, b: jnp.minimum(a, b)
        self.op_max = lambda a, b: jnp.maximum(a, b)
        T = {}
        T[int(Op.SQUARE_LHS)] = lambda a, b, i: a * a
        T[int(Op.SQRT_LHS)] = lambda a, b, i: jnp.sqrt(a)
        T[int(Op.NEG_LHS)] = lambda a, b, i: -a
        T[int(Op.SIN_LHS)] = lambda a, b, i: jnp.sin(a)
        T[int(Op.COS_LHS)] = lambda a, b, i: jnp.cos(a)
        asin_f, acos_f, atan_f, _ = _trig_fns()
        T[int(Op.ASIN_LHS)] = lambda a, b, i: asin_f(a)
        T[int(Op.ACOS_LHS)] = lambda a, b, i: acos_f(a)
        T[int(Op.ATAN_LHS)] = lambda a, b, i: atan_f(a)
        T[int(Op.EXP_LHS)] = lambda a, b, i: jnp.exp(a)
        T[int(Op.ABS_LHS)] = lambda a, b, i: jnp.abs(a)
        T[int(Op.LOG_LHS)] = lambda a, b, i: jnp.log(a)
        T[int(Op.ADD_LHS_IMM)] = lambda a, b, i: a + i
        T[int(Op.ADD_LHS_RHS)] = lambda a, b, i: a + b
        T[int(Op.MUL_LHS_IMM)] = lambda a, b, i: a * i
        T[int(Op.MUL_LHS_RHS)] = lambda a, b, i: a * b
        T[int(Op.MIN_LHS_IMM)] = lambda a, b, i: jnp.minimum(a, i)
        T[int(Op.MIN_LHS_RHS)] = lambda a, b, i: jnp.minimum(a, b)
        T[int(Op.MAX_LHS_IMM)] = lambda a, b, i: jnp.maximum(a, i)
        T[int(Op.MAX_LHS_RHS)] = lambda a, b, i: jnp.maximum(a, b)
        T[int(Op.SUB_LHS_IMM)] = lambda a, b, i: a - i
        T[int(Op.SUB_IMM_RHS)] = lambda a, b, i: i - b
        T[int(Op.SUB_LHS_RHS)] = lambda a, b, i: a - b
        T[int(Op.DIV_LHS_IMM)] = lambda a, b, i: a / i
        T[int(Op.DIV_IMM_RHS)] = lambda a, b, i: i / b
        T[int(Op.DIV_LHS_RHS)] = lambda a, b, i: a / b
        T[int(Op.COPY_IMM)] = lambda a, b, i: jnp.zeros_like(a) + i
        T[int(Op.COPY_LHS)] = lambda a, b, i: a
        T[int(Op.COPY_RHS)] = lambda a, b, i: b
        T[int(Op.HYPOT_LHS_RHS)] = lambda a, b, i: jnp.sqrt(a * a + b * b)
        T[int(Op.ADDSQ_LHS_RHS)] = lambda a, b, i: a * a + b
        self.table = T


class _IntervalSem:
    """Interval semantics over (lo, hi) pairs (see module doc divergences)."""

    def zero_like(self, x):
        z = jnp.zeros_like(x[0])
        return (z, z)

    def seed(self, v, axis):
        return v  # already a (lo, hi) pair

    def __init__(self):
        from . import interval_math as im

        def minmax4(a, b, red):
            p1, p2, p3, p4 = a[0] * b[0], a[0] * b[1], a[1] * b[0], a[1] * b[1]
            return red(red(p1, p2), red(p3, p4))

        def mul(a, b, i):
            return (minmax4(a, b, jnp.minimum), minmax4(a, b, jnp.maximum))

        def mul_imm(a, b, i):
            if isinstance(i, float):   # static imm: pick the branch now
                if i >= 0:
                    return (a[0] * i, a[1] * i)
                return (a[1] * i, a[0] * i)
            p, q = a[0] * i, a[1] * i
            return (jnp.minimum(p, q), jnp.maximum(p, q))

        def div(a, b, i):
            spans = (b[0] <= 0.0) & (b[1] >= 0.0)
            sb = (jnp.where(spans, -1.0, b[0]), jnp.where(spans, 1.0, b[1]))
            inv = (1.0 / sb[1], 1.0 / sb[0])
            lo, hi = mul(a, inv, None)
            inf = jnp.float32(jnp.inf)
            return (jnp.where(spans, -inf, lo), jnp.where(spans, inf, hi))

        def div_imm(a, b, i):
            if isinstance(i, float):
                if i > 0:
                    return (a[0] / i, a[1] / i)
                if i < 0:
                    return (a[1] / i, a[0] / i)
                inf = jnp.float32(jnp.inf)
                return (jnp.full_like(a[0], -inf), jnp.full_like(a[1], inf))
            p, q = a[0] / i, a[1] / i
            return (jnp.minimum(p, q), jnp.maximum(p, q))

        def div_imm_rhs(a, b, i):
            c = jnp.full_like(b[0], i)
            return div((c, c), b, None)

        def square(a, b, i):
            return im.i_square(jnp, a[0], a[1])

        def sqrt_(a, b, i):
            return im.i_sqrt(jnp, a[0], a[1])

        def abs_(a, b, i):
            return im.i_abs(jnp, a[0], a[1])

        def log_(a, b, i):
            return im.i_log(jnp, a[0], a[1])

        def sin_(a, b, i):
            from .. import config as _config
            if _config.get().tight_sincos:
                return im.i_sin_tight(jnp, a[0], a[1])
            return (jnp.full_like(a[0], -1.0), jnp.full_like(a[1], 1.0))

        def cos_(a, b, i):
            from .. import config as _config
            if _config.get().tight_sincos:
                return im.i_cos_tight(jnp, a[0], a[1])
            return (jnp.full_like(a[0], -1.0), jnp.full_like(a[1], 1.0))

        _, _, atan_f, xp = _trig_fns()

        def asin_(a, b, i):
            return im.i_asin(xp, a[0], a[1])

        def acos_(a, b, i):
            return im.i_acos(xp, a[0], a[1])

        def hypot_(a, b, i):
            sa, sb_ = square(a, None, None), square(b, None, None)
            return sqrt_((sa[0] + sb_[0], sa[1] + sb_[1]), None, None)

        def addsq_(a, b, i):
            sa = square(a, None, None)
            return (sa[0] + b[0], sa[1] + b[1])

        self.op_min = lambda a, b: (jnp.minimum(a[0], b[0]),
                                    jnp.minimum(a[1], b[1]))
        self.op_max = lambda a, b: (jnp.maximum(a[0], b[0]),
                                    jnp.maximum(a[1], b[1]))
        T = {}
        T[int(Op.SQUARE_LHS)] = square
        T[int(Op.SQRT_LHS)] = sqrt_
        T[int(Op.NEG_LHS)] = lambda a, b, i: (-a[1], -a[0])
        T[int(Op.SIN_LHS)] = sin_
        T[int(Op.COS_LHS)] = cos_
        T[int(Op.ASIN_LHS)] = asin_
        T[int(Op.ACOS_LHS)] = acos_
        T[int(Op.ATAN_LHS)] = lambda a, b, i: (atan_f(a[0]),
                                               atan_f(a[1]))
        T[int(Op.EXP_LHS)] = lambda a, b, i: (jnp.exp(a[0]), jnp.exp(a[1]))
        T[int(Op.ABS_LHS)] = abs_
        T[int(Op.LOG_LHS)] = log_
        T[int(Op.ADD_LHS_IMM)] = lambda a, b, i: (a[0] + i, a[1] + i)
        T[int(Op.ADD_LHS_RHS)] = lambda a, b, i: (a[0] + b[0], a[1] + b[1])
        T[int(Op.MUL_LHS_IMM)] = mul_imm
        T[int(Op.MUL_LHS_RHS)] = mul
        T[int(Op.MIN_LHS_IMM)] = lambda a, b, i: (jnp.minimum(a[0], i),
                                                  jnp.minimum(a[1], i))
        T[int(Op.MAX_LHS_IMM)] = lambda a, b, i: (jnp.maximum(a[0], i),
                                                  jnp.maximum(a[1], i))
        T[int(Op.SUB_LHS_IMM)] = lambda a, b, i: (a[0] - i, a[1] - i)
        T[int(Op.SUB_IMM_RHS)] = lambda a, b, i: (i - b[1], i - b[0])
        T[int(Op.SUB_LHS_RHS)] = lambda a, b, i: (a[0] - b[1], a[1] - b[0])
        T[int(Op.DIV_LHS_IMM)] = div_imm
        T[int(Op.DIV_IMM_RHS)] = div_imm_rhs
        T[int(Op.DIV_LHS_RHS)] = div
        T[int(Op.COPY_IMM)] = lambda a, b, i: (jnp.zeros_like(a[0]) + i,
                                               jnp.zeros_like(a[1]) + i)
        T[int(Op.COPY_LHS)] = lambda a, b, i: a
        T[int(Op.COPY_RHS)] = lambda a, b, i: b
        T[int(Op.HYPOT_LHS_RHS)] = hypot_
        T[int(Op.ADDSQ_LHS_RHS)] = addsq_
        # min/max over (lo, hi) pairs — lambdas above take (a, b) only
        T[int(Op.MIN_LHS_RHS)] = lambda a, b, i: self.op_min(a, b)
        T[int(Op.MAX_LHS_RHS)] = lambda a, b, i: self.op_max(a, b)
        self.table = T
        # config.widen_intervals: conservative per-op outward widening
        # (interval_math.widen), applied by _walk's post hook.  Read at
        # build time — the unrolled skey (render/unrolled.py) includes
        # the flag, so flipping it recompiles rather than silently
        # reusing an unwidened executable.
        from .. import config as _config
        if _config.get().widen_intervals:
            self.post = lambda v: im.widen(jnp, v[0], v[1])


class _DerivSem:
    """Forward-mode dual numbers (v, dx, dy, dz); min/max pick the winning
    branch discontinuously (/root/reference/inc/gpu_deriv.hpp:106-130)."""

    def zero_like(self, x):
        z = jnp.zeros_like(x)
        return (z, z, z, z)

    def seed(self, v, axis):
        z = jnp.zeros_like(v)
        o = jnp.ones_like(v)
        d = [z, z, z]
        d[axis] = o
        return (v, d[0], d[1], d[2])

    def __init__(self):
        def sel(c, a, b):
            return tuple(jnp.where(c, x, y) for x, y in zip(a, b))

        def d0(v, like):
            z = like[1] * 0.0
            return (jnp.zeros_like(like[0]) + v, z, z, z)

        def lift(vf, df):
            def f(a, b, i):
                c = df(a[0])
                return (vf(a[0]), c * a[1], c * a[2], c * a[3])
            return f

        self.op_min = lambda a, b: sel(a[0] < b[0], a, b)
        self.op_max = lambda a, b: sel(a[0] > b[0], a, b)
        T = {}
        T[int(Op.SQUARE_LHS)] = lambda a, b, i: (
            a[0] * a[0], 2 * a[0] * a[1], 2 * a[0] * a[2], 2 * a[0] * a[3])
        asin_f, acos_f, atan_f, _ = _trig_fns()
        T[int(Op.SQRT_LHS)] = lift(jnp.sqrt, lambda v: 0.5 / jnp.sqrt(v))
        T[int(Op.NEG_LHS)] = lambda a, b, i: (-a[0], -a[1], -a[2], -a[3])
        T[int(Op.SIN_LHS)] = lift(jnp.sin, jnp.cos)
        T[int(Op.COS_LHS)] = lift(jnp.cos, lambda v: -jnp.sin(v))
        T[int(Op.ASIN_LHS)] = lift(asin_f,
                                   lambda v: 1.0 / jnp.sqrt(1.0 - v * v))
        T[int(Op.ACOS_LHS)] = lift(acos_f,
                                   lambda v: -1.0 / jnp.sqrt(1.0 - v * v))
        T[int(Op.ATAN_LHS)] = lift(atan_f, lambda v: 1.0 / (1.0 + v * v))
        T[int(Op.EXP_LHS)] = lift(jnp.exp, jnp.exp)
        def abs_(a, b, i):
            # reference convention: d|x| = (x < 0 ? -1 : 1) * dx, never 0
            # (matches ops/kernels3d.py deriv abs_)
            s = jnp.where(a[0] < 0.0, -1.0, 1.0)
            return (jnp.abs(a[0]), s * a[1], s * a[2], s * a[3])
        T[int(Op.ABS_LHS)] = abs_
        T[int(Op.LOG_LHS)] = lift(jnp.log, lambda v: 1.0 / v)
        T[int(Op.ADD_LHS_IMM)] = lambda a, b, i: (a[0] + i, a[1], a[2], a[3])
        T[int(Op.ADD_LHS_RHS)] = lambda a, b, i: tuple(
            x + y for x, y in zip(a, b))
        T[int(Op.MUL_LHS_IMM)] = lambda a, b, i: tuple(x * i for x in a)

        def mul(a, b, i):
            return (a[0] * b[0], a[0] * b[1] + b[0] * a[1],
                    a[0] * b[2] + b[0] * a[2], a[0] * b[3] + b[0] * a[3])
        T[int(Op.MUL_LHS_RHS)] = mul
        T[int(Op.MIN_LHS_IMM)] = lambda a, b, i: sel(
            a[0] < i, a, d0(i, a))
        T[int(Op.MIN_LHS_RHS)] = lambda a, b, i: self.op_min(a, b)
        T[int(Op.MAX_LHS_IMM)] = lambda a, b, i: sel(
            a[0] > i, a, d0(i, a))
        T[int(Op.MAX_LHS_RHS)] = lambda a, b, i: self.op_max(a, b)
        T[int(Op.SUB_LHS_IMM)] = lambda a, b, i: (a[0] - i, a[1], a[2], a[3])
        T[int(Op.SUB_IMM_RHS)] = lambda a, b, i: (
            i - b[0], -b[1], -b[2], -b[3])
        T[int(Op.SUB_LHS_RHS)] = lambda a, b, i: tuple(
            x - y for x, y in zip(a, b))
        T[int(Op.DIV_LHS_IMM)] = lambda a, b, i: tuple(x / i for x in a)

        def div_imm_rhs(a, b, i):
            v = i / b[0]
            c = -v / b[0]
            return (v, c * b[1], c * b[2], c * b[3])
        T[int(Op.DIV_IMM_RHS)] = div_imm_rhs

        def div(a, b, i):
            inv = 1.0 / b[0]
            v = a[0] * inv
            return (v, (a[1] - v * b[1]) * inv, (a[2] - v * b[2]) * inv,
                    (a[3] - v * b[3]) * inv)
        T[int(Op.DIV_LHS_RHS)] = div
        T[int(Op.COPY_IMM)] = lambda a, b, i: d0(i, a)
        T[int(Op.COPY_LHS)] = lambda a, b, i: a
        T[int(Op.COPY_RHS)] = lambda a, b, i: b

        def hypot_(a, b, i):
            v = jnp.sqrt(a[0] * a[0] + b[0] * b[0])
            inv = 1.0 / v
            return (v, (a[0] * a[1] + b[0] * b[1]) * inv,
                    (a[0] * a[2] + b[0] * b[2]) * inv,
                    (a[0] * a[3] + b[0] * b[3]) * inv)
        T[int(Op.HYPOT_LHS_RHS)] = hypot_
        T[int(Op.ADDSQ_LHS_RHS)] = lambda a, b, i: (
            a[0] * a[0] + b[0], 2 * a[0] * a[1] + b[1],
            2 * a[0] * a[2] + b[2], 2 * a[0] * a[3] + b[3])
        self.table = T


def _imms_of(tape: Tape, imms) -> list:
    if imms is None:
        # bake as Python floats: XLA constant-folds and CSEs them
        return [float(v) for v in tape.imms]
    return [imms[t] for t in range(tape.length)]


def build_float(tape: Tape, take_imms: bool = False) -> Callable:
    """f(x, y, z=None[, imms]) -> f32 values.  With ``take_imms`` the
    immediates are a traced f32 vector (the differentiable parameters)."""
    sem = _FloatSem()

    def f(x, y, z=None, imms=None):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        z = jnp.zeros_like(x) if z is None else jnp.asarray(z, jnp.float32)
        iv = _imms_of(tape, imms if take_imms else None)
        return _walk(tape, sem, x, y, z, iv)
    return f


def build_interval(tape: Tape, take_imms: bool = False) -> Callable:
    """fi(xl, xh, yl, yh, zl, zh[, imms]) -> (lo, hi)."""
    sem = _IntervalSem()

    def f(xl, xh, yl, yh, zl, zh, imms=None):
        iv = _imms_of(tape, imms if take_imms else None)
        return _walk(tape, sem, (xl, xh), (yl, yh), (zl, zh), iv)
    return f


def build_deriv(tape: Tape, take_imms: bool = False) -> Callable:
    """fd(x, y, z[, imms]) -> (v, dv/dx, dv/dy, dv/dz) with unit seeds on
    the (transformed) axis inputs, matching the reference's Deriv seeding
    (/root/reference/src/context.cu:1009-1029)."""
    sem = _DerivSem()

    def f(x, y, z=None, imms=None):
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        z = jnp.zeros_like(x) if z is None else jnp.asarray(z, jnp.float32)
        iv = _imms_of(tape, imms if take_imms else None)
        return _walk(tape, sem, x, y, z, iv)
    return f
