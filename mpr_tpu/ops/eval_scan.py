"""Portable jittable tape interpreters (pure jax.numpy, scan-based).

The tape is *data* here: one compiled executable serves every shape whose
tape fits the same padded bucket (no per-shape recompilation, unlike an
unrolled trace).  Each scan step dispatches one clause with ``lax.switch``
over whole lane vectors — the XLA analog of the reference's SIMT interpreter
loop (``/root/reference/src/context.cu:223-287``) with lanes playing the role
of threads.

These evaluators run everywhere (CPU tests, TPU) and are fully
differentiable: ``jax.grad`` through :func:`eval_f` w.r.t. ``td.imms`` yields
d(result)/d(tape constants) — the differentiable-renderer path the CUDA
reference lacks.  The Pallas kernels in ``ops/kernels.py`` are the
performance path; these are the semantics reference for them on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import interval_math as im
from .tape_data import TapeData, unpack_fields


# ---------------------------------------------------------------------------
# Float evaluation
# ---------------------------------------------------------------------------

def _float_branches():
    """Branch table indexed by Op value; each takes (a, b, imm) lane vectors."""
    def nop(a, b, imm):
        return a * 0.0  # INVALID/JUMP padding: writes 0 to slot `out` (slot 0)

    return [
        nop,                                        # 0 INVALID
        nop,                                        # 1 JUMP
        lambda a, b, imm: a * a,                    # SQUARE_LHS
        lambda a, b, imm: jnp.sqrt(a),              # SQRT_LHS
        lambda a, b, imm: -a,                       # NEG_LHS
        lambda a, b, imm: jnp.sin(a),               # SIN_LHS
        lambda a, b, imm: jnp.cos(a),               # COS_LHS
        lambda a, b, imm: jnp.arcsin(a),            # ASIN_LHS
        lambda a, b, imm: jnp.arccos(a),            # ACOS_LHS
        lambda a, b, imm: jnp.arctan(a),            # ATAN_LHS
        lambda a, b, imm: jnp.exp(a),               # EXP_LHS
        lambda a, b, imm: jnp.abs(a),               # ABS_LHS
        lambda a, b, imm: jnp.log(a),               # LOG_LHS
        lambda a, b, imm: a + imm,                  # ADD_LHS_IMM
        lambda a, b, imm: a + b,                    # ADD_LHS_RHS
        lambda a, b, imm: a * imm,                  # MUL_LHS_IMM
        lambda a, b, imm: a * b,                    # MUL_LHS_RHS
        lambda a, b, imm: jnp.minimum(a, imm),      # MIN_LHS_IMM
        lambda a, b, imm: jnp.minimum(a, b),        # MIN_LHS_RHS
        lambda a, b, imm: jnp.maximum(a, imm),      # MAX_LHS_IMM
        lambda a, b, imm: jnp.maximum(a, b),        # MAX_LHS_RHS
        lambda a, b, imm: a - imm,                  # SUB_LHS_IMM
        lambda a, b, imm: imm - b,                  # SUB_IMM_RHS
        lambda a, b, imm: a - b,                    # SUB_LHS_RHS
        lambda a, b, imm: a / imm,                  # DIV_LHS_IMM
        lambda a, b, imm: imm / b,                  # DIV_IMM_RHS
        lambda a, b, imm: a / b,                    # DIV_LHS_RHS
        lambda a, b, imm: jnp.full_like(a, imm),    # COPY_IMM
        lambda a, b, imm: a,                        # COPY_LHS
        lambda a, b, imm: b,                        # COPY_RHS
        lambda a, b, imm: jnp.sqrt(a * a + b * b),  # HYPOT_LHS_RHS
        lambda a, b, imm: a * a + b,                # ADDSQ_LHS_RHS
    ]


_FLOAT_BRANCHES = _float_branches()


@jax.jit
def eval_f(td: TapeData, x, y, z=None):
    """Evaluate the tape at concrete points.  Inputs broadcast; the result
    has the broadcast shape.  Differentiable w.r.t. x/y/z and td.imms.

    jit at the API boundary is load-bearing: an eager lax.scan falls back to
    step-by-step dispatch (minutes for an 8k-clause tape)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.zeros_like(x) if z is None else jnp.asarray(z, jnp.float32)
    shape = jnp.broadcast_shapes(x.shape, y.shape, z.shape)
    n = 1
    for s in shape:
        n *= s
    xf = jnp.broadcast_to(x, shape).reshape(n)
    yf = jnp.broadcast_to(y, shape).reshape(n)
    zf = jnp.broadcast_to(z, shape).reshape(n)

    S = td.num_slots
    slots = jnp.zeros((S, n), jnp.float32)
    sx, sy, sz = td.axis_slots
    if sx:
        slots = slots.at[sx].set(xf)
    if sy:
        slots = slots.at[sy].set(yf)
    if sz:
        slots = slots.at[sz].set(zf)

    def body(slots, clause):
        word, imm = clause
        op, out, lhs, rhs = unpack_fields(word)
        a = lax.dynamic_index_in_dim(slots, lhs, 0, keepdims=False)
        b = lax.dynamic_index_in_dim(slots, rhs, 0, keepdims=False)
        res = lax.switch(op, _FLOAT_BRANCHES, a, b, imm)
        slots = lax.dynamic_update_index_in_dim(slots, res, out, 0)
        return slots, None

    slots, _ = lax.scan(body, slots, (td.packed, td.imms))
    return slots[td.result_slot].reshape(shape)


# ---------------------------------------------------------------------------
# Interval evaluation (with choice recording)
# ---------------------------------------------------------------------------

def _interval_branches():
    """Each branch: (al, ah, bl, bh, imm) -> (lo, hi, choice)."""
    j = jnp

    def wrap2(f):
        def g(al, ah, bl, bh, imm):
            lo, hi = f(j, al, ah, bl, bh)
            return lo, hi, jnp.zeros_like(al, jnp.int32)
        return g

    def wrap1(f):
        def g(al, ah, bl, bh, imm):
            lo, hi = f(j, al, ah)
            return lo, hi, jnp.zeros_like(al, jnp.int32)
        return g

    def imm_iv(al, imm):
        i = jnp.full_like(al, imm)
        return i, i

    def nop(al, ah, bl, bh, imm):
        z = al * 0.0
        return z, z, jnp.zeros_like(al, jnp.int32)

    def add_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi = im.i_add(j, al, ah, il, ih)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def mul_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi = im.i_mul(j, al, ah, il, ih)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def min_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi, c = im.i_min(j, al, ah, il, ih)
        return lo, hi, c.astype(jnp.int32)

    def min_rhs(al, ah, bl, bh, imm):
        lo, hi, c = im.i_min(j, al, ah, bl, bh)
        return lo, hi, c.astype(jnp.int32)

    def max_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi, c = im.i_max(j, al, ah, il, ih)
        return lo, hi, c.astype(jnp.int32)

    def max_rhs(al, ah, bl, bh, imm):
        lo, hi, c = im.i_max(j, al, ah, bl, bh)
        return lo, hi, c.astype(jnp.int32)

    def sub_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi = im.i_sub(j, al, ah, il, ih)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def sub_imm_rhs(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi = im.i_sub(j, il, ih, bl, bh)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def div_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi = im.i_div(j, al, ah, il, ih)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def div_imm_rhs(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        lo, hi = im.i_div(j, il, ih, bl, bh)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def copy_imm(al, ah, bl, bh, imm):
        il, ih = imm_iv(al, imm)
        return il, ih, jnp.zeros_like(al, jnp.int32)

    def copy_lhs(al, ah, bl, bh, imm):
        return al, ah, jnp.zeros_like(al, jnp.int32)

    def copy_rhs(al, ah, bl, bh, imm):
        return bl, bh, jnp.zeros_like(al, jnp.int32)

    def hypot_iv(al, ah, bl, bh, imm):
        sal, sah = im.i_square(j, al, ah)
        sbl, sbh = im.i_square(j, bl, bh)
        tl, th = im.i_add(j, sal, sah, sbl, sbh)
        lo, hi = im.i_sqrt(j, tl, th)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    def addsq_iv(al, ah, bl, bh, imm):
        sal, sah = im.i_square(j, al, ah)
        lo, hi = im.i_add(j, sal, sah, bl, bh)
        return lo, hi, jnp.zeros_like(al, jnp.int32)

    return [
        nop,                                         # 0 INVALID
        nop,                                         # 1 JUMP
        wrap1(im.i_square),
        wrap1(im.i_sqrt),
        wrap1(im.i_neg),
        wrap1(im.i_sin),
        wrap1(im.i_cos),
        wrap1(im.i_asin),
        wrap1(im.i_acos),
        wrap1(im.i_atan),
        wrap1(im.i_exp),
        wrap1(im.i_abs),
        wrap1(im.i_log),
        add_imm,
        wrap2(im.i_add),
        mul_imm,
        wrap2(im.i_mul),
        min_imm,
        min_rhs,
        max_imm,
        max_rhs,
        sub_imm,
        sub_imm_rhs,
        wrap2(im.i_sub),
        div_imm,
        div_imm_rhs,
        wrap2(im.i_div),
        copy_imm,
        copy_lhs,
        copy_rhs,
        hypot_iv,
        addsq_iv,
    ]


_INTERVAL_BRANCHES = _interval_branches()

from ..tape.opcodes import CHOICE_OP_LO, CHOICE_OP_HI


@jax.jit
def eval_i(td: TapeData, xl, xh, yl, yh, zl=None, zh=None):
    """Interval evaluation over lanes of boxes.

    Returns ``(lo, hi, choices)``; ``choices`` is ``(num_choices, n) int8``
    in min/max execution order (codes 0/1/2, like
    /root/reference/src/context.cu:254-263).
    """
    xl = jnp.asarray(xl, jnp.float32).reshape(-1)
    xh = jnp.asarray(xh, jnp.float32).reshape(-1)
    yl = jnp.asarray(yl, jnp.float32).reshape(-1)
    yh = jnp.asarray(yh, jnp.float32).reshape(-1)
    if zl is None:
        zl = jnp.zeros_like(xl)
        zh = jnp.zeros_like(xl)
    zl = jnp.asarray(zl, jnp.float32).reshape(-1)
    zh = jnp.asarray(zh, jnp.float32).reshape(-1)
    n = xl.shape[0]

    S = td.num_slots
    lo = jnp.zeros((S, n), jnp.float32)
    hi = jnp.zeros((S, n), jnp.float32)
    sx, sy, sz = td.axis_slots
    if sx:
        lo = lo.at[sx].set(xl)
        hi = hi.at[sx].set(xh)
    if sy:
        lo = lo.at[sy].set(yl)
        hi = hi.at[sy].set(yh)
    if sz:
        lo = lo.at[sz].set(zl)
        hi = hi.at[sz].set(zh)

    C = max(td.num_choices, 1)
    choices = jnp.zeros((C, n), jnp.int8)
    ci = jnp.int32(0)

    def body(carry, clause):
        lo, hi, choices, ci = carry
        word, imm = clause
        op, out, lhs, rhs = unpack_fields(word)
        al = lax.dynamic_index_in_dim(lo, lhs, 0, keepdims=False)
        ah = lax.dynamic_index_in_dim(hi, lhs, 0, keepdims=False)
        bl = lax.dynamic_index_in_dim(lo, rhs, 0, keepdims=False)
        bh = lax.dynamic_index_in_dim(hi, rhs, 0, keepdims=False)
        rl, rh, c = lax.switch(op, _INTERVAL_BRANCHES, al, ah, bl, bh, imm)
        lo = lax.dynamic_update_index_in_dim(lo, rl, out, 0)
        hi = lax.dynamic_update_index_in_dim(hi, rh, out, 0)
        # Record choices at the cursor.  Non-choice clauses merge the
        # existing rows back unchanged (a conditional write would need a
        # branch; this keeps the scan body straight-line).
        has_choice = jnp.logical_and(op >= CHOICE_OP_LO, op <= CHOICE_OP_HI)
        ci_c = jnp.minimum(ci, C - 1)
        row = lax.dynamic_index_in_dim(choices, ci_c, 0, keepdims=False)
        new_row = jnp.where(has_choice, c.astype(jnp.int8), row)
        choices = lax.dynamic_update_index_in_dim(choices, new_row, ci_c, 0)
        ci = ci + has_choice.astype(jnp.int32)
        return (lo, hi, choices, ci), None

    (lo, hi, choices, _), _ = lax.scan(
        body, (lo, hi, choices, ci), (td.packed, td.imms))
    return lo[td.result_slot], hi[td.result_slot], choices
