"""Pallas TPU kernels: the performance core of the renderer.

Two kernels re-express the reference's CUDA device code (SURVEY.md sec. 2.1)
in TPU-native form:

  * :func:`interval_shorten` — fuses ``calculate_intervals`` +
    ``eval_tiles_i`` (Algs 1-2; /root/reference/src/context.cu:188-459):
    per-tile interval evaluation with 2-bit choice recording, then the
    backward mark-and-sweep tape push, all in VMEM.  Lanes are tiles (the
    SIMT analog: one CUDA thread per tile -> one VPU lane per tile).
    Instead of writing compacted subtapes through a global atomic arena
    (impossible and unnecessary under XLA), it emits per-clause 4-bit CODES
    (drop / keep / copy-lhs / copy-rhs / copy-imm); an XLA top_k pass
    (render/pipeline2d.py) compacts these into dense per-tile tapes.

  * :func:`pixel_eval` — ``eval_voxels_f``-style concrete evaluation
    (/root/reference/src/context.cu:707-964), grid over tile-groups: each
    instance evaluates all pixels of one tile with that tile's shortened
    tape held in SMEM (scalar-dispatched, so lanes never diverge — the TPU
    version of "tiles in a warp share a tape",
    /root/reference/src/context.cu:169-172).

Design rules learned from micro-benchmarks on v5e (kept in
``docs/perf_notes.md``):
  * tape words/imms must live in SMEM (scalar prefetch) — per-clause scalar
    dispatch costs ~30 ns regardless of lane width up to ~2048 lanes;
  * register file rows are (8, LANES/8) so each row op fills whole
    (8, 128) VREG tiles;
  * one pallas_call per stage; instance count kept ~<=512 per call
    (instance switch ~ couple of us).

Tape word layout: int32 = op | out<<8 | lhs<<16 | rhs<<24 (byte-parity with
/root/reference/inc/clause.hpp); imm rides in a parallel f32 plane.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tape.opcodes import CHOICE_OP_HI, CHOICE_OP_LO, Op
from . import transcendental as tc

# Status codes (match the spirit of position=-1 marking in the reference).
ST_EMPTY = 0
ST_FILLED = 1
ST_AMBIG = 2

# Shorten codes (4-bit, packed 8/word).
CODE_DROP = 0
CODE_KEEP = 1
CODE_COPY_LHS = 2
CODE_COPY_RHS = 3
CODE_COPY_IMM = 4

SLOT_CAP = 192


def _on_cpu() -> bool:
    # Consult the env before jax.default_backend(): the latter initializes
    # every registered PJRT plugin, and on this machine the axon TPU plugin
    # blocks indefinitely when its tunnel is down — which would hang even
    # forced-CPU test runs.
    forced = os.environ.get("JAX_PLATFORM_NAME") or os.environ.get(
        "JAX_PLATFORMS", "")
    if forced:
        return forced.split(",")[0] == "cpu"
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Interval op branch table
# ---------------------------------------------------------------------------

def _interval_branch_list(widen: bool = False):
    """Branches for lax.switch: (al, ah, bl, bh, imm) -> (rl, rh, choice).

    Choice semantics per gpu_interval.hpp:208-252 (1=LHS, 2=RHS, 0=both).
    Interval semantics mirror ops/interval_math.py; re-stated here in a
    scalar-imm-aware form so IMM variants don't materialize an interval.
    ``widen`` applies >= 1-ulp outward widening to every branch result
    (config.widen_intervals; see interval_math.widen).
    """
    def no_c(rl, rh, like):
        return rl, rh, jnp.zeros_like(like, jnp.int32)

    def nop(al, ah, bl, bh, imm):
        z = al * 0.0
        return no_c(z, z, al)

    def square(al, ah, bl, bh, imm):
        neg = ah < 0.0
        pos = al > 0.0
        ll, hh = al * al, ah * ah
        lo = jnp.where(neg, hh, jnp.where(pos, ll, 0.0))
        hi = jnp.where(jnp.abs(al) > jnp.abs(ah), ll, hh)
        hi = jnp.where(neg, ll, jnp.where(pos, hh, hi))
        return no_c(lo, hi, al)

    def sqrt_(al, ah, bl, bh, imm):
        bad = ah < 0.0
        lo = jnp.where(al <= 0.0, 0.0, jnp.sqrt(jnp.maximum(al, 0.0)))
        hi = jnp.sqrt(jnp.maximum(ah, 0.0))
        nan = jnp.float32(jnp.nan)
        return no_c(jnp.where(bad, nan, lo), jnp.where(bad, nan, hi), al)

    def neg(al, ah, bl, bh, imm):
        return no_c(-ah, -al, al)

    def sincos(al, ah, bl, bh, imm):
        # Reference quirk: interval sin/cos always [-1,1]
        # (gpu_interval.hpp:346-380).
        return no_c(jnp.full_like(al, -1.0), jnp.full_like(ah, 1.0), al)

    def asin_(al, ah, bl, bh, imm):
        bad = (ah < -1.0) | (al > 1.0)
        lo = tc.asin(jnp.clip(al, -1.0, 1.0))
        hi = tc.asin(jnp.clip(ah, -1.0, 1.0))
        nan = jnp.float32(jnp.nan)
        return no_c(jnp.where(bad, nan, lo), jnp.where(bad, nan, hi), al)

    def acos_(al, ah, bl, bh, imm):
        bad = (ah < -1.0) | (al > 1.0)
        lo = tc.acos(jnp.clip(ah, -1.0, 1.0))
        hi = tc.acos(jnp.clip(al, -1.0, 1.0))
        nan = jnp.float32(jnp.nan)
        return no_c(jnp.where(bad, nan, lo), jnp.where(bad, nan, hi), al)

    def atan_(al, ah, bl, bh, imm):
        return no_c(tc.atan(al), tc.atan(ah), al)

    def exp_(al, ah, bl, bh, imm):
        return no_c(jnp.exp(al), jnp.exp(ah), al)

    def abs_(al, ah, bl, bh, imm):
        neg_ = ah < 0.0
        pos = al >= 0.0
        lo = jnp.where(pos, al, jnp.where(neg_, -ah, 0.0))
        hi = jnp.where(pos, ah, jnp.where(neg_, -al, jnp.maximum(-al, ah)))
        return no_c(lo, hi, al)

    def log_(al, ah, bl, bh, imm):
        # Reference quirk preserved (gpu_interval.hpp:382-391).
        bad = ah < 0.0
        lo = jnp.where(al <= 0.0, 0.0, jnp.log(jnp.maximum(al, 1e-38)))
        hi = jnp.where(ah <= 0.0, -jnp.inf, jnp.log(jnp.maximum(ah, 1e-38)))
        nan = jnp.float32(jnp.nan)
        return no_c(jnp.where(bad, nan, lo), jnp.where(bad, nan, hi), al)

    def add_imm(al, ah, bl, bh, imm):
        return no_c(al + imm, ah + imm, al)

    def add(al, ah, bl, bh, imm):
        return no_c(al + bl, ah + bh, al)

    def mul_imm(al, ah, bl, bh, imm):
        lo = jnp.where(imm < 0.0, ah * imm, al * imm)
        hi = jnp.where(imm < 0.0, al * imm, ah * imm)
        return no_c(lo, hi, al)

    def mul(al, ah, bl, bh, imm):
        p1, p2, p3, p4 = al * bl, al * bh, ah * bl, ah * bh
        xn, xp = al < 0.0, ah > 0.0
        yn, yp = bl < 0.0, bh > 0.0
        x_m, x_n, x_p = xn & xp, xn & ~xp, ~xn & xp
        y_m, y_n, y_p = yn & yp, yn & ~yp, ~yn & yp
        zero = al * 0.0
        # nested wheres, first-true-wins (jnp.select lowers via argmax,
        # which Mosaic does not support for int operands)
        def sel(pairs, default):
            r = default
            for c, v in reversed(pairs):
                r = jnp.where(c, v, r)
            return r
        cases = [x_m & y_m, x_m & y_n, x_m & y_p, x_n & y_m, x_n & y_n,
                 x_n & y_p, x_p & y_m, x_p & y_n, x_p & y_p]
        lo = sel(list(zip(cases,
                 [jnp.minimum(p2, p3), p3, p2, p2, p4, p2, p3, p3, p1])), zero)
        hi = sel(list(zip(cases,
                 [jnp.maximum(p1, p4), p1, p4, p1, p1, p3, p4, p2, p4])), zero)
        return no_c(lo, hi, al)

    def min_imm(al, ah, bl, bh, imm):
        c1 = ah < imm
        c2 = imm < al
        c = jnp.where(c1, 1, jnp.where(c2, 2, 0))
        lo = jnp.where(c1, al, jnp.where(c2, imm, jnp.minimum(al, imm)))
        hi = jnp.where(c1, ah, jnp.where(c2, imm, jnp.minimum(ah, imm)))
        return lo, hi, c

    def min_rhs(al, ah, bl, bh, imm):
        c1 = ah < bl
        c2 = bh < al
        c = jnp.where(c1, 1, jnp.where(c2, 2, 0))
        lo = jnp.where(c1, al, jnp.where(c2, bl, jnp.minimum(al, bl)))
        hi = jnp.where(c1, ah, jnp.where(c2, bh, jnp.minimum(ah, bh)))
        return lo, hi, c

    def max_imm(al, ah, bl, bh, imm):
        c1 = al > imm
        c2 = imm > ah
        c = jnp.where(c1, 1, jnp.where(c2, 2, 0))
        lo = jnp.where(c1, al, jnp.where(c2, imm, jnp.maximum(al, imm)))
        hi = jnp.where(c1, ah, jnp.where(c2, imm, jnp.maximum(ah, imm)))
        return lo, hi, c

    def max_rhs(al, ah, bl, bh, imm):
        c1 = al > bh
        c2 = bl > ah
        c = jnp.where(c1, 1, jnp.where(c2, 2, 0))
        lo = jnp.where(c1, al, jnp.where(c2, bl, jnp.maximum(al, bl)))
        hi = jnp.where(c1, ah, jnp.where(c2, bh, jnp.maximum(ah, bh)))
        return lo, hi, c

    def sub_imm(al, ah, bl, bh, imm):
        return no_c(al - imm, ah - imm, al)

    def sub_imm_rhs(al, ah, bl, bh, imm):
        return no_c(imm - bh, imm - bl, al)

    def sub(al, ah, bl, bh, imm):
        return no_c(al - bh, ah - bl, al)

    def _div(al, ah, bl, bh):
        spans = (bl <= 0.0) & (bh >= 0.0)
        sbl = jnp.where(spans, -1.0, bl)
        sbh = jnp.where(spans, 1.0, bh)
        x_neg = ah < 0.0
        x_mix = ~x_neg & (al < 0.0)
        y_neg = bh < 0.0
        def sel(pairs, default):
            r = default
            for c, v in reversed(pairs):
                r = jnp.where(c, v, r)
            return r
        dcases = [x_neg & y_neg, x_neg & ~y_neg, x_mix & y_neg, x_mix & ~y_neg]
        lo = sel(list(zip(dcases, [ah / sbl, al / sbl, ah / sbh, al / sbl])),
                 jnp.where(y_neg, ah / sbh, al / sbh))
        hi = sel(list(zip(dcases, [al / sbh, ah / sbh, al / sbh, ah / sbl])),
                 jnp.where(y_neg, al / sbl, ah / sbl))
        inf = jnp.float32(jnp.inf)
        return jnp.where(spans, -inf, lo), jnp.where(spans, inf, hi)

    def div_imm(al, ah, bl, bh, imm):
        lo, hi = _div(al, ah, jnp.full_like(al, imm), jnp.full_like(ah, imm))
        return no_c(lo, hi, al)

    def div_imm_rhs(al, ah, bl, bh, imm):
        lo, hi = _div(jnp.full_like(al, imm), jnp.full_like(ah, imm), bl, bh)
        return no_c(lo, hi, al)

    def div(al, ah, bl, bh, imm):
        lo, hi = _div(al, ah, bl, bh)
        return no_c(lo, hi, al)

    def copy_imm(al, ah, bl, bh, imm):
        i = jnp.full_like(al, imm)
        return no_c(i, i, al)

    def copy_lhs(al, ah, bl, bh, imm):
        return no_c(al, ah, al)

    def copy_rhs(al, ah, bl, bh, imm):
        return no_c(bl, bh, al)

    def _sq(al, ah):
        neg_ = ah < 0.0
        pos = al > 0.0
        ll, hh = al * al, ah * ah
        lo = jnp.where(neg_, hh, jnp.where(pos, ll, 0.0))
        hi = jnp.where(jnp.abs(al) > jnp.abs(ah), ll, hh)
        hi = jnp.where(neg_, ll, jnp.where(pos, hh, hi))
        return lo, hi

    def hypot_(al, ah, bl, bh, imm):
        sal, sah = _sq(al, ah)
        sbl, sbh = _sq(bl, bh)
        tl, th = sal + sbl, sah + sbh
        return no_c(jnp.sqrt(jnp.maximum(tl, 0.0)), jnp.sqrt(th), al)

    def addsq_(al, ah, bl, bh, imm):
        sal, sah = _sq(al, ah)
        return no_c(sal + bl, sah + bh, al)

    table = [
        nop, nop,                 # INVALID, JUMP
        square, sqrt_, neg, sincos, sincos, asin_, acos_, atan_,
        exp_, abs_, log_,
        add_imm, add, mul_imm, mul,
        min_imm, min_rhs, max_imm, max_rhs,
        sub_imm, sub_imm_rhs, sub,
        div_imm, div_imm_rhs, div,
        copy_imm, copy_lhs, copy_rhs,
        hypot_, addsq_,
    ]
    if not widen:
        return table

    from . import interval_math as _im

    def _widened(f):
        def g(al, ah, bl, bh, imm):
            rl, rh, c = f(al, ah, bl, bh, imm)
            rl, rh = _im.widen(jnp, rl, rh)
            return rl, rh, c
        return g

    return [table[0], table[1]] + [_widened(f) for f in table[2:]]


# ---------------------------------------------------------------------------
# Kernel A: interval eval + in-kernel tape shortening (uniform tape)
# ---------------------------------------------------------------------------

def _make_interval_shorten_kernel(branch_ops, widen: bool = False):
    """Kernel A with run-level dispatch, specialized to the tape's op set.

    ``branch_ops``: static tuple of GPU opcodes; run headers carry
    branch ids (0 = NOP, i+1 = branch_ops[i]).
    """
    all_br = _interval_branch_list(widen)

    def kernel(
            # scalar prefetch
            meta_ref,      # (8,) i32: [T, S, res, sx, sy, sz, n_runs,
                           #            n_active_lanes (0 = all)]
            words_ref,     # (Tcap,) int32
            imms_ref,      # (Tcap,) f32
            runs_ref,      # (Tcap,) int32: bid | count<<8 (full tape)
            # inputs
            boxes_ref,     # (1, 6, 8, LB8) f32: xl xh yl yh zl zh per lane
            # outputs
            status_ref,    # (1, 8, LB8) int32
            codes_ref,     # (1, Tcap//8, 8, LB8) int32: 4-bit codes
            # scratch
            regs_ref,      # (S_cap, 2, 8, LB8) f32 lo/hi register file
            act_ref,       # (S_cap, 8, LB8) int32 active flags
            cho_ref,       # (CW, 8, LB8) int32 packed 2-bit choices
    ):
        # Lane-block skip: blocks wholly past the active-lane count zero
        # their loop bounds (outputs are garbage the caller masks).  Lets
        # the 3D child stage pay only for real ambiguous parents.
        n_active = meta_ref[7]
        b = pl.program_id(0)
        lb = status_ref.shape[1] * status_ref.shape[2]
        skip = jnp.logical_and(n_active > 0, b * lb >= n_active)

        T = jnp.where(skip, 0, meta_ref[0])
        res = meta_ref[2]
        sx, sy, sz = meta_ref[3], meta_ref[4], meta_ref[5]
        n_runs = jnp.where(skip, 0, meta_ref[6])

        zero_v = jnp.zeros_like(boxes_ref[0, 0])
        # Axis seeds.  An unused axis has slot 0; those writes land on row
        # 0, which is re-zeroed right after (slot 0 must read as the [0,0]
        # "no operand" sentinel, like the reference's never-allocated
        # slot 0).
        regs_ref[pl.ds(sx, 1), 0] = boxes_ref[0, 0][None]
        regs_ref[pl.ds(sx, 1), 1] = boxes_ref[0, 1][None]
        regs_ref[pl.ds(sy, 1), 0] = boxes_ref[0, 2][None]
        regs_ref[pl.ds(sy, 1), 1] = boxes_ref[0, 3][None]
        regs_ref[pl.ds(sz, 1), 0] = boxes_ref[0, 4][None]
        regs_ref[pl.ds(sz, 1), 1] = boxes_ref[0, 5][None]
        regs_ref[0, 0] = zero_v
        regs_ref[0, 1] = zero_v

        # ---- forward interval pass: one dispatch per opcode run ------------
        def push_code(cword, ci, c):
            cword = cword | (c << (2 * (ci % 16)))

            @pl.when(ci % 16 == 15)
            def _(cword=cword, ci=ci):
                cho_ref[pl.ds(ci // 16, 1)] = cword[None]

            return jnp.where(ci % 16 == 15, 0, cword), ci + 1

        def mk_branch(op):
            f = all_br[op]
            is_choice = CHOICE_OP_LO <= op <= CHOICE_OP_HI

            def br(t0, cnt, cword, ci):
                def inner(k, carry):
                    cword, ci = carry
                    t = t0 + k
                    w = words_ref[t]
                    out = (w >> 8) & 0xFF
                    lhs = (w >> 16) & 0xFF
                    rhs = (w >> 24) & 0xFF
                    ab = regs_ref[pl.ds(lhs, 1)][0]
                    bb = regs_ref[pl.ds(rhs, 1)][0]
                    rl, rh, c = f(ab[0], ab[1], bb[0], bb[1], imms_ref[t])
                    regs_ref[pl.ds(out, 1), 0] = rl[None]
                    regs_ref[pl.ds(out, 1), 1] = rh[None]
                    if is_choice:
                        cword, ci = push_code(cword, ci, c)
                    return cword, ci
                return lax.fori_loop(0, cnt, inner, (cword, ci))
            return br

        def nop_br(t0, cnt, cword, ci):
            return cword, ci

        run_branches = [nop_br] + [mk_branch(o) for o in branch_ops]

        def fwd_run(r, carry):
            t0, cword, ci = carry
            hdr = runs_ref[r]
            bid = hdr & 0xFF
            cnt = hdr >> 8
            cword, ci = lax.switch(bid, run_branches, t0, cnt, cword, ci)
            return t0 + cnt, cword, ci

        cword0 = jnp.zeros_like(boxes_ref[0, 0], jnp.int32)
        _, cword, n_choices = lax.fori_loop(
            0, n_runs, fwd_run, (jnp.int32(0), cword0, jnp.int32(0)))
        # Flush the trailing partial choice word.
        @pl.when(n_choices % 16 != 0)
        def _():
            cho_ref[pl.ds(n_choices // 16, 1)] = cword[None]

        # ---- classification ----------------------------------------------------
        rlo = regs_ref[pl.ds(res, 1), 0][0]
        rhi = regs_ref[pl.ds(res, 1), 1][0]
        empty = rlo > 0.0
        filled = rhi < 0.0
        status = jnp.where(empty, ST_EMPTY,
                           jnp.where(filled, ST_FILLED, ST_AMBIG))
        status_ref[0] = status
        amb = status == ST_AMBIG

        # ---- backward mark-and-sweep shorten pass ------------------------------
        # (mirrors /root/reference/src/context.cu:319-459, vectorized over lanes;
        # non-ambiguous lanes produce garbage codes that are never consumed)
        def clear_act(s, _):
            act_ref[pl.ds(s, 1)] = cword0[None]
            return 0
        lax.fori_loop(0, jnp.where(skip, 0, act_ref.shape[0]), clear_act, 0)
        act_ref[pl.ds(res, 1)] = amb.astype(jnp.int32)[None]

        def bwd(i, carry):
            ci, kword = carry
            t = T - 1 - i
            w = words_ref[t]
            op = w & 0xFF
            out = (w >> 8) & 0xFF
            lhs = (w >> 16) & 0xFF
            rhs = (w >> 24) & 0xFF
            has_choice = jnp.logical_and(op >= CHOICE_OP_LO, op <= CHOICE_OP_HI)
            ci = ci - has_choice.astype(jnp.int32)

            active_out = act_ref[pl.ds(out, 1)][0]      # (8, LB8) int32

            cw = cho_ref[pl.ds(ci // 16, 1)][0]
            choice = (cw >> (2 * (ci % 16))) & 3
            choice = jnp.where(has_choice, choice, 0)
            is_act = active_out != 0

            # code per lane (plain ops)
            keep_both = choice == 0
            ch_lhs = choice == 1
            ch_rhs = choice == 2
            rhs_is_reg = rhs != 0
            # elision: copy would be in-place
            elide = (ch_lhs & (lhs == out)) | (ch_rhs & rhs_is_reg & (rhs == out))
            code = jnp.where(keep_both, CODE_KEEP,
                     jnp.where(ch_lhs, CODE_COPY_LHS,
                       jnp.where(rhs_is_reg, CODE_COPY_RHS, CODE_COPY_IMM)))
            code = jnp.where(elide, CODE_DROP, code)
            code = jnp.where(is_act, code, CODE_DROP)

            # mark operands active (only where this clause is active);
            # boolean algebra instead of where() — Mosaic cannot select
            # on i1 vectors
            mark_lhs = is_act & (keep_both | ch_lhs)
            mark_rhs = is_act & (keep_both | (ch_rhs & rhs_is_reg))
            # clear out flag first (it may be re-marked if lhs/rhs == out)
            act_ref[pl.ds(out, 1)] = jnp.where(is_act, 0, active_out)[None]
            a_l = act_ref[pl.ds(lhs, 1)][0]
            act_ref[pl.ds(lhs, 1)] = jnp.where(
                mark_lhs & (lhs != 0), 1, a_l)[None]
            a_r = act_ref[pl.ds(rhs, 1)][0]
            act_ref[pl.ds(rhs, 1)] = jnp.where(
                mark_rhs, 1, a_r)[None]

            # pack 4-bit code (nibble t%8 of word t//8)
            kword = kword | (code << (4 * (t % 8)))

            @pl.when(t % 8 == 0)
            def _():
                codes_ref[0, pl.ds(t // 8, 1)] = kword[None]

            kword = jnp.where(t % 8 == 0, 0, kword)
            return ci, kword

        lax.fori_loop(0, T, bwd, (n_choices, cword0))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("branch_ops", "s_cap", "block_lanes",
                                    "widen"))
def interval_shorten(meta: jnp.ndarray, words: jnp.ndarray,
                     imms: jnp.ndarray, runs: jnp.ndarray,
                     boxes: jnp.ndarray, branch_ops: tuple = None,
                     s_cap: int = SLOT_CAP, block_lanes: int = 512,
                     widen: bool = False):
    """Run kernel A over `lanes` tiles with one shared tape.

    Grid iterates over lane blocks of `block_lanes` tiles so VMEM stays
    bounded at any image size.

    Args:
      meta: (8,) int32 [T, S, result_slot, sx, sy, sz, n_runs, 0]
      words: (Tcap,) int32; imms: (Tcap,) f32 tape planes
      runs: (Tcap,) int32 run headers, op byte ALREADY remapped to branch
        ids matching `branch_ops` (static tuple; see build_remap)
      boxes: (6, lanes) f32 — xl xh yl yh zl zh per tile

    Returns:
      status: (lanes,) int32; codes_packed: (lanes, Tcap//8) int32
    """
    tcap = words.shape[0]
    lanes = boxes.shape[1]
    lb = min(block_lanes, max(256, lanes))
    nb = -(-lanes // lb)
    lb8 = lb // 8
    if lanes < nb * lb:
        boxes = jnp.pad(boxes, ((0, 0), (0, nb * lb - lanes)))
    boxes_r = boxes.reshape(6, nb, 8, lb8).transpose(1, 0, 2, 3)
    cw = max(tcap // 16, 1)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 6, 8, lb8), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 8, lb8), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, tcap // 8, 8, lb8),
                                lambda b, *_: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((s_cap, 2, 8, lb8), jnp.float32),
            pltpu.VMEM((s_cap, 8, lb8), jnp.int32),
            pltpu.VMEM((cw, 8, lb8), jnp.int32),
        ],
    )
    status, codes = pl.pallas_call(
        _make_interval_shorten_kernel(branch_ops, widen),
        out_shape=(jax.ShapeDtypeStruct((nb, 8, lb8), jnp.int32),
                   jax.ShapeDtypeStruct((nb, tcap // 8, 8, lb8), jnp.int32)),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(meta, words, imms, runs, boxes_r)
    status = status.reshape(nb * lb)[:lanes]
    # (nb, T/8, 8, lb8) -> (lanes, T/8)
    codes = codes.reshape(nb, tcap // 8, lb).transpose(0, 2, 1)
    codes = codes.reshape(nb * lb, tcap // 8)[:lanes]
    return status, codes


# ---------------------------------------------------------------------------
# Kernel B: grouped pixel evaluation (per-group tape in SMEM)
# ---------------------------------------------------------------------------

def _float_branch_list():
    return [
        lambda a, b, imm: a * 0.0,                  # INVALID
        lambda a, b, imm: a * 0.0,                  # JUMP
        lambda a, b, imm: a * a,
        lambda a, b, imm: jnp.sqrt(a),
        lambda a, b, imm: -a,
        lambda a, b, imm: jnp.sin(a),
        lambda a, b, imm: jnp.cos(a),
        lambda a, b, imm: tc.asin(a),
        lambda a, b, imm: tc.acos(a),
        lambda a, b, imm: tc.atan(a),
        lambda a, b, imm: jnp.exp(a),
        lambda a, b, imm: jnp.abs(a),
        lambda a, b, imm: jnp.log(a),
        lambda a, b, imm: a + imm,
        lambda a, b, imm: a + b,
        lambda a, b, imm: a * imm,
        lambda a, b, imm: a * b,
        lambda a, b, imm: jnp.minimum(a, imm),
        lambda a, b, imm: jnp.minimum(a, b),
        lambda a, b, imm: jnp.maximum(a, imm),
        lambda a, b, imm: jnp.maximum(a, b),
        lambda a, b, imm: a - imm,
        lambda a, b, imm: imm - b,
        lambda a, b, imm: a - b,
        lambda a, b, imm: a / imm,
        lambda a, b, imm: imm / b,
        lambda a, b, imm: a / b,
        lambda a, b, imm: jnp.full_like(a, imm),
        lambda a, b, imm: a,
        lambda a, b, imm: b,
        lambda a, b, imm: jnp.sqrt(a * a + b * b),  # HYPOT_LHS_RHS
        lambda a, b, imm: a * a + b,                # ADDSQ_LHS_RHS
    ]


def _pixel_eval_kernel(
        # scalar prefetch
        nmeta_ref,     # (8,) int32: [n_groups, S, result_slot, sx, sy, sz,.]
        order_ref,     # (Gcap,) int32 tile index per group (for index_map)
        lens_ref,      # (Gcap,) int32 shortened tape length per TILE index
        # inputs (blocked per group)
        tape_ref,      # (1, 1, cap) int32 in SMEM: clause words
        timm_ref,      # (1, 1, cap) f32 in SMEM: immediates
        coords_ref,    # (1, 3, 8, P8) f32 pixel x/y/z
        # output
        vals_ref,      # (1, 8, P8) f32
        # scratch
        regs_ref,      # (S_cap, 8, P8) f32
):
    branches = _float_branch_list()
    g = pl.program_id(0)
    n_groups = nmeta_ref[0]
    res = nmeta_ref[2]
    sx, sy, sz = nmeta_ref[3], nmeta_ref[4], nmeta_ref[5]

    @pl.when(g < n_groups)
    def _():
        zero_v = jnp.zeros_like(coords_ref[0, 0])
        regs_ref[pl.ds(sx, 1)] = coords_ref[0, 0][None]
        regs_ref[pl.ds(sy, 1)] = coords_ref[0, 1][None]
        regs_ref[pl.ds(sz, 1)] = coords_ref[0, 2][None]
        regs_ref[0] = zero_v  # slot 0: the "no operand" sentinel

        tile = order_ref[g]
        n = lens_ref[tile]

        def body(t, _):
            w = tape_ref[0, 0, t]
            op = w & 0xFF
            out = (w >> 8) & 0xFF
            lhs = (w >> 16) & 0xFF
            rhs = (w >> 24) & 0xFF
            imm = timm_ref[0, 0, t]
            a = regs_ref[pl.ds(lhs, 1)][0]
            b = regs_ref[pl.ds(rhs, 1)][0]
            r = lax.switch(op, branches, a, b, imm)
            regs_ref[pl.ds(out, 1)] = r[None]
            return 0

        lax.fori_loop(0, n, body, 0)
        vals_ref[0] = regs_ref[pl.ds(res, 1)][0]


@functools.partial(jax.jit, static_argnames=("s_cap",))
def pixel_eval(nmeta: jnp.ndarray, order: jnp.ndarray, lens: jnp.ndarray,
               tape_words: jnp.ndarray, tape_imms: jnp.ndarray,
               coords: jnp.ndarray, s_cap: int = SLOT_CAP):
    """Kernel B: evaluate each group's pixels with its own tape.

    Args:
      nmeta: (8,) int32 [n_groups, S, result_slot, sx, sy, sz, 0, 0]
      order: (Gcap,) int32 — tile index for each group slot
      lens: (n_tiles,) int32 — per-TILE tape length
      tape_words: (n_tiles, cap) int32; tape_imms: (n_tiles, cap) f32
      coords: (n_tiles, 3, P) f32 — pixel coordinates per tile

    Returns:
      vals: (Gcap, P) f32 — per-group pixel values (garbage for g >=
      n_groups).
    """
    gcap = order.shape[0]
    n_tiles, cap = tape_words.shape
    P = coords.shape[2]
    p8 = P // 8
    coords_r = coords.reshape(n_tiles, 3, 8, p8)

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gcap,),
        in_specs=[
            pl.BlockSpec((1, 1, cap),
                         lambda g, nmeta, order, lens: (order[g], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cap),
                         lambda g, nmeta, order, lens: (order[g], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, 8, p8),
                         lambda g, nmeta, order, lens: (order[g], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, p8),
                               lambda g, nmeta, order, lens: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_cap, 8, p8), jnp.float32)],
    )
    vals = pl.pallas_call(
        _pixel_eval_kernel,
        out_shape=jax.ShapeDtypeStruct((gcap, 8, p8), jnp.float32),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(nmeta, order, lens, tape_words[:, None, :], tape_imms[:, None, :], coords_r)
    return vals.reshape(gcap, P)


# ---------------------------------------------------------------------------
# Kernel C: scalar tape compaction with run headers
# ---------------------------------------------------------------------------
#
# Replaces the XLA top_k compaction (render/pipeline2d.py::compact_tapes,
# ~13 ms at 1024^2 because XLA sort is slow on TPU) with a scalar SMEM pass:
# one grid instance per ambiguous tile walks its packed 4-bit code words,
# skips all-dropped words in one test, and appends kept clauses to an SMEM
# output tape.  Rewrites preserve opcode runs wherever possible:
#
#   choice=LHS on MIN/MAX_LHS_RHS  -> duplicate operand (min(a,a) == a)
#   choice=LHS on MIN_LHS_IMM      -> imm := +inf   (min(a, inf) == a)
#   choice=LHS on MAX_LHS_IMM      -> imm := -inf
#   choice=RHS on MIN/MAX_LHS_RHS  -> lhs := rhs
#   choice=RHS on *_LHS_IMM        -> COPY_IMM      (only run breaker left)
#
# The kernel also emits per-tile run headers (branch_id | count<<8), so the
# pixel interpreter dispatches once per run instead of once per clause
# (lax.switch costs ~6 ns per compiled branch per step; docs/perf_notes.md).

_POS_INF_F32 = float(np.float32(np.inf))


def _compact_kernel(
        # scalar prefetch
        cmeta_ref,    # (8,) int32: [n_groups, n_words, cap, ...]
        words_ref,    # (Tcap,) int32 shared tape
        imms_ref,     # (Tcap,) f32
        order_ref,    # (Gcap,) int32 tile id per group
        remap_ref,    # (32,) int32 op -> branch id
        # input
        codes_ref,    # (1, 1, TW) int32 packed nibbles (blocked by tile)
        # outputs (SMEM)
        tw_ref,       # (1, 1, cap) int32
        ti_ref,       # (1, 1, cap) f32
        runs_ref,     # (1, 1, rcap) int32: branch_id | count<<8
        gmeta_ref,    # (1, 1, 8) int32: [len, n_runs, overflow, ...]
):
    g = pl.program_id(0)
    n_groups = cmeta_ref[0]
    n_words = cmeta_ref[1]
    cap = cmeta_ref[2]

    @pl.when(g < n_groups)
    def _():
        def word_body(w, carry):
            k, r, cur_bid, run_cnt = carry
            cw = codes_ref[0, 0, w]

            def nib_body(carry):
                k, r, cur_bid, run_cnt = carry
                for j in range(8):
                    nib = (cw >> (4 * j)) & 15
                    t = w * 8 + j
                    word = words_ref[t]
                    imm = imms_ref[t]
                    op = word & 0xFF
                    lhs = (word >> 16) & 0xFF
                    rhs = (word >> 24) & 0xFF
                    is_min_imm = op == int(Op.MIN_LHS_IMM)
                    is_max_imm = op == int(Op.MAX_LHS_IMM)
                    imm_form = jnp.logical_or(is_min_imm, is_max_imm)
                    # rewrites (run-preserving; see block comment)
                    dup_rhs = jnp.logical_and(nib == CODE_COPY_LHS,
                                              ~imm_form)
                    take_rhs = nib == CODE_COPY_RHS
                    inf_imm = jnp.logical_and(nib == CODE_COPY_LHS, imm_form)
                    to_copy_imm = nib == CODE_COPY_IMM
                    new_lhs = jnp.where(take_rhs, rhs, lhs)
                    new_rhs = jnp.where(dup_rhs, lhs,
                                        jnp.where(take_rhs, rhs, rhs))
                    new_op = jnp.where(to_copy_imm, int(Op.COPY_IMM), op)
                    new_imm = jnp.where(
                        inf_imm,
                        jnp.where(is_min_imm, _POS_INF_F32, -_POS_INF_F32),
                        imm)
                    new_word = (new_op | (word & 0xFF00)
                                | (new_lhs << 16) | (new_rhs << 24))
                    bid = remap_ref[new_op]

                    keep = jnp.logical_and(nib != 0, k < cap)
                    flush = jnp.logical_and(
                        keep, jnp.logical_and(bid != cur_bid, run_cnt > 0))

                    @pl.when(flush)
                    def _():
                        runs_ref[0, 0, r] = cur_bid | (run_cnt << 8)

                    r = r + flush.astype(jnp.int32)
                    run_cnt = jnp.where(
                        keep,
                        jnp.where(bid != cur_bid, 1, run_cnt + 1),
                        run_cnt)
                    cur_bid = jnp.where(keep, bid, cur_bid)

                    @pl.when(keep)
                    def _():
                        tw_ref[0, 0, k] = new_word
                        ti_ref[0, 0, k] = new_imm

                    k = k + keep.astype(jnp.int32)
                return k, r, cur_bid, run_cnt

            return lax.cond(cw != 0, nib_body, lambda c: c,
                            (k, r, cur_bid, run_cnt))

        k, r, cur_bid, run_cnt = lax.fori_loop(
            0, n_words, word_body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(-1), jnp.int32(0)))

        @pl.when(run_cnt > 0)
        def _():
            runs_ref[0, 0, r] = cur_bid | (run_cnt << 8)

        n_runs = r + (run_cnt > 0).astype(jnp.int32)
        gmeta_ref[0, 0, 0] = k
        gmeta_ref[0, 0, 1] = n_runs
        # overflow: kernel A counted more kept clauses than cap
        gmeta_ref[0, 0, 2] = (k >= cap).astype(jnp.int32)


def compact_runs(cmeta, words, imms, order, remap, codes,
                 gcap: int, cap: int, rcap: int):
    """Run kernel C.  ``codes``: (n_tiles, TW) int32 from kernel A.

    Returns (tape_words (gcap, cap) i32, tape_imms (gcap, cap) f32,
    runs (gcap, rcap) i32, gmeta (gcap, 8) i32)."""
    n_tiles, twords = codes.shape
    codes3 = codes.reshape(n_tiles, 1, twords)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(gcap,),
        in_specs=[pl.BlockSpec((1, 1, twords),
                               lambda g, *refs: (refs[3][g], 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rcap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
    )
    tw, ti, runs, gmeta = pl.pallas_call(
        _compact_kernel,
        out_shape=(jax.ShapeDtypeStruct((gcap, 1, cap), jnp.int32),
                   jax.ShapeDtypeStruct((gcap, 1, cap), jnp.float32),
                   jax.ShapeDtypeStruct((gcap, 1, rcap), jnp.int32),
                   jax.ShapeDtypeStruct((gcap, 1, 8), jnp.int32)),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(cmeta, words, imms, order, remap, codes3)
    return tw[:, 0], ti[:, 0], runs[:, 0], gmeta[:, 0]


# ---------------------------------------------------------------------------
# Kernel B v2: run-dispatch pixel evaluation
# ---------------------------------------------------------------------------

def build_remap(ops_present):
    """Branch table spec: returns (branch_ops tuple, remap np array (32,)).

    branch id 0 is a NOP; COPY_IMM is always present (shortening can
    emit it).  ``ops_present`` order is PRESERVED — lax.switch lowers
    to a linear predicate chain (~6 ns per branch per step,
    docs/perf_notes.md), so TapeData orders ops by frequency to put hot
    ops first."""
    extra = [int(Op.COPY_IMM)]
    seen = set()
    branch_ops = []
    for o in tuple(ops_present) + tuple(extra):
        o = int(o)
        if o in (0, 1) or o in seen:
            continue
        seen.add(o)
        branch_ops.append(o)
    # Table sized to exactly NUM_OPS: XLA TPU lowers small-table gathers
    # via one-hot selects up to ~40 entries, then falls off a ~400x cliff
    # to a real gather (measured: 33 entries 0.007 ms, 64 entries 16.6 ms
    # for the same (256, 8192) index load).
    from ..tape.opcodes import NUM_OPS
    remap = np.zeros(NUM_OPS, dtype=np.int32)
    for i, o in enumerate(branch_ops):
        remap[o] = i + 1
    return tuple(branch_ops), remap


def _make_pixel_run_kernel(branch_ops, s_cap):
    all_br = _float_branch_list()

    def kernel(nmeta_ref, order_ref, status_ref, words_ref, imms_ref,
               runsF_ref, tw_ref, ti_ref, runs_ref, gmeta_ref, coords_ref,
               fill_ref, regs_ref):
        g = pl.program_id(0)
        n_groups = nmeta_ref[0]
        res = nmeta_ref[2]
        sx, sy, sz = nmeta_ref[3], nmeta_ref[4], nmeta_ref[5]
        tile = order_ref[g]
        st = status_ref[tile]

        # non-ambiguous tiles take their interval-stage decision — the
        # copy_filled upsample (/root/reference/src/context.cu:664-692)
        # folded into this kernel's tile-indexed output
        @pl.when(jnp.logical_or(g >= n_groups, st != ST_AMBIG))
        def _():
            fill_ref[0] = jnp.full_like(fill_ref[0],
                                        (st == ST_FILLED).astype(jnp.int32))

        @pl.when(jnp.logical_and(g < n_groups, st == ST_AMBIG))
        def _():
            regs_ref[pl.ds(sx, 1)] = coords_ref[0, 0][None]
            regs_ref[pl.ds(sy, 1)] = coords_ref[0, 1][None]
            regs_ref[pl.ds(sz, 1)] = coords_ref[0, 2][None]
            regs_ref[0] = jnp.zeros_like(coords_ref[0, 0])

            overflow = gmeta_ref[0, 0, 2]

            def interp(run_src, w_src, i_src, n_runs):
                def outer(r, t0):
                    hdr = run_src(r)
                    bid = hdr & 0xFF
                    cnt = hdr >> 8

                    def mk_branch(o):
                        f = all_br[o]

                        def br(t0, cnt):
                            def inner(k, _):
                                t = t0 + k
                                w = w_src(t)
                                out = (w >> 8) & 0xFF
                                lhs = (w >> 16) & 0xFF
                                rhs = (w >> 24) & 0xFF
                                a = regs_ref[pl.ds(lhs, 1)][0]
                                b = regs_ref[pl.ds(rhs, 1)][0]
                                regs_ref[pl.ds(out, 1)] = f(
                                    a, b, i_src(t))[None]
                                return 0
                            lax.fori_loop(0, cnt, inner, 0)
                            return 0
                        return br

                    def nop_branch(t0, cnt):
                        return 0

                    branches = [nop_branch] + [mk_branch(o)
                                               for o in branch_ops]
                    lax.switch(bid, branches, t0, cnt)
                    return t0 + cnt
                lax.fori_loop(0, n_runs, outer, jnp.int32(0))

            @pl.when(overflow == 0)
            def _():
                interp(lambda r: runs_ref[0, 0, r],
                       lambda t: tw_ref[0, 0, t],
                       lambda t: ti_ref[0, 0, t],
                       gmeta_ref[0, 0, 1])

            @pl.when(overflow != 0)
            def _():
                # rare fallback: tile's shortened tape overflowed `cap`;
                # interpret the full shared tape (reference behavior: keep
                # the parent tape, /root/reference/src/context.cu:336-347)
                interp(lambda r: runsF_ref[r],
                       lambda t: words_ref[t],
                       lambda t: imms_ref[t],
                       nmeta_ref[6])

            fill_ref[0] = (regs_ref[pl.ds(res, 1)][0] < 0.0).astype(
                jnp.int32)

    return kernel


def pixel_eval_runs(nmeta, order, status, words, imms, runs_full,
                    remap_ops, tw, ti, runs, gmeta, coords, s_cap: int):
    """Kernel B v2.  See _make_pixel_run_kernel.

    nmeta: (8,) [n_groups, S, res, sx, sy, sz, n_runs_full, 0]
    status: (n_tiles,) i32 interval-stage statuses, TILE order.
    remap_ops: static tuple of branch ops (from build_remap).
    tw/ti/runs/gmeta: kernel C outputs (in ORDER order).
    coords: (n_tiles, 3, P) in TILE order.

    Returns fill: (n_tiles, P) int32 0/1 in TILE order — ambiguous tiles
    carry per-pixel signs, filled/empty tiles their interval decision.
    """
    gcap, cap = tw.shape
    rcap = runs.shape[1]
    n_tiles = coords.shape[0]
    P = coords.shape[2]
    p8 = P // 8
    kernel = _make_pixel_run_kernel(remap_ops, s_cap)
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gcap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # words (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # imms (full)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # runs_full
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, cap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rcap), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, 8, p8),
                         lambda g, nmeta, order, status: (order[g], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # output blocks are TILE-indexed through the same order
        # indirection, so the image composes by pure reshape
        out_specs=pl.BlockSpec((1, 8, p8),
                               lambda g, nmeta, order, status:
                               (order[g], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_cap, 8, p8), jnp.float32)],
    )
    fill = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, p8), jnp.int32),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(nmeta, order, status, words, imms, runs_full,
      tw[:, None, :], ti[:, None, :], runs[:, None, :], gmeta[:, None, :],
      coords.reshape(n_tiles, 3, 8, p8))
    return fill.reshape(n_tiles, P)


# ---------------------------------------------------------------------------
# Kernel C v2: vectorized bit-shift stream compaction
# ---------------------------------------------------------------------------
#
# Stable stream compaction on the VPU: each kept clause must move LEFT by
# rem[t] = (# dropped clauses before t).  rem is non-decreasing in t, so
# moving elements by each power of two (LSB-first) never collides: an
# arriving element only ever lands on a slot whose occupant is junk, moved
# out this pass, or provably cannot exist (distance-parity argument).
# Wrapped-around elements from circular rolls are inert because rem[t] <= t.
# Junk left behind by a move is frozen (rem := 0) and gets overwritten by
# later arrivals.  13 passes x ~12 vector ops on (8, Tcap/8) planes
# ~= 2 us/tile, vs ~50 us/tile for the scalar walk it replaces.
#
# The same routine then compacts run-boundary records to build the per-tile
# run headers consumed by the run-dispatch interpreters.

def _roll_flat(x, s, W):
    """Shift a row-major (R, W)-flattened vector left by s (circular).

    pltpu.roll only accepts non-negative shifts; a left shift by k on an
    axis of length N is a (circular) roll by N - k."""
    R = x.shape[0]
    s = s % (R * W)
    if s == 0:
        return x
    cs, rs = s % W, s // W
    p = pltpu.roll(x, (W - cs) % W, axis=1) if cs else x
    q = pltpu.roll(p, (R - rs) % R, axis=0) if rs % R else p
    r = pltpu.roll(p, (R - rs - 1) % R, axis=0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < W - cs, q, r)


def _compact_planes(planes, rem, W, max_bits):
    """Move planes[i][t] left by rem[t] (binary decomposition, LSB first)."""
    for k in range(max_bits):
        s = 1 << k
        rem_sh = _roll_flat(rem, s, W)
        arrive = ((rem_sh >> k) & 1) == 1
        moved_out = ((rem >> k) & 1) == 1
        planes = [jnp.where(arrive, _roll_flat(p, s, W), p) for p in planes]
        rem = jnp.where(arrive, rem_sh - s, jnp.where(moved_out, 0, rem))
    return planes


def _prefix_count(mask_i32, W, max_bits):
    """Inclusive prefix sum of an int32 0/1 plane over the flat order."""
    R = mask_i32.shape[0]
    cs = mask_i32
    row = jax.lax.broadcasted_iota(jnp.int32, mask_i32.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, mask_i32.shape, 1)
    t_idx = row * W + col
    for k in range(max_bits):
        s = 1 << k
        sh = _roll_flat(cs, (R * W - s), W)  # shift right by s
        cs = cs + jnp.where(t_idx >= s, sh, 0)
    return cs


def _compact_core(w, i_, rem, n, W, max_bits=13):
    """Compact one tile's (R, W) planes.

    The binary left-moves operate on the FLAT row-major order, so the
    compacted prefix spans rows in flat order — the caller reshapes the
    returned full planes to linear tapes.  Returns
    (tw_plane (R, W), ti_plane (R, W), runs_plane (R, W), n_runs)."""
    (w, i_) = _compact_planes([w, i_], rem, W, max_bits)

    row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    t_idx = row * W + col
    valid = t_idx < n

    # ---- run extraction on the compacted op plane ----------------------
    R = w.shape[0]
    ops = w & 0xFF
    prev = _roll_flat(ops, R * W - 1, W)   # shift right by 1 (circular)
    change = jnp.where(valid,
                       jnp.where(t_idx == 0, 1,
                                 (ops != prev).astype(jnp.int32)), 0)
    n_runs = jnp.sum(change)
    cs = _prefix_count(change, W, max_bits)
    # compact (start_pos, bid) records of run heads
    rem2 = jnp.where(change == 1, t_idx - (cs - 1), 0)
    starts, bids = _compact_planes([t_idx, ops], rem2, W, max_bits)
    # counts = next start - start (last run ends at n)
    run_idx = row * W + col
    next_start = _roll_flat(starts, 1, W)
    rvalid = run_idx < n_runs
    last = run_idx == (n_runs - 1)
    counts = jnp.where(last, n - starts, next_start - starts)
    headers = jnp.where(rvalid, bids | (counts << 8), 0)
    return (jnp.where(valid, w, 0), jnp.where(valid, i_, 0),
            headers, n_runs)


def _compact_bitshift_kernel(
        # scalar prefetch
        cmeta_ref,    # (8,) int32: [n_groups, cap, rcap, max_bits,...]
        order_ref,    # (Gcap,) int32
        lens_ref,     # (n_tiles,) int32 kept count per tile
        # inputs (blocked per tile, row-major flat (8, W))
        wrw_ref,      # (1, 8, W) int32 rewritten words (op byte = branch id)
        irw_ref,      # (1, 8, W) int32 imm bits
        rem_ref,      # (1, 8, W) int32 move distance (0 for dropped)
        # outputs (compacted prefixes always fit in row 0 of the
        # row-major (8, W) plane because len <= cap = W)
        tw_ref,       # (1, 1, W) int32
        ti_ref,       # (1, 1, W) int32 (imm bits)
        runs_ref,     # (1, 1, W) int32 headers bid | count<<8
        gmeta_ref,    # (1, 1, 8) int32 [len, n_runs, overflow]
):
    g = pl.program_id(0)
    n_groups = cmeta_ref[0]
    cap = cmeta_ref[1]

    @pl.when(g < n_groups)
    def _():
        W = wrw_ref.shape[2]
        r_out = tw_ref.shape[1]
        tile = order_ref[g]
        n = lens_ref[tile]
        tw_p, ti_p, runs_p, n_runs = _compact_core(
            wrw_ref[0], irw_ref[0], rem_ref[0], n, W)
        tw_ref[0] = tw_p[:r_out]
        ti_ref[0] = ti_p[:r_out]
        runs_ref[0] = runs_p[:r_out]
        gmeta_ref[0, 0, 0] = n
        gmeta_ref[0, 0, 1] = n_runs
        gmeta_ref[0, 0, 2] = (n > cap).astype(jnp.int32)


def _make_compact_batched_kernel(tpi: int):
    """Batched compaction: ``tpi`` pre-ordered tiles per grid instance
    (amortizes per-instance overhead when thousands of tiles compact, as in
    the 3D child stage; the 2D path keeps the order-gathering variant)."""
    def kernel(cmeta_ref, lens_ref, wrw_ref, irw_ref, rem_ref,
               tw_ref, ti_ref, runs_ref, gmeta_ref):
        g = pl.program_id(0)
        n_groups = cmeta_ref[0]
        cap = cmeta_ref[1]
        W = wrw_ref.shape[3]
        r_out = tw_ref.shape[2]
        for k in range(tpi):
            slot = g * tpi + k

            @pl.when(slot < n_groups)
            def _(k=k, slot=slot):
                n = lens_ref[slot]
                tw_p, ti_p, runs_p, n_runs = _compact_core(
                    wrw_ref[0, k], irw_ref[0, k], rem_ref[0, k], n, W)
                tw_ref[0, k] = tw_p[:r_out]
                ti_ref[0, k] = ti_p[:r_out]
                runs_ref[0, k] = runs_p[:r_out]
                gmeta_ref[0, k, 0] = n
                gmeta_ref[0, k, 1] = n_runs
                gmeta_ref[0, k, 2] = (n > cap).astype(jnp.int32)
    return kernel


def compact_bitshift_batched(cmeta, lens, wrw, irw, rem, cap: int,
                             tpi: int = 16):
    """Batched kernel C v2 over PRE-ORDERED tiles (no order indirection).

    wrw/irw/rem: (G, R, W) planes, rows already in processing order; lens
    aligned.  The compacted tape lands in flat row-major order, so the
    per-tile capacity is ``cap`` = r_out * W for any r_out <= R — pass cap
    as a multiple of W.  G must be a multiple of tpi.  Returns
    (tw (G, cap) i32, ti_bits (G, cap) i32, runs (G, cap) i32,
    gmeta (G, 8) i32).
    """
    G, R, W = wrw.shape
    r_out = cap // W
    assert cap == r_out * W and 1 <= r_out <= R and G % tpi == 0
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G // tpi,),
        in_specs=[
            pl.BlockSpec((1, tpi, R, W), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpi, R, W), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpi, R, W), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tpi, r_out, W), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpi, r_out, W), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpi, r_out, W), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tpi, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
    )
    tw, ti, runs, gmeta = pl.pallas_call(
        _make_compact_batched_kernel(tpi),
        out_shape=(jax.ShapeDtypeStruct((G // tpi, tpi, r_out, W),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((G // tpi, tpi, r_out, W),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((G // tpi, tpi, r_out, W),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((G // tpi, tpi, 8), jnp.int32)),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(cmeta, lens,
      wrw.reshape(G // tpi, tpi, R, W), irw.reshape(G // tpi, tpi, R, W),
      rem.reshape(G // tpi, tpi, R, W))
    return (tw.reshape(G, cap), ti.reshape(G, cap), runs.reshape(G, cap),
            gmeta.reshape(G, 8))


def compact_bitshift(cmeta, order, lens, wrw, irw, rem,
                     gcap: int, cap: int, rcap: int):
    """Kernel C v2 wrapper.

    wrw/irw/rem: (n_tiles, R, W) int32 planes from the XLA prepass
    (pipeline2d._shorten_prepass).  Per-tile capacity ``cap`` may be any
    multiple of W up to R*W (compacted tapes land in flat row-major
    order).  Returns (tw (gcap, cap) i32, ti_bits (gcap, cap) i32,
    runs (gcap, cap) i32, gmeta (gcap, 8) i32).
    """
    n_tiles, R, W = wrw.shape
    r_out = cap // W
    assert cap == r_out * W and 1 <= r_out <= R
    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gcap,),
        in_specs=[
            pl.BlockSpec((1, R, W), lambda g, c, o, l: (o[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda g, c, o, l: (o[g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, W), lambda g, c, o, l: (o[g], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, r_out, W), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_out, W), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_out, W), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
    )
    tw, ti, runs, gmeta = pl.pallas_call(
        _compact_bitshift_kernel,
        out_shape=(jax.ShapeDtypeStruct((gcap, r_out, W), jnp.int32),
                   jax.ShapeDtypeStruct((gcap, r_out, W), jnp.int32),
                   jax.ShapeDtypeStruct((gcap, r_out, W), jnp.int32),
                   jax.ShapeDtypeStruct((gcap, 1, 8), jnp.int32)),
        grid_spec=grid,
        interpret=_on_cpu(),
    )(cmeta, order, lens, wrw, irw, rem)
    return (tw.reshape(gcap, cap), ti.reshape(gcap, cap),
            runs.reshape(gcap, cap), gmeta[:, 0])
