"""Typed runtime configuration.

The reference's knobs are compile-time ``#define``s
(NUM_TILES/NUM_THREADS/SUBTAPE_CHUNK_SIZE/NUM_SUBTAPES,
/root/reference/inc/parameters.hpp:14-22) plus CMake options.  Here the
equivalent capacities and batching factors live in one dataclass; jitted
pipelines treat the active config as static, so changing it triggers a
(cached-per-value) recompile, exactly like rebuilding the reference with
different defines — but at runtime.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager


@dataclasses.dataclass(frozen=True)
class Config:
    # -- 3D stage capacities (pipeline3d._caps multipliers) -----------------
    # ambiguous 64^3 tiles per slab: min(n_tiles, max(64, p0_scale*n*n_rows))
    p0_scale: int = 8
    # ambiguous 16^3 cells: min(p0*64, max(512, c1_scale*n*n_rows))
    c1_scale: int = 96
    # per-cell shortened-tape capacity = tape capacity // cap_div
    cap_div: int = 2
    # cells per voxel-kernel grid instance (amortizes instance overhead)
    cpi: int = 4
    # tiles per compaction-kernel instance
    tpi: int = 16
    # -- kernel A lane blocking ---------------------------------------------
    block_lanes: int = 512
    # -- interval semantics ---------------------------------------------------
    # False (default) preserves the reference quirk: interval sin/cos are
    # always [-1, 1] (/root/reference/inc/gpu_interval.hpp:346-380, dead
    # code after the early return).  True uses the tight ranges
    # (interval_math.i_sin_tight/i_cos_tight) in the oracle and the
    # unrolled engine; the Pallas interpreter engine always keeps the
    # quirk (its shortening-parity tests pin the reference semantics).
    tight_sincos: bool = False
    # True applies conservative outward widening (>= 1 ulp per interval
    # op, interval_math.widen) in the oracle, kernel A, and the unrolled
    # engine's interval stage.  Closes the documented divergence from the
    # reference's directed-rounding intrinsics
    # (/root/reference/inc/gpu_interval.hpp:18-43 __fadd_rd/__fadd_ru):
    # round-to-nearest endpoints can under-cover by ~1 ulp/op; widened
    # endpoints cannot.  Cost: slightly looser boxes -> marginally more
    # ambiguous tiles (measured in docs/perf_notes.md).
    widen_intervals: bool = False
    # -- unrolled-engine transcendentals --------------------------------------
    # True routes asin/acos/atan in the unrolled evaluators through the
    # Cephes polynomial forms (ops/transcendental.py, ~2 ulp f32) that the
    # Pallas interpreter kernels already use, instead of XLA's builtin
    # lowering.  gears' voxel stage is transcendental-bound (3.85 vs ~1.2
    # ns/clause, docs/perf_notes.md); flip the default once measured on a
    # real chip.
    fast_transcendentals: bool = False
    # -- SSAO (render/effects.py) ---------------------------------------------
    # "static": gather-free sphere-sampling AO — per-sample screen offsets
    # are compile-time constants, so every depth lookup is a shifted-image
    # read (zero per-index cost; the TPU random-gather wall is ~10 ns/idx,
    # docs/perf_notes.md round-4/5).  "gather": the reference's exact
    # per-pixel TBN-rotated hemisphere mechanism
    # (/root/reference/src/effects.cu:17-89) — use for mechanism parity.
    ssao_mode: str = "static"
    # Raw-AO downsample factor before the full-res edge-aware blur.
    # 0 = auto: 1 (full-res) for static mode and small images; 2 for
    # gather mode at >=512^2 where full-res costs 727 ms @1024.
    ao_scale: int = 0
    # -- unrolled-engine compile effort ---------------------------------------
    # XLA's exec_time_optimization_effort for the unrolled engine's
    # per-shape compiles: 0.0 = XLA default; negative trades runtime for
    # compile wall time (the unrolled engine's first-frame latency).
    # See docs/perf_notes.md round 3 for the measured trade on v5e; the
    # benchmark path keeps 0.0.
    compile_effort: float = 0.0


_active = Config()


def get() -> Config:
    return _active


def set_config(cfg: Config) -> None:
    global _active
    _active = cfg


@contextmanager
def override(**kwargs):
    """Temporarily override config fields:
    ``with config.override(c1_scale=192): render3d(...)``."""
    global _active
    old = _active
    _active = dataclasses.replace(old, **kwargs)
    try:
        yield _active
    finally:
        _active = old
