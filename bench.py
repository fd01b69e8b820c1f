#!/usr/bin/env python
"""Headline benchmark: prospero 2D @ 1024² on one chip.

Mirrors the reference's benchmark protocol (warmup + timed runs, mean frame
time; /root/reference/benchmark/stats.cpp:19-47) on its headline model/size
(README.md:109-111: 3.85596 ms on a V100).  Prints ONE JSON line.

Engine: the unrolled per-shape-compiled pipeline (render/unrolled.py),
this framework's production path for repeated rendering of a fixed shape —
the same regime the reference's 20-warmup + 100-run protocol measures.
The per-shape XLA compile happens once, outside the timed region, exactly
like the reference's CUDA module load; it is amortized across runs by the
persistent compilation cache (utils/compcache.py).  The no-recompile
interpreter pipeline (the interactive-editing path) is reported alongside
on stderr for honesty.

vs_baseline = V100 frame time / our frame time (>1 means faster than the
reference on its own hardware).
"""

import json
import os
import subprocess
import sys
import time

# V100 frame times from the reference's README table
# (/root/reference/README.md:109-111)
BASELINE_MS = {256: 5.29331, 512: 4.21138, 1024: 3.85596}


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
    from mpr_tpu.utils.timing import time_frames

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    tree = frep.load("/root/reference/benchmark/files/prospero.frep")[0].tree
    tape = compile_tree(tree)
    mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)

    r = unrolled.get_renderer(tape)
    speedups = []
    ms_1024 = None
    for size, base in BASELINE_MS.items():
        # compile + converge capacity buckets to the snug steady-state
        # tier (3 same-count frames from a cold obs cache, 2 warm)
        for _ in range(4):
            r.render2d(size=size)
            if r._snug(("2d", size)):
                break
        caps = r._caps2d(size)

        def frame(mat, size=size, caps=caps):
            img, _ = r._r2(r._imms_j, mat, z, size, *caps)
            return img

        ms = time_frames(frame, mat, n=50, n0=5)
        if size == 1024:
            ms_1024 = ms
        speedups.append(base / ms)
        print(f"prospero 2D @{size} [unrolled]: {ms:.3f} ms "
              f"(V100 {base:.3f} -> {base / ms:.2f}x)", file=sys.stderr)

    # secondary (stderr): the no-recompile interpreter engine at 1024
    td = TapeData.from_tape(tape)

    def frame_interp(mat):
        img, _ = pipeline2d.render_tile_block(
            td, mat, z, 1024, jnp.int32(0), 16, jnp.int32(0), 16)
        return img

    ms_i = time_frames(frame_interp, mat, n=50, n0=5)
    print(f"prospero 2D @1024 [interp, no per-shape compile]: {ms_i:.3f} ms "
          f"({BASELINE_MS[1024] / ms_i:.2f}x)", file=sys.stderr)

    geo = 1.0
    for s in speedups:
        geo *= s
    geo **= 1.0 / len(speedups)
    # primary metric: the reference README table's headline (1024) frame
    # time; vs_baseline: geometric-mean speedup across its three sizes
    print(json.dumps({
        "metric": "prospero_2d_1024_frame_ms",
        "value": round(ms_1024, 3),
        "unit": "ms",
        "vs_baseline": round(geo, 3),
    }))


if __name__ == "__main__":
    main()
