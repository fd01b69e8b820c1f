"""The reference's full 3D table protocol on the real chip.

Mirrors /root/reference/benchmark/render_3d_table.cpp:51: sizes 256,
512, 1024, 1536, 2048 per model, stopping past the 750 ms rule (the
reference stops growing a model's row once a frame exceeds 750 ms).
With normals, bench3d_view camera, snug steady-state caps.

Results append INCREMENTALLY to benchmarks/results/table3d_r4.jsonl —
a timeout loses at most the row in flight (round-3 lesson: 4 of 7
queued measurements died whole to timeouts).  Compiles persist via the
export-artifact + XLA caches, so reruns skip completed work.

Usage: python benchmarks/measure_3d_table.py [model ...]
"""
import faulthandler
import json
import pathlib
import sys
import time

faulthandler.dump_traceback_later(1800, repeat=True)
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils.timing import time_frames

SIZES = [256, 512, 1024, 1536, 2048]
STOP_MS = 750.0
MODELS = sys.argv[1:] or ["bear", "architecture", "involute_gear_3d"]
OUT = pathlib.Path("/root/repo/benchmarks/results/table3d_r4.jsonl")
done = set()
if OUT.exists():
    for line in OUT.read_text().splitlines():
        rec = json.loads(line)
        done.add((rec["model"], rec["size"]))

print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
mat = np.asarray(camera.bench3d_view())
jmat = jnp.asarray(mat)

for name in MODELS:
    tree = frep.load(f"/root/reference/benchmark/files/{name}.frep")[0].tree
    tape = compile_tree(tree)
    r = unrolled.UnrolledRenderer(tape)
    for size in SIZES:
        if (name, size) in done:
            print(f"{name} @{size}: already recorded", flush=True)
            continue
        t0 = time.time()
        frame = r.steady_frame3d(mat, size)
        skip4 = r._skip4_key(("3d", size))
        caps = list(r._caps3d(size))
        ms = time_frames(frame, jmat, n=20, n0=3)
        wall = time.time() - t0
        rec = {"model": name, "size": size, "ms": round(ms, 2),
               "skip4": bool(skip4), "two_phase": bool(r.two_phase),
               "caps": caps, "wall_s": round(wall, 1)}
        with OUT.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if ms > STOP_MS:
            print(f"{name}: {ms:.0f} ms > {STOP_MS:.0f} ms rule, "
                  "stopping size sweep", flush=True)
            break
