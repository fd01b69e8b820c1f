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
        for _ in range(4):
            r.render3d(mat=mat, size=size)
            if r._snug(("3d", size)):
                break
        p0, c1, c2, pn = r._caps3d(size, True)
        skip4 = r._skip4(size)
        if skip4:
            c2 = 256

        def frame(m, size=size, caps=(p0, c1, c2, pn), skip4=skip4):
            d, nrm, _ = r._r3(r._imms_j, m, size, *caps, True, skip4)
            return d

        ms = time_frames(frame, jmat, n=20, n0=3)
        wall = time.time() - t0
        rec = {"model": name, "size": size, "ms": round(ms, 2),
               "skip4": bool(skip4),
               "caps": [p0, c1, c2, pn], "wall_s": round(wall, 1)}
        with OUT.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if ms > STOP_MS:
            print(f"{name}: {ms:.0f} ms > {STOP_MS:.0f} ms rule, "
                  "stopping size sweep", flush=True)
            break
