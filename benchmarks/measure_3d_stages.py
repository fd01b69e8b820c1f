"""Per-stage timing of the unrolled 3D ladder on the real chip.

Uses _render3d_impl's debug_stage early returns ("A", "B", "Bp"/skip4,
"V", then the full frame with and without normals) and differences the
cumulative times — the same overhead-cancelling protocol as
utils/timing.time_frames.  Output drives the round-3 decision on where
3D optimization effort goes (front-to-back occlusion vs composition vs
normals).

Usage: python benchmarks/queued/measure_3d_stages.py [model ...]
"""
import faulthandler
import sys
import time

faulthandler.dump_traceback_later(1200, repeat=True)
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils.timing import time_frames

SIZE = 1024
MODELS = sys.argv[1:] or ["bear", "architecture", "involute_gear_3d"]
print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
mat = np.asarray(camera.bench3d_view())


def stage_times(r: unrolled.UnrolledRenderer, size=SIZE, n=20):
    # converge caps to the snug tier first
    for _ in range(3):
        r.render3d(mat=mat, size=size)
    p0, c1, c2, c2a, c2b, pn = r._caps3d(size)
    skip4 = r._skip4(size)
    two = r.two_phase and not skip4
    if skip4:
        c2 = 256
    if not two:
        c2a = c2b = 0
    print(f"  caps p0={p0} c1={c1} c2={c2} c2a={c2a} c2b={c2b} pn={pn} "
          f"skip4={skip4} two_phase={two}", flush=True)
    jmat = jnp.asarray(mat)

    def frame(stage, with_normals):
        def fn(m):
            out = r._r3dbg(m, size, p0, c1, c2, pn, with_normals, skip4,
                           stage, c2a, c2b)
            return out[2] if out[0] is None else out[0]
        return fn

    stages = ["A", "B"] + ([] if skip4 else ["Bp", "V"])
    times = {}
    for st in stages:
        times[st] = time_frames(frame(st, False), jmat, n=n, n0=3)
        print(f"  cum {st}: {times[st]:.2f} ms", flush=True)
    times["depth"] = time_frames(frame("", False), jmat, n=n, n0=3)
    print(f"  cum depth: {times['depth']:.2f} ms", flush=True)
    times["full"] = time_frames(frame("", True), jmat, n=n, n0=3)
    print(f"  cum full: {times['full']:.2f} ms", flush=True)
    return times, skip4


for name in MODELS:
    tree = frep.load(f"/root/reference/benchmark/files/{name}.frep")[0].tree
    tape = compile_tree(tree)
    r = unrolled.UnrolledRenderer(tape)
    # a debug-stage variant of the jitted ladder
    # NOTE with two_phase: "Bp" times through the phase-1 top-cell
    # compact, "V" through the phase-1 voxel eval; the phase-2 eval and
    # composition land in the "depth" marginal.
    r._r3dbg = jax.jit(
        lambda m, size, p0, c1, c2, pn, wn, s4, dbg, c2a=0, c2b=0:
        unrolled._render3d_impl(r.fi, r.f, r.fd, m, size, p0, c1, c2,
                                pn, wn, s4, debug_stage=dbg, c2a=c2a,
                                c2b=c2b),
        static_argnames=("size", "p0", "c1", "c2", "pn", "wn", "s4",
                         "dbg", "c2a", "c2b"))
    print(f"== {name} 3D @{SIZE} ==", flush=True)
    t0 = time.time()
    times, skip4 = stage_times(r)
    prev = 0.0
    order = ["A", "B"] + ([] if skip4 else ["Bp", "V"]) + ["depth", "full"]
    print(f"  marginal:", flush=True)
    for st in order:
        print(f"    {st:6s} {times[st] - prev:8.2f} ms", flush=True)
        prev = times[st]
    print(f"  (wall incl. compiles: {time.time() - t0:.0f}s)", flush=True)
