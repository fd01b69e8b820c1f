"""A/B: XLA exec_time_optimization_effort vs compile wall time + frame time.

The unrolled engine pays a per-(shape, size, caps) XLA compile; on a
small host that is minutes of wall clock.  XLA exposes a global effort
knob (accepted via jit compiler_options); this measures what turning it
down buys (compile seconds) and costs (frame ms) on a real 3D ladder.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.ops import unrolled_eval as ue
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils.timing import time_frames

MODEL = sys.argv[1] if len(sys.argv) > 1 else "bear"
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512

tree = frep.load(f"/root/reference/benchmark/files/{MODEL}.frep")[0].tree
tape = compile_tree(tree)
print(f"{MODEL}: {tape.length} clauses, size {SIZE}", flush=True)
mat = jnp.asarray(camera.bench3d_view())

f = ue.build_float(tape)
fi = ue.build_interval(tape)
fd = ue.build_deriv(tape)

r = unrolled.UnrolledRenderer(tape)   # for the cap heuristics only
p0, c1, c2, _c2a, _c2b, pn = r._caps3d(SIZE)
print("caps:", p0, c1, c2, pn, flush=True)

def ladder(mat):
    return unrolled._render3d_impl(fi, f, fd, mat, SIZE, p0, c1, c2, pn,
                                   True, False)

lowered = jax.jit(ladder).lower(mat)

for label, opts in [("effort=-1.0", {"exec_time_optimization_effort": -1.0}),
                    ("default", None)]:
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=opts) if opts else \
        lowered.compile()
    t1 = time.perf_counter()
    print(f"{label}: compile {t1-t0:.1f}s", flush=True)
    d, n, c = compiled(mat)
    jax.block_until_ready(d)
    # AOT executables can't run under fori_loop; chain dispatches and
    # sync once (per-call tunnel overhead amortizes over N)
    N = 30
    t0 = time.perf_counter()
    for _ in range(N):
        d, n, c = compiled(mat)
    jax.block_until_ready(d)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{label}: frame {ms:.2f} ms, counters {np.asarray(c)}",
          flush=True)
