"""3D table on the real chip + fast_transcendentals A/B on gears."""
import faulthandler, sys, time
faulthandler.dump_traceback_later(300, repeat=True)
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from mpr_tpu import config
from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils.timing import time_frames

SIZE = 1024
MODELS = ["bear", "architecture", "involute_gear_3d"]
print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
mat = jnp.asarray(camera.bench3d_view())

def measure(r, size=SIZE, n=20):
    r.render3d(mat=np.asarray(mat), size=size)   # converge caps
    r.render3d(mat=np.asarray(mat), size=size)
    r.render3d(mat=np.asarray(mat), size=size)   # snug tier
    p0, c1, c2, pn = r._caps3d(size, True)
    skip4 = r._skip4(size)
    if skip4:
        c2 = 256
    def frame(mat):
        d, nrm, _ = r._r3(r._imms_j, mat, size, p0, c1, c2, pn, True, skip4)
        return d
    return time_frames(frame, mat, n=n, n0=3), skip4

for name in MODELS:
    tree = frep.load(f"/root/reference/benchmark/files/{name}.frep")[0].tree
    tape = compile_tree(tree)
    r = unrolled.UnrolledRenderer(tape)
    ms, skip4 = measure(r)
    print(f"{name} 3D @{SIZE} default: {ms:.2f} ms (skip4={skip4})",
          flush=True)
    if name == "involute_gear_3d":
        with config.override(fast_transcendentals=True):
            r2 = unrolled.UnrolledRenderer(tape)
            ms2, skip4b = measure(r2)
        print(f"{name} 3D @{SIZE} fast-trans: {ms2:.2f} ms "
              f"(skip4={skip4b})", flush=True)
