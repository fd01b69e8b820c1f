"""2D large sizes (2048/4096) with snug steady-state caps, prospero."""
import faulthandler, sys
faulthandler.dump_traceback_later(600, repeat=True)
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils.timing import time_frames

print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
tree = frep.load("/root/reference/benchmark/files/prospero.frep")[0].tree
tape = compile_tree(tree)
r = unrolled.get_renderer(tape)
mat = jnp.asarray(camera.identity2())
z = jnp.float32(0.0)
for size in (2048, 4096):
    r.render2d(size=size)
    r.render2d(size=size)
    r.render2d(size=size)   # snug tier
    caps = r._caps2d(size)
    def frame(mat, size=size, caps=caps):
        img, _ = r._r2(r._imms_j, mat, z, size, *caps)
        return img
    ms = time_frames(frame, mat, n=20, n0=3)
    print(f"prospero 2D @{size} snug: {ms:.3f} ms", flush=True)
