"""Culled vs dense fit-step cost on the real chip (VERDICT r3 item 4).

Times one gradient step at prospero@1024²: the dense soft-render VJP
(make_fit_step_unrolled, O(size²) lanes) vs the culled-pipeline step
(make_fit_step_culled, O(ambiguous tiles)).  Also checks gradient
agreement at the tanh-saturation tolerance on the real chip.

Usage: python benchmarks/measure_fit_culled.py [size]
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax.numpy as jnp
import numpy as np
import jax

from mpr_tpu.frontend import frep
from mpr_tpu.parallel import sharded
from mpr_tpu.render import unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils import compcache
from mpr_tpu.utils.timing import time_frames

compcache.enable()
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SHARP = 20.0

import faulthandler
faulthandler.dump_traceback_later(900, repeat=True)

tree = frep.load("/root/reference/benchmark/files/prospero.frep")[0].tree
tape = compile_tree(tree)
print(f"backend: {jax.default_backend()}, prospero @{SIZE}", flush=True)

t0 = time.time()
target = np.asarray(unrolled.render2d(tape, size=SIZE), np.float32)
print(f"target rendered [{time.time()-t0:.0f}s]", flush=True)
mesh = sharded.make_mesh(1)
mat = jnp.asarray(np.eye(3, dtype=np.float32))
z = jnp.float32(0.0)
imms = jnp.asarray(tape.imms)
tj = jnp.asarray(target)

step_d = sharded.make_fit_step_unrolled(tape, SIZE, mesh, lr=1e-2,
                                        sharpness=SHARP)
step_c = sharded.make_fit_step_culled(tape, SIZE, mesh, lr=1e-2,
                                      sharpness=SHARP)

t0 = time.time()
l_d, im_d = step_d(imms, tj, mat, z)
print(f"dense first step: loss {float(l_d):.6f} "
      f"[{time.time()-t0:.0f}s incl compile]", flush=True)
t0 = time.time()
l_c, im_c = step_c(imms, target, np.eye(3))
print(f"culled first step: loss {float(l_c):.6f} "
      f"counts {step_c.last_counts} caps ({step_c.p64}, {step_c.p8}) "
      f"[{time.time()-t0:.0f}s incl compile]", flush=True)

g_d = np.asarray((imms - im_d) / 1e-2)
g_c = np.asarray((imms - im_c) / 1e-2)
scale = np.abs(g_d).max()
err = np.abs(g_c - g_d).max() / max(scale, 1e-12)
print(f"grad agreement: max|dg|/max|g| = {err:.2e} (scale {scale:.3g})",
      flush=True)

ms_d = time_frames(lambda m: step_d(imms, tj, m, z)[0], mat, n=20, n0=3)
fitfn = step_c._step_for(step_c.p64, step_c.p8)
ms_c = time_frames(lambda m: fitfn(imms, tj, m, z)[0], mat, n=20, n0=3)
n8 = (SIZE // 8) ** 2
print(f"dense step:  {ms_d:.3f} ms ({SIZE*SIZE} px lanes)", flush=True)
print(f"culled step: {ms_c:.3f} ms ({step_c.last_counts[1]}*64 = "
      f"{step_c.last_counts[1]*64} px lanes of {SIZE*SIZE}; "
      f"{step_c.last_counts[1]}/{n8} 8px tiles ambiguous)", flush=True)
print(f"speedup: {ms_d/ms_c:.2f}x", flush=True)
