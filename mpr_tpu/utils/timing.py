"""Frame timing that works over remote-dispatch device tunnels.

``block_until_ready`` does not actually block under the axon TPU tunnel
(measured: a 1.4 TFLOP matmul chain "completes" in 0.1 ms), so naive
per-frame sync timing reads ~0.  The robust protocol, mirroring the
reference's N-run mean (/root/reference/benchmark/stats.cpp:19-47):

  1. wrap the frame in a ``lax.fori_loop`` whose carry perturbs an input
     by ``carry * 1e-38`` — numerically a no-op (f32 round-trips to the
     identical value) but a real data dependence, so iterations serialize
     and XLA cannot hoist the loop-invariant render;
  2. fetch the final scalar carry to the host (4-byte transfer forces
     completion of the whole chain);
  3. time two loop lengths and divide the difference — dispatch + RPC +
     fetch constants cancel.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_frame_loop(frame: Callable, *args, perturb_arg: int = 0):
    """Build loop(n) running ``frame(*args)`` n times, serialized.

    ``frame`` must return an array (or tuple whose first element is an
    array); ``args[perturb_arg]`` must be a float array whose values the
    frame actually consumes (e.g. the camera matrix).

    ``n`` is a TRACED loop bound: every loop length shares ONE lowering
    and ONE executable.  (With a static bound, timing at two lengths
    lowered the whole frame twice — at 220 s per lowering for the
    Pallas-kernel pipelines on a 1-core host, that dominated entire
    benchmark runs; measured 2026-08-20.)
    """
    @jax.jit
    def loop(n, *a):
        def body(i, carry):
            aa = list(a)
            aa[perturb_arg] = aa[perturb_arg] + carry * 1e-38
            out = frame(*aa)
            lead = out[0] if isinstance(out, tuple) else out
            return carry + jnp.sum(lead.astype(jnp.float32)) * 1e-20
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return lambda n: loop(jnp.int32(n), *args)


def time_frames(frame: Callable, *args, n: int = 50, n0: int = 5,
                warmup: int = 2, perturb_arg: int = 0) -> float:
    """Mean ms per frame of ``frame(*args)``, overhead-cancelled."""
    loop = make_frame_loop(frame, *args, perturb_arg=perturb_arg)

    def run(k):
        t0 = time.perf_counter()
        v = np.asarray(loop(k))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    for _ in range(warmup):
        run(n0)
        run(n)
    t_small = min(run(n0) for _ in range(2))
    t_big = min(run(n) for _ in range(2))
    return (t_big - t_small) / (n - n0) * 1e3
