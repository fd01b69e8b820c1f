"""Multi-host orchestration: jax.distributed + global meshes.

The reference has no multi-device story (single GPU, SURVEY.md §2.5);
scaling past one host is TPU-native design: each process drives its local
chips, `jax.distributed.initialize` wires the cluster, and the tile-space
meshes from parallel/sharded.py span all hosts' devices — collectives
then ride ICI inside a slice and DCN across slices.

Typical pod-slice usage (one process per host):

    from mpr_tpu.parallel import distributed, sharded
    distributed.init()                # env-driven on Cloud TPU
    mesh = distributed.global_mesh()  # all devices, (dp, sp)
    img = sharded.render2d_sharded(tape, size=4096, mesh=mesh)

On Cloud TPU, `init()` with no arguments autodetects the coordinator;
elsewhere pass coordinator_address/num_processes/process_id explicitly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from .sharded import _factor2

_initialized = False


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """Initialize the cross-host runtime (idempotent; no-op for a single
    process with no coordinator configured)."""
    global _initialized
    if _initialized:
        return
    if (coordinator_address is None and num_processes is None
            and jax.process_count() == 1):
        _initialized = True   # single-process: nothing to wire
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def global_mesh(axis_names: Tuple[str, str] = ("dp", "sp")) -> Mesh:
    """A 2-axis mesh over ALL devices in the cluster, laid out so the
    ``sp`` (inner) axis stays within a host — its collectives ride ICI."""
    devs = jax.devices()
    n = len(devs)
    local = max(1, jax.local_device_count())
    dp, sp = _factor2(n)
    # prefer sp | local so each sp group is host-local
    while sp > 1 and local % sp and sp % local:
        sp //= 2
        dp = n // sp
    return Mesh(np.asarray(devs).reshape(dp, sp), axis_names)
