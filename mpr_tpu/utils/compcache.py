"""Persistent XLA compilation cache + per-shape capacity observations.

The unrolled engine (render/unrolled.py) trades per-shape XLA compiles
for 10-30x faster clause evaluation; both sides of that trade are
amortized here:

  * :func:`enable` turns on JAX's persistent compilation cache so a
    shape's stage graphs compile once per (tape, size, caps) across
    processes — the moral equivalent of the reference shipping
    precompiled CUDA kernels per shape (dump_tape -> brute.cu paste,
    /root/reference/benchmark/dump_tape.cpp).
  * :func:`load_obs`/:func:`save_obs` persist the observed ambiguous-set
    sizes per (tape, size) so later processes start with snug capacity
    buckets instead of paying heuristic-cap compiles + overflow retries.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

_DEFAULT_DIR = os.environ.get(
    "MPR_TPU_CACHE_DIR", os.path.expanduser("~/.cache/mpr_tpu"))
_enabled = False


def cache_dir() -> Path:
    p = Path(_DEFAULT_DIR)
    p.mkdir(parents=True, exist_ok=True)
    return p


def enable() -> None:
    """Idempotently enable the persistent XLA compilation cache.

    TPU backend only: XLA:CPU persists AOT code whose target-machine
    feature lists can mismatch across processes on this host (loader
    warns about possible SIGILL), and CPU compiles are cheap anyway."""
    global _enabled
    if _enabled:
        return
    import jax
    if jax.default_backend() != "tpu":
        _enabled = True
        return
    jax.config.update("jax_compilation_cache_dir",
                      str(cache_dir() / "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True


def _obs_path(tape_key: str) -> Path:
    return cache_dir() / f"obs_{tape_key[:16]}.json"


def load_obs(tape_key: str) -> dict:
    """Load {(kind, size): counts} observations for a tape (string keys
    on disk: "2d:256" / "3d:1024")."""
    try:
        raw = json.loads(_obs_path(tape_key).read_text())
    except (OSError, ValueError):
        return {}
    out = {}
    for k, v in raw.items():
        kind, size = k.split(":")
        out[(kind, int(size))] = tuple(v)
    return out


def save_obs(tape_key: str, obs: dict) -> None:
    raw = {f"{kind}:{size}": list(v) for (kind, size), v in obs.items()}
    try:
        _obs_path(tape_key).write_text(json.dumps(raw))
    except OSError:
        pass
