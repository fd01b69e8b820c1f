"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py; unit tests exercise the same
jitted code paths on CPU (Pallas kernels run in interpret mode there) so the
suite runs anywhere, including the multi-chip sharding tests
(SURVEY.md section 4: fake mesh axes on one host).
"""

import os
import sys

# FORCE cpu (not setdefault): the driver shell exports JAX_PLATFORMS=axon,
# and any axon initialization blocks forever when the TPU tunnel is down —
# unit tests must never depend on tunnel health.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
# JAX_PLATFORMS=cpu is not enough: the axon plugin sits on PYTHONPATH and
# jax's plugin discovery imports it during backend init, where it blocks
# on the (possibly dead) TPU tunnel even though only the CPU backend was
# requested (measured 2026-08-17).  Tests are CPU-only — drop it from
# both this process's path and the PYTHONPATH inherited by the
# test_parallel.py subprocesses.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
# The axon sitecustomize imports jax at INTERPRETER STARTUP (before this
# file runs), so jax's ``jax_platforms`` config already latched the
# driver's JAX_PLATFORMS=axon — the env writes above are too late for
# this process.  Point the already-imported jax at cpu before any
# backend initializes (registration is lazy; nothing has connected yet).
import tempfile

# isolate the persistent cache (utils/compcache.py): the default is now
# repo-local and its obs files are COMMITTED — tests must neither read
# stale committed observations nor write test-tape ones into the repo
os.environ.setdefault(
    "MPR_TPU_CACHE_DIR", tempfile.mkdtemp(prefix="mpr_tpu_test_cache_"))

# The suite is COMPILE-bound on a 1-core host: XLA:CPU's default
# optimization pipeline costs minutes per interp-pipeline executable
# (measured 2026-08-21: the same circle@128 interp frame compiles in
# ~110 s at optimization level 0 vs ~12 min at the default, with
# bit-identical output and no measurable runtime change at test sizes).
# Tests only ever compile small graphs and throw them away; production
# TPU paths never see this env (bench.py/CLI run without conftest).
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_backend_optimization_level" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_backend_optimization_level=0").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: --xla_force_host_platform_device_count=8 is NOT set globally: it
# slows every XLA CPU compile ~70x.  Sharding tests (test_parallel.py) spawn
# subprocesses with that flag instead.

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MODELS_DIR = pathlib.Path("/root/reference/benchmark/files")


@pytest.fixture(scope="session")
def models_dir():
    return MODELS_DIR


@pytest.fixture(scope="session")
def prospero_tree():
    from mpr_tpu.frontend import frep
    return frep.load(str(MODELS_DIR / "prospero.frep"))[0].tree


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute 8-device "
             "subprocess compiles; see VERDICT round-1 item 8)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def _release_xla_executables(request):
    """Drop jitted executables after each slow test.

    The benchmark-size slow tests (1024² 2D / 512² 3D pipelines,
    8-device sharded graphs) each hold multi-GB XLA:CPU executables;
    one `--runslow` process accumulating all of them was OOM-killed at
    130 GB RSS (observed 2026-08-18).  Clearing per-test trades rerun
    time for a bounded peak."""
    yield
    if "slow" in request.keywords:
        import gc
        jax.clear_caches()
        gc.collect()


# Test files whose executables are worth keeping across modules is the
# COMPLEMENT of this list: these are the modules that compile large or
# numerous unique XLA:CPU executables (big-size pipelines, per-shape
# unrolled ladders, fit steps) — the in-process state the two observed
# mid-suite segfaults correlate with (XLA:CPU backend_compile_and_load,
# ~100 tests in, 2026-08-18).  Clearing ONLY after these bounds that
# state while letting the many small modules share executables — the
# structure-erased cached_frame key (render/pipeline2d.py) makes
# cross-module reuse common, and a single interp-frame compile is
# minutes of XLA:CPU wall time (VERDICT r3 weak #5).
_HEFTY_MODULES = ("test_pipeline3d", "test_unrolled", "test_fit",
                  "test_fit_culled", "test_params", "test_stress")


@pytest.fixture(autouse=True, scope="module")
def _release_xla_executables_per_module(request):
    """Drop executables after HEFTY test files (see _HEFTY_MODULES) —
    but only under --runslow: the default suite's executables are small
    (its peak RSS is far from the 130 GB the benchmark-size slow tests
    reached), and clearing between modules forfeits the cross-module
    executable sharing the structure-erased frame keys exist for
    (several minutes of XLA:CPU recompiles on this host)."""
    yield
    if (request.config.getoption("--runslow")
            and request.module.__name__.split(".")[-1] in _HEFTY_MODULES):
        import gc
        jax.clear_caches()
        gc.collect()
