"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

Runs in subprocesses because --xla_force_host_platform_device_count slows
every XLA CPU compile dramatically; only these tests pay that cost
(SURVEY.md §4: fake mesh axes on one host before real pod slices).
"""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

# Every test here pays a multi-minute 8-device XLA CPU compile in a
# subprocess; the default profile skips them (tests/conftest.py --runslow).
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _run(body: str, n_devices: int = 8):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        f" --xla_force_host_platform_device_count={n_devices}")
    r = subprocess.run([sys.executable, "-c", textwrap.dedent(body)],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def test_dryrun_multichip_8():
    """The driver's multi-chip dry run: sharded pipeline + training step."""
    _run("""
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
        print("OK")
    """)


def test_sharded_matches_single_chip():
    """Sharded render == single-device render, bit for bit."""
    _run("""
        import numpy as np
        import jax.numpy as jnp
        from mpr_tpu.frontend import shapes
        from mpr_tpu.parallel import sharded
        from mpr_tpu.render import pipeline2d
        from mpr_tpu.tape.tape import compile_tree

        tape = compile_tree(shapes.ring(0.8, 0.4))
        mesh = sharded.make_mesh(8)
        img_s = sharded.render2d_sharded(tape, size=256, mesh=mesh)
        img_1 = pipeline2d.render2d(tape, size=256)
        assert img_s.shape == img_1.shape == (256, 256)
        assert np.array_equal(img_s, img_1)
        print("OK")
    """)


def test_sharded_3d_matches_single_chip():
    """Sharded 3D render (slab per device) == single-device render."""
    _run("""
        import numpy as np
        from mpr_tpu.frontend import shapes
        from mpr_tpu.parallel import sharded
        from mpr_tpu.render import camera
        from mpr_tpu.render.pipeline3d import render3d
        from mpr_tpu.tape.tape import compile_tree

        tape = compile_tree(shapes.two_spheres())
        mesh = sharded.make_mesh(4)
        mat = camera.gui3d_view()
        d_s, n_s = sharded.render3d_sharded(tape, mat=mat, size=256,
                                            mesh=mesh)
        d_1, n_1 = render3d(tape, mat=mat, size=256)
        assert d_s.shape == d_1.shape == (256, 256)
        mism = (d_s != d_1).mean()
        assert mism < 0.002, f"depth mismatch {mism}"
        m = (d_s == d_1) & (d_s > 0)
        assert np.allclose(n_s[m], n_1[m], atol=2e-3)
        print("OK")
    """)
