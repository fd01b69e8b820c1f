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
        assert (d_s == d_1).all()
        m = d_s > 0
        assert np.allclose(n_s[m], n_1[m], atol=2e-3)
        print("OK")
    """)


def test_two_process_distributed_init():
    """Two real processes wired by jax.distributed (CPU backend, 2 virtual
    devices each -> a 4-device global mesh): distributed.init() +
    global_mesh() + a sharded render must match the single-device image.
    This exercises parallel/distributed.py end-to-end (VERDICT round-1
    item 5a)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    body = f"""
        import sys
        import numpy as np
        from mpr_tpu.parallel import distributed, sharded
        from mpr_tpu.frontend import shapes
        from mpr_tpu.tape.tape import compile_tree

        pid = int(sys.argv[1])
        distributed.init(coordinator_address="127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
        import jax
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 4, jax.device_count()
        mesh = distributed.global_mesh()
        assert mesh.devices.size == 4

        tape = compile_tree(shapes.ring(0.8, 0.4))
        import jax.numpy as jnp
        from mpr_tpu.ops.tape_data import TapeData
        td = TapeData.from_tape(tape)
        from mpr_tpu.render import camera
        img = sharded._render2d_sharded_jit(
            td, jnp.asarray(camera.identity2()), jnp.float32(0.0), 256,
            mesh)
        # multi-host arrays: each process addresses only its own shards;
        # compare each against the matching oracle block
        from mpr_tpu import oracle
        p = camera.pixel_centers(256)
        X, Y = np.meshgrid(p, p)
        ref = oracle.eval_f(tape, X, Y) < 0
        assert img.shape == (256, 256)
        n_checked = 0
        for sh in img.addressable_shards:
            (ys, xs) = sh.index
            assert (np.asarray(sh.data) == ref[ys, xs]).all()
            n_checked += 1
        assert n_checked >= 1
        print("OK", pid)
    """
    import textwrap
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=2")
    procs = [subprocess.Popen(
        [sys.executable, "-c", textwrap.dedent(body), str(pid)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, f"distributed proc failed:\n{out}"
        assert "OK" in out


def test_sharded_unrolled_matches_single_chip():
    """Sharded unrolled engine (production path) == single-device unrolled,
    bit for bit: each device runs the full per-shape-compiled ladder on
    its slab of 64px tile rows."""
    _run("""
        import numpy as np
        from mpr_tpu.frontend import shapes
        from mpr_tpu.parallel import sharded
        from mpr_tpu.render import unrolled
        from mpr_tpu.tape.tape import compile_tree

        tape = compile_tree(shapes.ring(0.8, 0.4))
        mesh = sharded.make_mesh(4)
        img_s = sharded.render2d_sharded_unrolled(tape, size=256, mesh=mesh)
        img_1 = unrolled.render2d(tape, size=256)
        assert img_s.shape == img_1.shape == (256, 256)
        assert np.array_equal(img_s, img_1)
        print("OK")
    """, n_devices=4)


def test_sharded_unrolled_3d_matches_single_chip():
    """Sharded unrolled 3D == single-device unrolled 3D (slab-local
    occlusion is exact because z columns never cross slabs)."""
    _run("""
        import numpy as np
        from mpr_tpu.frontend import shapes
        from mpr_tpu.parallel import sharded
        from mpr_tpu.render import camera, unrolled
        from mpr_tpu.tape.tape import compile_tree

        tape = compile_tree(shapes.two_spheres())
        mesh = sharded.make_mesh(2)
        mat = camera.gui3d_view()
        d_s, n_s = sharded.render3d_sharded_unrolled(tape, mat=mat,
                                                     size=128, mesh=mesh)
        d_1, n_1 = unrolled.render3d(tape, mat=mat, size=128)
        assert d_s.shape == d_1.shape == (128, 128)
        assert (d_s == d_1).all()
        m = d_s > 0
        assert np.allclose(n_s[m], n_1[m], atol=1e-6)
        print("OK")
    """, n_devices=2)
