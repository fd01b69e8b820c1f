"""ACC min/max fusion (off by default — see tape/fuse.py ACC_DEFAULT):
semantics must match the unfused tape through every evaluator."""

import numpy as np
import pytest

from mpr_tpu import oracle
from mpr_tpu.frontend import shapes
from mpr_tpu.ops import eval_scan
from mpr_tpu.ops.tape_data import TapeData
from mpr_tpu.tape import fuse
from mpr_tpu.tape.opcodes import ACC_OP_LO, Op
from mpr_tpu.tape.tape import compile_tree


@pytest.fixture
def acc_on(monkeypatch):
    monkeypatch.setattr(fuse, "ACC_DEFAULT", True)


def _csg_shape():
    # a union/intersection tree deep enough to produce ACC chains
    parts = [shapes.circle(0.3 + 0.05 * i, 0.4 * np.cos(1.3 * i),
                           0.4 * np.sin(1.3 * i)) for i in range(6)]
    u = shapes.union(*parts)
    return shapes.difference(u, shapes.circle(0.25))


def test_acc_ops_emitted_and_match(acc_on, rng):
    tape_acc = compile_tree(_csg_shape())
    assert any(o >= ACC_OP_LO for o in tape_acc.ops), "no ACC ops emitted"
    tape_ref = compile_tree(_csg_shape(), fuse=False)
    assert tape_acc.length < tape_ref.length

    X, Y = rng.uniform(-1, 1, (2, 512)).astype(np.float32)
    np.testing.assert_allclose(oracle.eval_f(tape_acc, X, Y),
                               oracle.eval_f(tape_ref, X, Y), rtol=1e-6)
    got = np.asarray(eval_scan.eval_f(TapeData.from_tape(tape_acc), X, Y))
    np.testing.assert_allclose(got, oracle.eval_f(tape_ref, X, Y),
                               rtol=1e-5, atol=1e-6)


def test_acc_interval_and_shortening(acc_on, rng):
    """Interval soundness + shortened-tape equivalence through ACC ops
    (the oracle shorten implements the ACC rewrite table)."""
    tape = compile_tree(_csg_shape())
    for _ in range(24):
        cx, cy = rng.uniform(-1, 0.75, 2)
        w = rng.uniform(0.05, 0.25)
        lo, hi, choices = oracle.eval_i(tape, [cx], [cx + w],
                                        [cy], [cy + w])
        short = oracle.shorten(tape, choices[:, 0])
        xs = rng.uniform(cx, cx + w, 64).astype(np.float32)
        ys = rng.uniform(cy, cy + w, 64).astype(np.float32)
        full_v = oracle.eval_f(tape, xs, ys)
        short_v = oracle.eval_f(short, xs, ys)
        np.testing.assert_allclose(short_v, full_v, rtol=1e-5, atol=1e-6)
        assert np.all(full_v >= lo[0] - 1e-5)
        assert np.all(full_v <= hi[0] + 1e-5)


def test_acc_pipeline_render_exact(acc_on):
    """Staged pipeline (kernel A fwd/bwd + prepass rewrites + pixel
    kernel ACC branches) matches the brute render."""
    from mpr_tpu.render.brute import render2d_brute
    from mpr_tpu.render.pipeline2d import render2d
    tape = compile_tree(_csg_shape())
    assert any(o >= ACC_OP_LO for o in tape.ops)
    img = render2d(tape, size=256)
    ref = render2d_brute(tape, size=256)
    assert np.array_equal(img, ref)


def test_acc_3d_and_normals(acc_on):
    from mpr_tpu.render.brute import render3d_brute
    from mpr_tpu.render.pipeline3d import render3d
    s = shapes.difference(shapes.union(shapes.sphere(0.6),
                                       shapes.sphere(0.4, 0.4, 0.3, 0.2)),
                          shapes.sphere(0.3, -0.2, -0.2, 0.3))
    tape = compile_tree(s)
    assert any(o >= ACC_OP_LO for o in tape.ops)
    depth, normals = render3d(tape, size=128)
    ref = render3d_brute(tape, size=128)
    assert (depth != ref).mean() < 0.002
    m = depth > 0
    assert np.allclose(np.linalg.norm(normals[m], axis=-1), 1.0, atol=1e-3)
