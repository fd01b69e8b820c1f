"""Native (C++) tape compiler vs the pure-Python reference passes.

The native path must be BIT-IDENTICAL: same clause order (including the
op-run scheduler's tie-breaking), slots, immediates, and metadata."""

import numpy as np
import pytest

from mpr_tpu.frontend import frep, shapes
from mpr_tpu import native
from mpr_tpu.tape.tape import TapeError, compile_tree

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native toolchain unavailable")

MODELS = ["prospero", "bear", "architecture", "hello_world",
          "involute_gear_2d", "involute_gear_3d"]


def _assert_equal(a, b):
    np.testing.assert_array_equal(a.ops, b.ops)
    np.testing.assert_array_equal(a.outs, b.outs)
    np.testing.assert_array_equal(a.lhss, b.lhss)
    np.testing.assert_array_equal(a.rhss, b.rhss)
    np.testing.assert_array_equal(a.imms, b.imms)
    assert a.axis_slots == b.axis_slots
    assert a.result_slot == b.result_slot
    assert a.num_slots == b.num_slots
    assert a.num_choices == b.num_choices


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.parametrize("schedule", ["opruns", "dfs"])
def test_native_matches_python(models_dir, name, schedule):
    tree = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    py = compile_tree(tree, schedule=schedule, backend="python")
    nat = compile_tree(tree, schedule=schedule, backend="native")
    _assert_equal(py, nat)


def test_native_shapes_lib():
    for t in [shapes.circle(0.7), shapes.two_spheres(), shapes.menger(2),
              shapes.gyroid(), shapes.ring()]:
        _assert_equal(compile_tree(t, backend="python"),
                      compile_tree(t, backend="native"))


def test_native_speed(models_dir):
    import time
    tree = frep.load(str(models_dir / "prospero.frep"))[0].tree
    compile_tree(tree, backend="native")
    t0 = time.perf_counter()
    for _ in range(5):
        compile_tree(tree, backend="native")
    native_ms = (time.perf_counter() - t0) / 5 * 1e3
    # prospero (7866 nodes): Python takes ~66 ms; native must be well under
    assert native_ms < 20, f"native compile too slow: {native_ms:.1f} ms"
