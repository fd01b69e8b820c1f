"""Frontend tests: tree hash-consing, DFS order, remap, .frep round-trip."""

import numpy as np
import pytest

from mpr_tpu.frontend import tree as T
from mpr_tpu.frontend import frep, shapes


def test_hash_consing():
    a = T.x() + 1.0
    b = T.x() + 1.0
    assert a is b
    assert T.x() is T.x()
    assert T.const(2.5) is T.const(2.5)


def test_constant_folding():
    c = T.const(2.0) + T.const(3.0)
    assert c.op == T.CONSTANT and c.value == 5.0
    assert T.sqrt(T.const(4.0)).value == 2.0


def test_ordered_dfs_children_first():
    s = shapes.circle(1.0)
    order = s.ordered_dfs()
    seen = set()
    for n in order:
        for c in n.children():
            assert c.id in seen
        seen.add(n.id)
    assert order[-1] is s


def test_remap():
    s = T.x() + T.y()
    moved = s.remap(T.x() - 1.0, T.y(), T.z())
    # (x-1) + y at (1, 2) == 2
    from mpr_tpu.tape.tape import compile_tree
    from mpr_tpu import oracle
    v = oracle.eval_f(compile_tree(moved), np.float32(1.0), np.float32(2.0))
    assert v == pytest.approx(2.0)


@pytest.mark.parametrize("name", [
    "prospero", "bear", "hello_world", "architecture",
    "involute_gear_2d", "involute_gear_3d"])
def test_frep_load(models_dir, name):
    ss = frep.load(str(models_dir / f"{name}.frep"))
    assert len(ss) == 1
    t = ss[0].tree
    assert len(t.ordered_dfs()) > 100


def test_frep_roundtrip(models_dir):
    ss = frep.load(str(models_dir / "bear.frep"))
    data = frep.dumps(ss)
    ss2 = frep.loads(data)
    # Hash-consing makes a structurally identical reload the SAME tree.
    assert ss2[0].tree is ss[0].tree


def test_frep_roundtrip_bytes(models_dir):
    raw = open(models_dir / "bear.frep", "rb").read()
    ss = frep.loads(raw)
    assert frep.loads(frep.dumps(ss))[0].tree is ss[0].tree


def test_tape_checkpoint_roundtrip(tmp_path):
    """Fitted-tape persistence (io/checkpoint.py)."""
    import numpy as np
    from mpr_tpu.frontend import shapes
    from mpr_tpu.io.checkpoint import load_tape, save_tape
    from mpr_tpu import oracle
    from mpr_tpu.tape.tape import compile_tree

    tape = compile_tree(shapes.ring(0.8, 0.4))
    fitted = tape.imms.copy()
    fitted[fitted == 0.8] = 0.75
    p = str(tmp_path / "ring.npz")
    save_tape(p, tape, imms=fitted)
    t2 = load_tape(p)
    xs = np.linspace(-1, 1, 33, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs)
    ref = oracle.eval_f(tape, X, Y)  # unfitted differs
    got = oracle.eval_f(t2, X, Y)
    assert not np.allclose(ref, got)
    np.testing.assert_array_equal(t2.ops, tape.ops)
    assert t2.num_slots == tape.num_slots
