"""Tape compiler tests: clause structure, slot reuse, model parity."""

import numpy as np
import pytest

from mpr_tpu.frontend import tree as T
from mpr_tpu.frontend import frep, shapes
from mpr_tpu.tape import Op, compile_tree, TapeError
from mpr_tpu import oracle


def eval_tree_np(t, X, Y, Z):
    """Direct DAG evaluation, independent of the tape compiler."""
    F = {'add': np.add, 'mul': np.multiply, 'sub': np.subtract,
         'div': np.divide, 'min': np.minimum, 'max': np.maximum}
    U = {'square': lambda a: a * a, 'sqrt': np.sqrt, 'neg': np.negative,
         'sin': np.sin, 'cos': np.cos, 'asin': np.arcsin,
         'acos': np.arccos, 'atan': np.arctan, 'exp': np.exp,
         'abs': np.abs, 'log': np.log}
    vals = {}
    with np.errstate(all="ignore"):
        for n in t.ordered_dfs():
            if n.op == T.CONSTANT:
                vals[n.id] = np.float32(n.value)
            elif n.op == T.VAR_X:
                vals[n.id] = X
            elif n.op == T.VAR_Y:
                vals[n.id] = Y
            elif n.op == T.VAR_Z:
                vals[n.id] = Z
            elif n.op in U:
                vals[n.id] = U[n.op](vals[n.lhs.id]).astype(np.float32)
            else:
                vals[n.id] = F[n.op](vals[n.lhs.id], vals[n.rhs.id]).astype(np.float32)
    return vals[t.id]


def test_circle_tape_structure():
    # circle(1) = sqrt(x^2 + y^2) - 1  (benchmark/circle.cpp:22-24 analog)
    tape = compile_tree(shapes.circle(1.0), fuse=False)
    ops = [Op(o) for o in tape.ops]
    assert ops == [Op.SQUARE_LHS, Op.SQUARE_LHS, Op.ADD_LHS_RHS,
                   Op.SQRT_LHS, Op.SUB_LHS_IMM]
    assert tape.axis_slots[0] == 1 and tape.axis_slots[1] == 2
    assert tape.axis_slots[2] == 0  # z unused in 2D
    assert tape.imms[-1] == 1.0
    # the peephole pass collapses the distance pattern to one clause
    fused = compile_tree(shapes.circle(1.0), fuse=True)
    assert [Op(o) for o in fused.ops] == [Op.HYPOT_LHS_RHS, Op.SUB_LHS_IMM]


def test_imm_folding_noncommutative():
    # 2 - x must become SUB_IMM_RHS; x - 2 must become SUB_LHS_IMM
    t1 = compile_tree(T.const(2.0) - T.x())
    assert Op(t1.ops[-1]) == Op.SUB_IMM_RHS and t1.imms[-1] == 2.0
    t2 = compile_tree(T.x() - T.const(2.0))
    assert Op(t2.ops[-1]) == Op.SUB_LHS_IMM and t2.imms[-1] == 2.0
    # commutative: const on either side -> LHS_IMM form
    t3 = compile_tree(T.const(3.0) + T.x())
    assert Op(t3.ops[-1]) == Op.ADD_LHS_IMM and t3.imms[-1] == 3.0


def test_slot_reuse():
    # A deep chain should reuse a constant number of slots.
    s = T.x()
    for _ in range(100):
        s = T.sqrt(T.square(s) + 1.0)
    tape = compile_tree(s)
    assert tape.num_slots <= 5


def test_unsupported_ops_raise():
    """mod/nanfill have no clause-algebra form and still reject (the
    reference also rejects tan/pow/... — those now LOWER instead, see
    tests/test_lowering.py)."""
    with pytest.raises(TapeError):
        compile_tree(T.Tree("mod", T.x(), T.y()))
    with pytest.raises(TapeError):
        compile_tree(T.Tree("nanfill", T.x(), T.y()))
    # formerly-rejected ops compile via lowering
    assert compile_tree(T.tan(T.x())).length
    assert compile_tree(T.x() ** T.y()).length


@pytest.mark.parametrize("name", [
    "prospero", "bear", "hello_world", "architecture",
    "involute_gear_2d", "involute_gear_3d"])
def test_models_tape_matches_tree(models_dir, name, rng):
    t = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    tape = compile_tree(t)
    from mpr_tpu.tape.tape import SLOT_CAP
    assert tape.num_slots <= SLOT_CAP
    X, Y, Z = rng.uniform(-1, 1, (3, 4096)).astype(np.float32)
    want = eval_tree_np(t, X, Y, Z)
    got = oracle.eval_f(tape, X, Y, Z)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pack_words_layout():
    tape = compile_tree(shapes.circle(1.0))
    w = tape.pack_words()
    assert w.shape[0] == tape.length + 2
    b = w.view(np.uint8).reshape(-1, 8)
    # header word: axis slots in bytes 1..3
    assert list(b[0, 1:4]) == [1, 2, 0]
    # terminator: zero opcode, result slot in byte 1
    assert b[-1, 0] == 0 and b[-1, 1] == tape.result_slot
    # final clause immediate == 1.0f
    assert np.frombuffer(b[-2, 4:8].tobytes(), dtype="<f4")[0] == 1.0
