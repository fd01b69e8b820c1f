"""Tape -> Tree decompiler round-trip tests.

The reconstruction must be value-exact: a recompiled tape computes the
same dataflow (folding only removes bit-exact identity clauses), so the
NumPy oracle must agree bit-for-bit at random evaluation points.
"""

import numpy as np
import pytest

from mpr_tpu import oracle
from mpr_tpu.frontend import frep, shapes
from mpr_tpu.tape.decompile import tape_to_tree
from mpr_tpu.tape.tape import compile_tree

from test_random_trees import _TREES

MODELS = ["hello_world", "prospero", "involute_gear_2d", "involute_gear_3d",
          "architecture", "bear"]


def _pts(n=4096, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1, 1, n).astype(np.float32),
            rng.uniform(-1, 1, n).astype(np.float32),
            rng.uniform(-1, 1, n).astype(np.float32))


def _assert_roundtrip(tape):
    t2 = tape_to_tree(tape)
    tape2 = compile_tree(t2)
    x, y, z = _pts()
    a = oracle.eval_f(tape, x, y, z)
    b = oracle.eval_f(tape2, x, y, z)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("i", range(len(_TREES)))
def test_roundtrip_random_trees(i):
    _assert_roundtrip(_TREES[i][1])


@pytest.mark.parametrize("name", MODELS)
def test_roundtrip_models(name, models_dir):
    tree = frep.load(str(models_dir / f"{name}.frep"))[0].tree
    # both schedules and both fusion settings decompile to the same value
    _assert_roundtrip(compile_tree(tree, fuse=True))
    _assert_roundtrip(compile_tree(tree, schedule="dfs", fuse=False))


def test_roundtrip_through_frep(tmp_path):
    """Decompiled trees serialize to .frep and survive the archive."""
    tape = compile_tree(shapes.ring())
    p = tmp_path / "ring.frep"
    frep.dump([frep.ArchiveShape(tree=tape_to_tree(tape), name="ring")],
              str(p))
    back = compile_tree(frep.load(str(p))[0].tree)
    x, y, z = _pts()
    np.testing.assert_array_equal(oracle.eval_f(tape, x, y, z),
                                  oracle.eval_f(back, x, y, z))


def test_fitted_imms_travel():
    """Changed immediates (the fit path) land in the reconstruction."""
    tape = compile_tree(shapes.circle(0.5))
    imms = tape.imms.copy()
    # the circle's radius immediate: find the SUB imm equal to 0.5
    idx = int(np.where(imms == np.float32(0.5))[0][0])
    imms[idx] = 0.75
    import dataclasses
    fitted = dataclasses.replace(tape, imms=imms)
    t2 = tape_to_tree(fitted)
    x, y, z = _pts()
    got = oracle.eval_f(compile_tree(t2), x, y, z)
    want = oracle.eval_f(compile_tree(shapes.circle(0.75)), x, y, z)
    np.testing.assert_array_equal(got, want)


def test_reads_before_write_rejected():
    tape = compile_tree(shapes.circle(0.5))
    bad = tape.lhss.copy()
    bad[0] = 97                           # slot no clause ever wrote
    import dataclasses
    with pytest.raises(ValueError, match="before any write"):
        tape_to_tree(dataclasses.replace(tape, lhss=bad))
