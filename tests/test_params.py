"""Named free parameters (frontend var(): the libfive CONST_VAR /
free-variable analog, /root/reference/gui/interpreter.cpp:125-148).

Covers: tape compilation (PARAM -> COPY_IMM + Tape.params), the
no-recompile imm-override contract, .frep round-trip through the
const-var + 'V'-record wire idiom, the Scheme (var ...) special form,
viewer slider plumbing, and params-only gradient fitting.
"""

import dataclasses

import numpy as np
import pytest

from mpr_tpu import oracle
from mpr_tpu.frontend import frep, scheme, shapes
from mpr_tpu.frontend import tree as T
from mpr_tpu.tape.tape import compile_tree


def _grid(size):
    p = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    X, Y = np.meshgrid(p, p)
    return X, Y


# ---------------------------------------------------------------------------
# tape level
# ---------------------------------------------------------------------------

def test_param_compiles_to_copy_imm():
    s = shapes.circle(T.var("r", 0.5))
    tape = compile_tree(s)
    assert "r" in tape.params and len(tape.params["r"]) == 1
    (idx,) = tape.params["r"]
    from mpr_tpu.tape.opcodes import Op
    assert int(tape.ops[idx]) == int(Op.COPY_IMM)
    assert float(tape.imms[idx]) == np.float32(0.5)


def test_param_override_matches_const_shape():
    """A param tape with overridden imms evaluates exactly like the same
    shape built with a plain constant."""
    s = shapes.circle(T.var("r", 0.5))
    tape = compile_tree(s)
    X, Y = _grid(64)
    Z = np.zeros_like(X)
    t07 = dataclasses.replace(tape, imms=tape.imms_with({"r": 0.7}))
    got = oracle.eval_f(t07, X, Y, Z)
    # reference: sqrt(x^2+y^2) - 0.7 via the same clause walk (COPY_IMM
    # then SUB_LHS_RHS), so compare against the param tape re-compiled
    # at the new default — identical structure, identical floats
    want = oracle.eval_f(compile_tree(shapes.circle(T.var("r", 0.7))),
                         X, Y, Z)
    np.testing.assert_array_equal(got, want)


def test_param_identity_and_dedup():
    a = T.var("r", 0.5)
    b = T.var("r", 0.5)
    assert a is b                      # hash-consed like constants
    assert T.var("r", 0.25) is not a   # same name, new value = new node
    assert T.var("q", 0.5) is not a
    got = T.params_of(shapes.union(shapes.circle(a),
                                   shapes.sphere(T.var("q", 0.3))))
    assert got == {"r": pytest.approx(0.5), "q": pytest.approx(0.3)}


def test_with_params_rebuild():
    s = shapes.circle(T.var("r", 0.5))
    s2 = T.with_params(s, {"r": 0.8})
    assert T.params_of(s2) == {"r": pytest.approx(0.8)}
    assert T.with_params(s, {"other": 1.0}) is s   # untouched names


def test_param_never_const_folded():
    # r*r with a const would fold; with a param it must stay two clauses
    r = T.var("r", 2.0)
    t = compile_tree(r * r - T.x())
    assert "r" in t.params
    v = oracle.eval_f(t, np.float32([1.0]), np.float32([0.0]),
                      np.float32([0.0]))
    assert v[0] == np.float32(3.0)


def test_native_backend_rejects_params():
    with pytest.raises(RuntimeError):
        compile_tree(shapes.circle(T.var("r", 0.5)), backend="native")


# ---------------------------------------------------------------------------
# pipelines run param tapes (COPY_IMM in the SOURCE tape, not just from
# shortening)
# ---------------------------------------------------------------------------

def test_pipelines_render_param_tape():
    # size 128 on purpose: shares the structure-erased interp executable
    # with test_viewer_var_override_rerenders' scene and the circle-
    # family @128 tests in test_pipeline2d/test_viewer (one XLA:CPU
    # pipeline compile across the modules, minutes saved on this host)
    from mpr_tpu.render import pipeline2d, unrolled
    s = shapes.circle(T.var("r", 0.45))
    tape = compile_tree(s)
    X, Y = _grid(128)
    want = oracle.eval_f(tape, X, Y, np.zeros_like(X)) < 0
    got_i = np.asarray(pipeline2d.render2d(tape, size=128))
    np.testing.assert_array_equal(got_i, want)
    got_u = np.asarray(unrolled.render2d(tape, size=128))
    np.testing.assert_array_equal(got_u, want)


# ---------------------------------------------------------------------------
# .frep wire format
# ---------------------------------------------------------------------------

def test_frep_param_round_trip():
    s = shapes.circle(T.var("radius", 0.5))
    s2 = shapes.sphere(T.var("radius", 0.5))   # shared param node
    data = frep.dumps([frep.ArchiveShape(tree=s, name="c"),
                       frep.ArchiveShape(tree=s2, name="s")])
    back = frep.loads(data)
    assert T.params_of(back[0].tree) == {"radius": 0.5}
    assert T.params_of(back[1].tree) == {"radius": 0.5}
    X, Y = _grid(32)
    Z = np.zeros_like(X)
    np.testing.assert_array_equal(
        oracle.eval_f(compile_tree(s), X, Y, Z),
        oracle.eval_f(compile_tree(back[0].tree), X, Y, Z))


def test_frep_bare_var_free_loads_as_param():
    """A valueless VAR_FREE leaf (libfive binds it externally) loads as a
    0-valued param instead of rejecting — the reference's tape compiler
    errors on VAR_FREE (/root/reference/src/tape.cpp:182-196)."""
    idx = frep.PACKED_OPCODES.index
    data = bytes([ord("T")]) + b'"s""d"'
    data += bytes([idx("var-free")])
    data += bytes([idx("var-x")])
    # sub(var-free, var-x): rhs id serialized first
    import struct
    data += bytes([idx("sub")]) + struct.pack("<II", 1, 0)
    data += b"\xff"
    data += b"V" + struct.pack("<I", 0) + b'"offset"'
    data += b"\xff"
    (shape,) = frep.loads(data)
    assert T.params_of(shape.tree) == {"offset": 0.0}
    tape = compile_tree(shape.tree)
    v = oracle.eval_f(dataclasses.replace(
        tape, imms=tape.imms_with({"offset": 2.0})),
        np.float32([0.5]), np.float32([0.0]), np.float32([0.0]))
    assert v[0] == np.float32(1.5)


def test_params_survive_checkpoint_and_decompile(tmp_path):
    """fit --out-frep chain: a fitted tape's .npz checkpoint keeps the
    param mapping, and the decompiler emits var() nodes (at the fitted
    values) so the exported .frep still declares the variable."""
    from mpr_tpu.io import checkpoint
    from mpr_tpu.tape.decompile import tape_to_tree
    tape = compile_tree(shapes.circle(T.var("r", 0.5)))
    p = str(tmp_path / "fit.npz")
    checkpoint.save_tape(p, tape, imms=tape.imms_with({"r": 0.72}))
    t2 = checkpoint.load_tape(p)
    assert t2.params == tape.params
    tr = tape_to_tree(t2)
    assert T.params_of(tr) == {"r": pytest.approx(0.72)}
    back = frep.loads(frep.dumps([frep.ArchiveShape(tree=tr)]))
    assert T.params_of(back[0].tree) == {"r": pytest.approx(0.72)}


# ---------------------------------------------------------------------------
# Scheme (var ...) special form
# ---------------------------------------------------------------------------

def test_scheme_var_form():
    res = scheme.run_string("""
(var r 0.35 0.1 0.9)
(circle r)
(move (circle (var r2 0.2)) (list 0.5 0))
""")
    assert res.vars == {"r": (0.35, 0.1, 0.9),
                        "r2": (0.2, -0.8, 1.2)}   # default range v +- 1
    assert len(res.shapes) == 2                   # bare (var ...) is not
    assert T.params_of(res.shapes[0]) == {"r": pytest.approx(0.35)}


def test_scheme_var_in_rotation_and_vector():
    res = scheme.run_string("""
(rotate-z (rectangle (list -0.4 -0.1) (list 0.4 0.1)) (var ang 0.3))
(move (circle 0.2) (list (var dx 0.1) 0))
""")
    t = compile_tree(res.shapes[0])
    assert "ang" in t.params
    t2 = compile_tree(res.shapes[1])
    assert "dx" in t2.params


def test_scheme_var_bad_arity():
    with pytest.raises(scheme.SchemeError):
        scheme.run_string("(var r)")
    with pytest.raises(scheme.SchemeError):
        scheme.run_string("(var 1.5 2.0)")


# ---------------------------------------------------------------------------
# viewer plumbing
# ---------------------------------------------------------------------------

def test_viewer_var_override_rerenders():
    from mpr_tpu import viewer
    src = "(var r 0.3 0.1 0.8)\n(circle r)\n"
    cam = {"yaw": 0.0, "pitch": 0.0, "persp": 0.0,
           "scale": 1.0, "panx": 0.0, "pany": 0.0}
    img1, _, v1 = viewer.render_scene(src, cam, "2d", 128, "interp",
                                      "scene.io")
    img2, _, v2 = viewer.render_scene(src, cam, "2d", 128, "interp",
                                      "scene.io", var_values={"r": 0.6})
    assert (img2 > 0).sum() > (img1 > 0).sum() * 2
    assert v1["r"] == (0.3, 0.1, 0.8)
    assert v2["r"] == (0.6, 0.1, 0.8)     # override shown, range kept


def test_viewer_python_script_vars():
    from mpr_tpu import viewer
    src = "shape = circle(var('r', 0.4))\n"
    shapes_, settings = viewer._eval_src(src, "scene.py")
    assert settings["vars"]["r"][0] == pytest.approx(0.4)


def test_viewer_save_frep_bakes_overrides(tmp_path):
    from mpr_tpu import viewer
    script = tmp_path / "scene.io"
    script.write_text("(circle (var r 0.3))\n")
    out, err = viewer._save_frep(script.read_text(), str(script),
                                 var_values={"r": 0.55})
    assert not err, err
    (shape,) = frep.load(out)
    assert T.params_of(shape.tree) == {"r": pytest.approx(0.55)}


# ---------------------------------------------------------------------------
# params-only fitting (libfive-Studio-style direct manipulation by
# gradient descent)
# ---------------------------------------------------------------------------

def test_fit_params_only_moves_only_params():
    import jax.numpy as jnp
    from mpr_tpu.parallel import sharded
    from mpr_tpu.render import camera

    tape = compile_tree(shapes.circle(T.var("r", 0.5)))
    mask = np.zeros(tape.length, np.float32)
    for idxs in tape.params.values():
        mask[list(idxs)] = 1.0
    mesh = sharded.make_mesh()
    size = 64
    X, Y = _grid(size)
    target = (oracle.eval_f(compile_tree(shapes.circle(0.7)), X, Y,
                            np.zeros_like(X)) < 0).astype(np.float32)
    step = sharded.make_fit_step_unrolled(tape, size, mesh, lr=3e-2,
                                          grad_mask=mask)
    imms = jnp.asarray(tape.imms)
    mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)
    l0 = None
    for i in range(120):
        loss, imms = step(imms, jnp.asarray(target), mat, z)
        if l0 is None:
            l0 = float(loss)
    imms = np.asarray(imms)
    frozen = mask == 0.0
    np.testing.assert_array_equal(imms[frozen], tape.imms[frozen])
    (ri,) = tape.params["r"]
    assert abs(float(imms[ri]) - 0.7) < 0.03
    assert float(loss) < l0 * 0.2
