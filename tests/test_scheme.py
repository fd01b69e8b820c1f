"""Scheme (.io) frontend + vector font tests.

The reference evaluates its example scenes with Guile + libfive
(/root/reference/gui/interpreter.cpp); these tests prove the native
Scheme frontend runs the reference's own example scripts
(/root/reference/gui/examples/*.io) end-to-end: parse -> shapes -> tape
-> oracle render, with geometry close to the reference's exported .frep
archives.
"""

import numpy as np
import pytest

from mpr_tpu import oracle
from mpr_tpu.frontend import font, frep, scheme
from mpr_tpu.frontend.scheme import SchemeError, run_string
from mpr_tpu.frontend.tree import Tree
from mpr_tpu.tape.tape import compile_tree

EXAMPLES = "/root/reference/gui/examples"


def _fill(tree, W=96, H=96, z=0.0, lo=-1.0, hi=1.0):
    """Fraction of the [-1,1]^2 slice at depth z that is inside."""
    tape = compile_tree(tree)
    xs = np.linspace(lo, hi, W, dtype=np.float32)
    ys = np.linspace(hi, lo, H, dtype=np.float32)
    X, Y = np.meshgrid(xs, ys)
    v = oracle.eval_f(tape, X.ravel(), Y.ravel(),
                      np.full(X.size, z, np.float32))
    return (v.reshape(H, W) < 0).astype(np.float32)


# ---------------------------------------------------------------------------
# scheme core
# ---------------------------------------------------------------------------

def test_reader_and_arithmetic():
    r = run_string("(+ 1 2 (* 3 4))")
    assert r.shapes == []
    assert run_string("(define v (+ 1 2)) v").env.lookup("v") == 3
    assert run_string("(define v (/ 2))").env.lookup("v") == 0.5
    assert run_string("(define v (/ 12 3 2))").env.lookup("v") == 2.0
    assert run_string("(define v (- 5))").env.lookup("v") == -5
    assert run_string("(define v (max 1 7 3))").env.lookup("v") == 7


def test_vector_literals_and_quote():
    env = run_string("(define v [1 (+ 1 1) 3])").env
    assert env.lookup("v") == [1, 2, 3]
    env = run_string("(define v '(a b))").env
    assert [str(s) for s in env.lookup("v")] == ["a", "b"]


def test_let_star_shadowing_and_define_function():
    src = """
    (define (fact n) (if (<= n 1) 1 (* n (fact (- n 1)))))
    (define v (fact 6))
    (define w (let* ((a 1) (a (+ a 10)) (b (* a 2))) (+ a b)))
    """
    env = run_string(src).env
    assert env.lookup("v") == 720
    assert env.lookup("w") == 33


def test_map_iota_apply_lambda():
    env = run_string(
        "(define v (apply + (map (lambda (i) (* i i)) (iota 5))))").env
    assert env.lookup("v") == 30
    env = run_string("(define v (iota 3 10 2))").env
    assert env.lookup("v") == [10, 12, 14]


def test_sequence_threads_shape_through_calls():
    # (sequence x (f a...) ...) threads the value as the FIRST argument —
    # libfive's sequence macro semantics
    res = run_string("""
    (sequence (circle 0.5)
      (move [0.25 0])
      (difference (circle 0.2)))
    """)
    assert len(res.shapes) == 1
    img = _fill(res.shapes[0])
    # moved circle: inside at (0.6, 0), hole at (0.1, 0) (circle 0.2 at
    # the origin), outside at (-0.5, 0)
    tape = compile_tree(res.shapes[0])
    v = oracle.eval_f(tape, np.float32([0.6, 0.1, -0.5]),
                      np.float32([0.0, 0.0, 0.0]), np.float32([0, 0, 0]))
    assert v[0] < 0 and v[1] > 0 and v[2] > 0
    assert 0.1 < img.mean() < 0.2


def test_lambda_shape_builds_trees():
    res = run_string("(lambda-shape (x y z) (- (sqrt (+ (square x) "
                     "(square y))) 0.8))")
    assert len(res.shapes) == 1 and isinstance(res.shapes[0], Tree)
    assert abs(_fill(res.shapes[0]).mean() - np.pi * 0.4 ** 2) < 0.02


def test_block_comments_and_errors():
    assert run_string("#| nested #| deep |# out |# (+ 1 2)").shapes == []
    with pytest.raises(SchemeError, match="unbound variable"):
        run_string("(nonexistent 1)")
    with pytest.raises(SchemeError, match="line 2"):
        run_string("(+ 1 1)\n(oops)")
    with pytest.raises(SchemeError):
        run_string("(+ 1")


def test_directives_recorded():
    res = run_string("(set-bounds! [-50 -50 -20] [50 50 20])"
                     "(set-quality! 8)(set-resolution! 15)")
    assert res.bounds == ((-50.0, -50.0, -20.0), (50.0, 50.0, 20.0))
    assert res.quality == 8.0 and res.resolution == 15.0


def test_shape_builtins_match_python_stdlib():
    from mpr_tpu.frontend import shapes as py_shapes
    res = run_string("(union (sphere 0.6) (box [-0.2 -0.2 -0.2] "
                     "[0.9 0.2 0.2]))")
    want = py_shapes.union(py_shapes.sphere(0.6),
                           py_shapes.box(-0.2, 0.9, -0.2, 0.2, -0.2, 0.2))
    # hash-consing: identical constructions are the same node
    assert res.shapes[0] is want


# ---------------------------------------------------------------------------
# vector font
# ---------------------------------------------------------------------------

def test_text_basic_metrics():
    img = _fill(font.text("o", -0.5, -0.3), lo=-1, hi=1)
    assert img.sum() > 0
    # empty text renders nothing
    assert _fill(font.text(""), lo=-1, hi=1).sum() == 0
    # newline moves the pen down: two lines span more y than one
    one = _fill(font.text("l", -0.2, -0.2))
    two = _fill(font.text("l\nl", -0.2, 0.2))
    rows1 = np.where(one.any(axis=1))[0]
    rows2 = np.where(two.any(axis=1))[0]
    assert (rows2[-1] - rows2[0]) > 1.7 * (rows1[-1] - rows1[0])


def test_text_all_glyphs_have_ink():
    for ch, (width, prims) in font.GLYPHS.items():
        img = _fill(font.text(ch, -0.4, -0.3))
        assert img.sum() > 0, f"glyph {ch!r} rendered empty"
        assert width > 0 and prims


def test_text_unknown_glyph_visible():
    img = _fill(font.text("\x7f", -0.4, -0.3))
    assert img.sum() > 0          # missing glyphs draw a visible box


def test_text_differentiable_tape():
    # text compiles to a tape whose imms are a parameter vector like any
    # other shape (the framework's differentiability contract)
    tape = compile_tree(font.text("hi", -0.5, -0.3))
    assert tape.length > 20
    assert np.isfinite(tape.imms).all()


# ---------------------------------------------------------------------------
# the reference's own example scripts
# ---------------------------------------------------------------------------

def test_hello_world_io_matches_reference_frep():
    res = scheme.run_file(f"{EXAMPLES}/hello_world.io")
    assert len(res.shapes) == 1
    mine = _fill(res.shapes[0], z=0.0)
    ref = _fill(frep.load("/root/reference/benchmark/files/"
                          "hello_world.frep")[0].tree, z=0.0)
    # same scene (different font): ink fractions within 2x, overlapping
    # extents within a few cells
    assert 0.5 < mine.mean() / ref.mean() < 2.0
    rm, cm = np.where(mine > 0)
    rr, cr = np.where(ref > 0)
    assert abs(rm.mean() - rr.mean()) < 8 and abs(cm.mean() - cr.mean()) < 8


def test_prospero_io_authors_the_page():
    res = scheme.run_file(f"{EXAMPLES}/prospero.io")
    tape = compile_tree(res.shapes[0])
    # the reference's exported prospero tape is ~6k clauses; authored
    # text lands in the same ballpark
    assert 3000 < tape.length < 12000
    mine = _fill(res.shapes[0])
    ref = _fill(frep.load("/root/reference/benchmark/files/"
                          "prospero.frep")[0].tree)
    assert 0.5 < mine.mean() / ref.mean() < 2.0


def test_involute_gear_io_matches_reference_frep():
    res = scheme.run_file(f"{EXAMPLES}/involute_gear.io")
    assert len(res.shapes) == 1
    mine = _fill(res.shapes[0], z=0.0)
    ref = _fill(frep.load("/root/reference/benchmark/files/"
                          "involute_gear_3d.frep")[0].tree, z=0.0)
    assert 0.75 < mine.sum() / ref.sum() < 1.33


def test_architecture_io_evaluates_with_directives():
    res = scheme.run_file(f"{EXAMPLES}/architecture.io")
    assert len(res.shapes) == 1
    assert res.bounds == ((-50.0, -50.0, -20.0), (50.0, 50.0, 20.0))
    tape = compile_tree(res.shapes[0])
    assert tape.length > 500
    # scene has ink in the center slice
    assert _fill(res.shapes[0], z=0.0).sum() > 0


def test_bear_io_is_comment_only():
    res = scheme.run_file(f"{EXAMPLES}/bear.io")
    assert res.shapes == []


def test_script_determinism():
    a = scheme.run_file(f"{EXAMPLES}/hello_world.io").shapes[0]
    b = scheme.run_file(f"{EXAMPLES}/hello_world.io").shapes[0]
    assert a is b                 # hash-consed: same tree node


def test_stdlib_arrays_and_revolve():
    # array-x: 3 circles in a row
    res = run_string("(array-x (circle 0.12 [-0.6 0]) 3 0.6)")
    tape = compile_tree(res.shapes[0])
    v = oracle.eval_f(tape, np.float32([-0.6, 0.0, 0.6, 0.3]),
                      np.float32([0, 0, 0, 0]), np.zeros(4, np.float32))
    assert (v[:3] < 0).all() and v[3] > 0
    # array-polar: 4 copies at 90-degree steps
    res = run_string("(array-polar (circle 0.1 [0.5 0]) 4)")
    tape = compile_tree(res.shapes[0])
    v = oracle.eval_f(tape, np.float32([0.5, 0.0, -0.5, 0.35]),
                      np.float32([0.0, 0.5, 0.0, 0.35]),
                      np.zeros(4, np.float32))
    assert (v[:3] < 0).all() and v[3] > 0
    # revolve-y of a circle at x=0.5 -> torus around the y axis
    res = run_string("(revolve-y (circle 0.15 [0.5 0]))")
    tape = compile_tree(res.shapes[0])
    v = oracle.eval_f(tape, np.float32([0.5, 0.0, 0.0]),
                      np.float32([0.0, 0.0, 0.0]),
                      np.float32([0.0, 0.5, 0.0]))
    assert v[0] < 0 and v[1] < 0 and v[2] > 0     # origin is the hole


def test_stdlib_loft_and_symmetric():
    res = run_string(
        "(loft (circle 0.5) (circle 0.1) 0 1)")
    tape = compile_tree(res.shapes[0])
    # near the base the radius is ~0.5; near the top ~0.1
    v = oracle.eval_f(tape, np.float32([0.4, 0.4, 0.05, 0.4]),
                      np.float32([0, 0, 0, 0]),
                      np.float32([0.05, 0.95, 0.95, 1.2]))
    assert v[0] < 0 and v[1] > 0 and v[2] < 0 and v[3] > 0
    res = run_string("(symmetric-x (circle 0.2 [0.5 0]))")
    tape = compile_tree(res.shapes[0])
    v = oracle.eval_f(tape, np.float32([0.5, -0.5, 0.0]),
                      np.float32([0, 0, 0]), np.zeros(3, np.float32))
    assert v[0] < 0 and v[1] < 0 and v[2] > 0


def test_quotient_remainder_truncated_semantics():
    env = run_string("(define q (quotient -7 2))(define r (remainder -7 2))"
                     "(define m (modulo -7 2))").env
    assert env.lookup("q") == -3 and env.lookup("r") == -1.0
    assert env.lookup("m") == 1


def test_cond_test_only_clause_returns_value():
    env = run_string("(define v (cond (#f 1) (5)))").env
    assert env.lookup("v") == 5


def test_malformed_special_forms_report_position():
    for src in ("(define)", "(quote)", "(set! x)", "(lambda)",
                "(let ((a 1)))", "(lambda-shape (x y z))"):
        with pytest.raises(SchemeError, match="line 1"):
            run_string(src)


def test_authored_shapes_frep_round_trip(tmp_path):
    """Scheme-authored shapes (capsule/arc strokes) survive the .frep
    archive round trip value-exactly — authored scenes are exportable to
    the reference's wire format like any other shape."""
    res = run_string('(extrude-z (text "Ab" [-0.5 -0.2]) -0.2 0.2)')
    path = str(tmp_path / "t.frep")
    frep.dump([frep.ArchiveShape(tree=res.shapes[0], name="t")], path)
    back = frep.load(path)[0].tree
    ta, tb = compile_tree(res.shapes[0]), compile_tree(back)
    pts = np.random.default_rng(7).uniform(-1, 1, (3, 512)).astype(
        np.float32)
    va = oracle.eval_f(ta, *pts)
    vb = oracle.eval_f(tb, *pts)
    np.testing.assert_array_equal(va, vb)


def test_remap_shape():
    # squash a sphere to half height via remap (libfive remap-shape)
    res = run_string(
        "(remap-shape ((sphere 0.5) x y z) x y (* z 2))")
    tape = compile_tree(res.shapes[0])
    v = oracle.eval_f(tape, np.float32([0, 0, 0]), np.float32([0, 0, 0]),
                      np.float32([0.2, 0.3, 0.45]))
    assert v[0] < 0 and v[1] > 0 and v[2] > 0
    with pytest.raises(SchemeError, match="remap-shape"):
        run_string("(remap-shape (x y) x y)")


# every shape builtin: (expression, [(x, y, z, sign)]) — sign < 0 inside.
# Pins the libfive call signatures (vector points, optional centers);
# a signature slip here means silently wrong geometry for .io users.
_BUILTIN_PROBES = [
    ("(circle 0.3 [0.5 0])", [(0.5, 0, 0, -1), (0, 0, 0, 1)]),
    ("(ring 0.5 0.3)", [(0.4, 0, 0, -1), (0, 0, 0, 1), (0.6, 0, 0, 1)]),
    ("(sphere 0.3 [0 0 0.5])", [(0, 0, 0.5, -1), (0, 0, 0, 1)]),
    ("(rectangle [-0.4 -0.2] [0.1 0.3])",
     [(-0.1, 0, 0, -1), (0.3, 0, 0, 1), (0, 0.4, 0, 1)]),
    ("(box [-0.4 -0.2 -0.3] [0.1 0.3 0.2])",
     [(0, 0, 0, -1), (0, 0, 0.3, 1)]),
    ("(cylinder-z 0.2 0.5 [0.1 0 -0.2])",
     [(0.1, 0, 0, -1), (0.1, 0, 0.4, 1), (0.4, 0, 0, 1)]),
    ("(cone-z 0.4 0.6 [0 0 -0.2])",
     [(0, 0, 0, -1), (0.3, 0, 0.3, 1), (0, 0, 0.5, 1)]),
    ("(pyramid-z [-0.4 -0.4] [0.4 0.4] -0.2 0.6)",
     [(0, 0, 0, -1), (0.35, 0.35, 0.3, 1), (0, 0, 0.5, 1)]),
    ("(torus-z 0.5 0.2)", [(0.5, 0, 0, -1), (0, 0, 0, 1)]),
    ("(half-space-z 0.2)", [(0, 0, 0, -1), (0, 0, 0.4, 1)]),
    ("(gyroid 1.0 0.2)", [(0, 0, 0, -1)]),
    ("(union (circle 0.1) (circle 0.1 [0.5 0]))",
     [(0, 0, 0, -1), (0.5, 0, 0, -1), (0.25, 0, 0, 1)]),
    ("(intersection (circle 0.3) (circle 0.3 [0.3 0]))",
     [(0.15, 0, 0, -1), (-0.2, 0, 0, 1)]),
    ("(difference (circle 0.4) (circle 0.2))",
     [(0.3, 0, 0, -1), (0, 0, 0, 1)]),
    ("(inverse (circle 0.3))", [(0, 0, 0, 1), (0.5, 0, 0, -1)]),
    ("(offset (circle 0.2) 0.15)", [(0.3, 0, 0, -1), (0.4, 0, 0, 1)]),
    ("(shell (circle 0.4) 0.1)",
     [(0.35, 0, 0, -1), (0, 0, 0, 1)]),
    # blend bridges when m > sqrt|a| + sqrt|b| at the gap midpoint
    ("(blend (circle 0.15 [-0.3 0]) (circle 0.15 [0.3 0]) 0.9)",
     [(-0.3, 0, 0, -1), (0, 0, 0, -1)]),
    ("(blend (circle 0.15 [-0.3 0]) (circle 0.15 [0.3 0]) 0.3)",
     [(-0.3, 0, 0, -1), (0, 0, 0, 1)]),
    ("(morph (circle 0.2) (circle 0.4) 0.5)",
     [(0.25, 0, 0, -1), (0.35, 0, 0, 1)]),
    ("(move (sphere 0.2) [0.4 0.1 -0.2])",
     [(0.4, 0.1, -0.2, -1), (0, 0, 0, 1)]),
    ("(scale-x (circle 0.2) 3)", [(0.5, 0, 0, -1), (0, 0.3, 0, 1)]),
    ("(scale-y (circle 0.2) 3 0)", [(0, 0.5, 0, -1), (0.3, 0, 0, 1)]),
    ("(scale-z (sphere 0.2) 2 0)", [(0, 0, 0.35, -1), (0.3, 0, 0, 1)]),
    ("(scale-xyz (sphere 0.2) [2 1 1])",
     [(0.35, 0, 0, -1), (0, 0.3, 0, 1)]),
    ("(rotate-z (circle 0.1 [0.4 0]) (/ pi 2))",
     [(0, 0.4, 0, -1), (0.4, 0, 0, 1)]),
    ("(rotate-x (sphere 0.1 [0 0.4 0]) (/ pi 2))",
     [(0, 0, 0.4, -1), (0, 0.4, 0, 1)]),
    ("(rotate-y (sphere 0.1 [0 0 0.4]) (/ pi 2))",
     [(0.4, 0, 0, -1), (0, 0, 0.4, 1)]),
    ("(rotate-z (circle 0.1 [0.4 0]) pi [0.4 0])",
     [(0.4, 0, 0, -1)]),
    ("(reflect-x (circle 0.1 [0.3 0]))", [(-0.3, 0, 0, -1),
                                          (0.3, 0, 0, 1)]),
    ("(reflect-x (circle 0.1 [0.3 0]) 0.5)", [(0.7, 0, 0, -1)]),
    ("(reflect-y (circle 0.1 [0 0.3]))", [(0, -0.3, 0, -1)]),
    ("(reflect-z (sphere 0.1 [0 0 0.3]))", [(0, 0, -0.3, -1)]),
    ("(reflect-xy (circle 0.1 [0.4 0.1]))", [(0.1, 0.4, 0, -1)]),
    ("(reflect-yz (sphere 0.1 [0 0.4 0.1]))", [(0, 0.1, 0.4, -1)]),
    ("(reflect-xz (sphere 0.1 [0.4 0 0.1]))", [(0.1, 0, 0.4, -1)]),
    ("(extrude-z (circle 0.3) -0.1 0.2)",
     [(0, 0, 0, -1), (0, 0, 0.3, 1)]),
    ("(symmetric-y (circle 0.1 [0 0.3]))", [(0, -0.3, 0, -1)]),
    ("(symmetric-z (sphere 0.1 [0 0 0.3]))", [(0, 0, -0.3, -1)]),
    ("(array-y (circle 0.1) 2 0.5)", [(0, 0.5, 0, -1), (0, 0.25, 0, 1)]),
    ("(array-z (sphere 0.1) 3 0.3)", [(0, 0, 0.6, -1), (0, 0, 0.45, 1)]),
    ("(array-xy (circle 0.1) 2 2 [0.5 0.4])",
     [(0.5, 0.4, 0, -1), (0.25, 0.2, 0, 1)]),
    ("(text \"l\" [0.2 -0.4])", [(0.29, 0, 0, -1), (-0.5, 0, 0, 1)]),
]


@pytest.mark.parametrize("expr,probes", _BUILTIN_PROBES,
                         ids=[e.split()[0][1:] + str(i) for i, (e, _) in
                              enumerate(_BUILTIN_PROBES)])
def test_shape_builtin_signatures(expr, probes):
    res = run_string(expr)
    assert len(res.shapes) == 1, expr
    tape = compile_tree(res.shapes[0])
    for (px, py, pz, sign) in probes:
        v = float(oracle.eval_f(tape, np.float32([px]), np.float32([py]),
                                np.float32([pz]))[0])
        assert np.sign(v) == sign, f"{expr} at {(px, py, pz)}: {v}"
