"""Long-tape stress model (shapes.stress_2d) — the working analog of the
reference's missing ``prospero_long.frep``
(/root/reference/benchmark/tape_shortening.cpp:29 references a file that
was never shipped).  Exercises the tape compiler (Python + native C++)
and the shortening machinery at 2.5x prospero's clause count, all at
oracle level (no jit) so it stays cheap on any host.
"""

import numpy as np

from mpr_tpu import oracle
from mpr_tpu.frontend import shapes
from mpr_tpu.tape import tape as tape_mod
from mpr_tpu.tape.tape import compile_tree


def _stress_tape():
    return compile_tree(shapes.stress_2d(1500))


def test_stress_compile_deterministic_and_under_caps():
    t1 = _stress_tape()
    t2 = compile_tree(shapes.stress_2d(1500))
    assert t1.length == t2.length > 10_000
    assert np.array_equal(t1.ops, t2.ops)
    assert np.array_equal(t1.imms, t2.imms)
    # balanced-union liveness keeps slots far under the cap
    assert t1.num_slots < tape_mod.SLOT_CAP


def test_stress_native_compiler_matches_python():
    from mpr_tpu import native
    if native.lib() is None:
        import pytest
        pytest.skip("native compiler unavailable")
    tree = shapes.stress_2d(1500)
    tp = compile_tree(tree)
    tn = compile_tree(tree, backend="native")
    for f in ("ops", "outs", "lhss", "rhss", "imms"):
        assert np.array_equal(getattr(tp, f), getattr(tn, f)), f


def test_stress_oracle_render_and_shortening_payoff():
    """The prospero_long use case: at the 64px stage the per-tile
    shortened tapes should be a small fraction of the 13k-clause full
    tape (each tile sees only its local blobs)."""
    tape = _stress_tape()
    # oracle render sanity: deterministic blob field fills ~18% of [-1,1]^2
    xs = np.linspace(-1, 1, 128, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs)
    img = oracle.eval_f(tape, X, Y) < 0
    assert 0.10 < img.mean() < 0.30

    # Shortening ratio per stage.  At the 64px stage (512px render) the
    # blobs' distance intervals overlap heavily, so min nodes mostly
    # keep both sides (measured mean 0.28); at the 8px stage intervals
    # are tight and the tape collapses to the tile's local blobs
    # (measured mean 0.007) — the ~100x gap IS the tape_shortening
    # figure's story.
    for n, bound in ((8, 0.45), (64, 0.03)):
        e = np.linspace(-1, 1, n + 1, dtype=np.float32)
        rng = np.random.default_rng(0)
        tiles = [(ix, iy) for ix in range(n) for iy in range(n)]
        rng.shuffle(tiles)
        ratios = []
        for ix, iy in tiles:
            lo, hi, choices = oracle.eval_i(
                tape, np.float32(e[ix]), np.float32(e[ix + 1]),
                np.float32(e[iy]), np.float32(e[iy + 1]))
            if lo > 0 or hi < 0:
                continue                  # culled: no subtape needed
            short = oracle.shorten(tape, choices)
            ratios.append(short.length / tape.length)
            if len(ratios) <= 3:
                # shortened tape must agree with the full tape in-box
                px = np.float32(np.linspace(e[ix], e[ix + 1], 5))
                py = np.float32(np.linspace(e[iy], e[iy + 1], 5))
                PX, PY = np.meshgrid(px, py)
                assert np.array_equal(oracle.eval_f(tape, PX, PY),
                                      oracle.eval_f(short, PX, PY))
            if len(ratios) >= 12:
                break
        assert ratios, "no ambiguous tiles in a blob field?"
        assert float(np.mean(ratios)) < bound, (n, np.mean(ratios))
