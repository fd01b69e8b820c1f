"""CLI surface tests (mpr_tpu/cli.py — the benchmark-executable suite).

Host-only commands (dump-tape, tape-time) run for real; render commands
are wiring tests with the engine functions monkeypatched (so argparse →
engine-selection → PNG-writing is covered without paying a jit compile
per CLI invocation — the engines themselves are covered by the pipeline
and unrolled test files).
"""

import numpy as np
import pytest

from mpr_tpu import cli

HELLO = "/root/reference/benchmark/files/hello_world.frep"


def test_dump_tape(capsys):
    cli.main(["dump-tape", HELLO, "--limit", "12"])
    out = capsys.readouterr().out
    assert "length=" in out and "slots=" in out


def test_dump_tape_stress_scheme(capsys):
    """stress:N synthetic model plugs in anywhere a .frep path goes."""
    cli.main(["dump-tape", "stress:50", "--limit", "4"])
    out = capsys.readouterr().out
    assert "length=" in out


def test_tape_time(capsys):
    cli.main(["tape-time", HELLO])
    assert "tape build:" in capsys.readouterr().out


def test_render2d_wiring(tmp_path, monkeypatch, capsys):
    """interp-engine path + oracle --check + PNG out, renderer faked
    with the oracle itself (so --check's exactness contract holds)."""
    from mpr_tpu import oracle
    from mpr_tpu.render import camera, pipeline2d
    calls = {}

    def fake(tape, size):
        calls["size"] = size
        p = camera.pixel_centers(size)
        X, Y = np.meshgrid(p, p)
        return oracle.eval_f(tape, X, Y) < 0

    monkeypatch.setattr(pipeline2d, "render2d", fake)
    out = tmp_path / "o.png"
    cli.main(["render2d", HELLO, "--size", "128", "--check",
              "--out", str(out)])
    assert calls["size"] == 128
    assert out.stat().st_size > 100
    assert "mismatch 0.00e+00" in capsys.readouterr().out


def test_render2d_sharded_and_unrolled_wiring(tmp_path, monkeypatch):
    from mpr_tpu.parallel import sharded
    from mpr_tpu.render import unrolled
    hit = []
    fake = lambda name: (lambda tape, size: (hit.append(name),
                                             np.zeros((size, size),
                                                      bool))[1])
    monkeypatch.setattr(sharded, "render2d_sharded",
                        fake("sharded-interp"))
    monkeypatch.setattr(sharded, "render2d_sharded_unrolled",
                        fake("sharded-unrolled"))
    monkeypatch.setattr(unrolled, "render2d", fake("unrolled"))
    cli.main(["render2d", HELLO, "--size", "64", "--sharded",
              "--out", str(tmp_path / "a.png")])
    cli.main(["render2d", HELLO, "--size", "64", "--sharded",
              "--engine", "unrolled", "--out", str(tmp_path / "b.png")])
    cli.main(["render2d", HELLO, "--size", "64", "--engine", "unrolled",
              "--out", str(tmp_path / "c.png")])
    assert hit == ["sharded-interp", "sharded-unrolled", "unrolled"]


def test_render3d_wiring(tmp_path, monkeypatch):
    """mode routing writes the expected PNG set (effects modes excluded:
    covered by test_effects.py without a second compile here)."""
    from mpr_tpu.render import pipeline3d

    def fake(tape, mat, size):
        d = np.zeros((size, size), np.int32)
        d[size // 4: size // 2, size // 4: size // 2] = size // 2
        n = np.zeros((size, size, 3), np.float32)
        n[..., 2] = 1.0
        return d, n

    monkeypatch.setattr(pipeline3d, "render3d", fake)
    out = tmp_path / "r.png"
    cli.main(["render3d", HELLO, "--size", "64", "--mode", "heightmap",
              "--out", str(out)])
    assert (tmp_path / "r_depth.png").exists()
    cli.main(["render3d", HELLO, "--size", "64", "--mode", "normals",
              "--out", str(out)])
    assert (tmp_path / "r_norm.png").exists()


def test_fit_cli(tmp_path, capsys):
    """End-to-end differentiable fit through the CLI: circle(0.8) fitted
    toward circle(0.6); loss must drop and the checkpoint round-trip."""
    from mpr_tpu.frontend import frep, shapes
    from mpr_tpu.io import checkpoint
    a, b = tmp_path / "a.frep", tmp_path / "b.frep"
    frep.dump([frep.ArchiveShape(tree=shapes.circle(0.8))], str(a))
    frep.dump([frep.ArchiveShape(tree=shapes.circle(0.6))], str(b))
    out = tmp_path / "f.npz"
    cli.main(["fit", str(a), "--target", str(b), "--size", "64",
              "--steps", "6", "--lr", "2e-1", "--out", str(out),
              "--out-frep", str(tmp_path / "f.frep"),
              "--render-out", str(tmp_path / "f.png")])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("step")]
    first, last = (float(ln.split()[-1]) for ln in (lines[0], lines[-1]))
    assert last < first
    t2 = checkpoint.load_tape(str(out))
    assert t2.length and (tmp_path / "f.png").exists()
    # --out-frep: the fitted tape decompiles to a loadable archive whose
    # shape matches the fitted checkpoint (value-exact round trip)
    from mpr_tpu import oracle
    from mpr_tpu.tape.tape import compile_tree
    t3 = compile_tree(frep.load(str(tmp_path / "f.frep"))[0].tree)
    g = np.linspace(-1, 1, 32, dtype=np.float32)
    X, Y = np.meshgrid(g, g)
    np.testing.assert_array_equal(oracle.eval_f(t3, X, Y),
                                  oracle.eval_f(t2, X, Y))

    # same fit through the production (unrolled) evaluator
    cli.main(["fit", str(a), "--target", str(b), "--size", "64",
              "--steps", "4", "--lr", "2e-1", "--engine", "unrolled",
              "--out", str(out)])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("step")]
    assert float(lines[-1].split()[-1]) < float(lines[0].split()[-1])


def test_fit_cli_png_target(tmp_path, capsys):
    """PNG targets go through io.png.read_png_gray (cli render2d's row
    convention)."""
    from mpr_tpu import oracle
    from mpr_tpu.frontend import frep, shapes
    from mpr_tpu.io.png import write_png
    from mpr_tpu.render import camera
    a = tmp_path / "a.frep"
    frep.dump([frep.ArchiveShape(tree=shapes.circle(0.8))], str(a))
    p = camera.pixel_centers(64)
    X, Y = np.meshgrid(p, p)
    fill = oracle.eval_f(compile_tree_circle06(), X, Y) < 0
    write_png(str(tmp_path / "t.png"), fill)
    cli.main(["fit", str(a), "--target", str(tmp_path / "t.png"),
              "--size", "64", "--steps", "4", "--lr", "2e-1",
              "--out", str(tmp_path / "f.npz")])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("step")]
    assert float(lines[-1].split()[-1]) < float(lines[0].split()[-1])


def compile_tree_circle06():
    from mpr_tpu.frontend import shapes
    from mpr_tpu.tape.tape import compile_tree
    return compile_tree(shapes.circle(0.6))


def test_fit_cli_3d(tmp_path, capsys):
    """3D depth-fit through the CLI (volume-compositing soft depth)."""
    from mpr_tpu.frontend import frep, shapes
    a, b = tmp_path / "a.frep", tmp_path / "b.frep"
    frep.dump([frep.ArchiveShape(tree=shapes.sphere(0.75))], str(a))
    frep.dump([frep.ArchiveShape(tree=shapes.sphere(0.55))], str(b))
    out = tmp_path / "f3.npz"
    cli.main(["fit", str(a), "--target", str(b), "--mode", "3d",
              "--size", "16", "--steps", "40",
              "--out", str(out), "--render-out", str(tmp_path / "d.png")])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("step")]
    first, last = (float(ln.split()[-1]) for ln in (lines[0], lines[-1]))
    assert last < first * 0.7
    assert (tmp_path / "d.png").exists()


def test_render2d_check_failure_exits(tmp_path, monkeypatch):
    """--check must FAIL the process when the render disagrees with the
    oracle (the automated render_2d.cpp cross-check contract)."""
    from mpr_tpu.render import pipeline2d
    monkeypatch.setattr(
        pipeline2d, "render2d",
        lambda tape, size: np.ones((size, size), bool))
    with pytest.raises(SystemExit):
        cli.main(["render2d", HELLO, "--size", "128", "--check",
                  "--out", str(tmp_path / "x.png")])


def test_convert_cli(tmp_path, capsys):
    """convert: stress:N -> .frep (decompiled), and .npz checkpoint ->
    .frep; the output re-loads and matches the source via the oracle."""
    from mpr_tpu import oracle
    from mpr_tpu.frontend import frep
    from mpr_tpu.io import checkpoint
    from mpr_tpu.tape.tape import compile_tree
    g = np.linspace(-1, 1, 48, dtype=np.float32)
    X, Y = np.meshgrid(g, g)

    out = tmp_path / "s.frep"
    cli.main(["convert", "stress:40", str(out)])
    t_src = cli._load("stress:40")
    t_back = compile_tree(frep.load(str(out))[0].tree)
    np.testing.assert_array_equal(oracle.eval_f(t_src, X, Y),
                                  oracle.eval_f(t_back, X, Y))

    npz = tmp_path / "c.npz"
    checkpoint.save_tape(str(npz), t_src)
    out2 = tmp_path / "c.frep"
    cli.main(["convert", str(npz), str(out2), "--name", "stress40"])
    assert frep.load(str(out2))[0].name == "stress40"


def test_dump_tape_io_script(capsys):
    """.io Scheme scenes plug in anywhere a .frep path goes (the
    reference GUI's source format, /root/reference/gui/examples)."""
    cli.main(["dump-tape", "/root/reference/gui/examples/hello_world.io",
              "--limit", "4"])
    out = capsys.readouterr().out
    assert "length=" in out
