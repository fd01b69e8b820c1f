"""Interactive viewer (mpr_tpu/viewer.py): script eval, camera matrix
assembly, and the HTTP surface (editor POST, orbit/zoom POST, frame GET) —
the reference GUI's workflow (/root/reference/gui/main.cpp:184-336)
without a display."""

import http.client
import json
import threading
import time

import numpy as np
import pytest

from mpr_tpu import viewer


SCRIPT = """
SIZE = 128
MODE = "heightmap"
VIEW = (0.5, -0.9, 0.3)
shape = sphere(0.6)
"""


def test_eval_src_and_settings():
    shapes_, st = viewer._eval_src(SCRIPT)
    assert len(shapes_) == 1
    assert st["size"] == 128 and st["mode"] == "heightmap"


def test_view_matrix_modes():
    cam = {"yaw": 0.0, "pitch": 0.0, "persp": 0.25, "scale": 2.0,
           "panx": 0.1, "pany": -0.2}
    m2 = viewer.view_matrix(cam, "2d")
    assert m2.shape == (3, 3) and m2[0, 0] == 2.0 and m2[0, 2] == \
        np.float32(0.1)
    m3 = viewer.view_matrix(cam, "shaded")
    assert m3.shape == (4, 4)
    assert m3[0, 0] == 2.0                      # scale on the rotation
    assert m3[3, 2] == np.float32(0.25 * 2.0)   # perspective row


def test_render_scene_2d_and_3d():
    img, ms, _ = viewer.render_scene("shape = circle(0.5)",
                                  {"yaw": 0, "pitch": 0, "persp": 0,
                                   "scale": 1.0, "panx": 0, "pany": 0},
                                  "2d", 128)
    assert img.shape == (128, 128) and img.max() == 255
    img3, _, _ = viewer.render_scene(SCRIPT, {"yaw": 0.5, "pitch": -0.9,
                                           "persp": 0.3, "scale": 1.0,
                                           "panx": 0, "pany": 0},
                                  "heightmap", 128)
    assert img3.shape == (128, 128) and img3.max() > 0


def test_http_surface(tmp_path):
    """Full interactive loop over HTTP: load page, edit script, orbit,
    zoom, read back frames and status."""
    path = tmp_path / "scene.py"
    path.write_text(SCRIPT)
    state = viewer.ViewerState()
    state.path = str(path)
    state.src = SCRIPT
    _, settings = viewer._eval_src(SCRIPT)
    viewer._apply_script_settings(state, settings)
    threading.Thread(target=viewer._render_worker, args=(state,),
                     daemon=True).start()
    state.dirty.set()
    import http.server
    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), viewer.make_handler(state))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def get(p):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("GET", p)
        r = c.getresponse()
        return r.status, r.read()

    def post(body):
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        c.request("POST", "/update", json.dumps(body))
        return c.getresponse().status

    def wait_seq(min_seq, timeout=120):
        for _ in range(int(timeout / 0.2)):
            st = json.loads(get("/status")[1])
            if st["seq"] >= min_seq and not state.dirty.is_set():
                return st
            time.sleep(0.2)
        raise AssertionError("render did not complete")

    # first frame pays the pipeline3d jit compile when run solo (warm in
    # a full-suite run) — allow for it
    st = wait_seq(1, timeout=420)
    assert st["error"] == ""
    status, page = get("/")
    assert status == 200 and b"textarea" in page
    assert get("/script")[1].decode() == SCRIPT
    status, png = get("/frame.png")
    assert status == 200 and png[:4] == b"\x89PNG"

    # orbit + zoom update the camera and trigger a re-render
    yaw0 = st["cam"]["yaw"]
    assert post({"orbit": [30, 0]}) == 200
    assert post({"zoom": 1.1}) == 200
    st = wait_seq(st["seq"] + 1)
    assert st["cam"]["yaw"] == pytest.approx(yaw0 + 0.3)
    assert st["cam"]["scale"] == pytest.approx(1.1)

    # editor edit: a broken script reports an error without crashing,
    # a fixed one recovers
    assert post({"script": "shape = undefined_fn(1)"}) == 200
    st = wait_seq(st["seq"] + 1)
    assert "NameError" in st["error"]
    assert post({"script": "shape = sphere(0.4)", "save": True}) == 200
    st = wait_seq(st["seq"] + 1)
    assert st["error"] == ""
    assert "sphere(0.4)" in path.read_text()   # Save wrote the file

    # .frep save: serialize the scene's shapes next to the script
    # (gui/main.cpp:394-403 analog) and round-trip through the loader
    c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    c.request("POST", "/update", json.dumps({"save_frep": True}))
    r = c.getresponse()
    saved = json.loads(r.read())["saved_frep"]
    assert saved == str(tmp_path / "scene.frep")
    from mpr_tpu.frontend import frep
    from mpr_tpu import oracle
    from mpr_tpu.tape.tape import compile_tree
    import numpy as np
    (shape,) = frep.load(saved)
    t = compile_tree(shape.tree)
    # sphere(0.4): inside at origin, outside at (0.5, 0, 0)
    v = oracle.eval_f(t, np.float32([0.0, 0.5]), np.float32([0.0, 0.0]),
                      np.float32([0.0, 0.0]))
    assert v[0] < 0 < v[1]
    httpd.shutdown()


def test_render_scene_engine_toggle():
    """engine="unrolled" routes through the production engine and
    produces the identical image (both engines are exact vs the same
    oracle); ENGINE in the script sets the initial state."""
    cam = {"yaw": 0, "pitch": 0, "persp": 0, "scale": 1.0,
           "panx": 0, "pany": 0}
    img_i, _, _ = viewer.render_scene("shape = circle(0.5)", cam, "2d", 128,
                                   engine="interp")
    img_u, _, _ = viewer.render_scene("shape = circle(0.5)", cam, "2d", 128,
                                   engine="unrolled")
    assert (img_i == img_u).all()

    state = viewer.ViewerState()
    _, st = viewer._eval_src("ENGINE = 'unrolled'\nshape = circle(0.5)")
    viewer._apply_script_settings(state, st)
    assert state.engine == "unrolled"


def test_open_frep_directly(tmp_path):
    """`mpr-tpu-viewer model.frep` works on archives: a generated editing
    script loads the shapes, mode picks 2d/normals by z usage, and the
    one-shot render path accepts the archive."""
    from mpr_tpu.frontend import frep, shapes
    p2 = tmp_path / "disc.frep"
    frep.dump([frep.ArchiveShape(tree=shapes.circle(0.5))], str(p2))
    src = viewer._script_for_frep(str(p2))
    shapes_, st = viewer._eval_src(src)
    assert len(shapes_) == 1 and st["mode"] == "2d"
    img, _, _ = viewer.render_script(str(p2))
    assert img.max() == 255

    p3 = tmp_path / "ball.frep"
    frep.dump([frep.ArchiveShape(tree=shapes.sphere(0.6))], str(p3))
    assert "MODE = 'normals'" in viewer._script_for_frep(str(p3))


IO_SCRIPT = """
;; a Scheme scene (the reference GUI's .io format)
(sequence (circle 0.5)
  (move [0.2 0])
  (difference (circle 0.2)))
"""


def test_eval_src_scheme_dispatch():
    """Scheme sources are detected and evaluated by frontend/scheme.py;
    Python sources still go through exec."""
    shapes_, st = viewer._eval_src(IO_SCRIPT)
    assert len(shapes_) == 1
    assert viewer._is_scheme_src(IO_SCRIPT)
    assert not viewer._is_scheme_src(SCRIPT)


def test_render_scene_scheme_2d():
    img, _, _ = viewer.render_scene(IO_SCRIPT,
                                 {"yaw": 0, "pitch": 0, "persp": 0,
                                  "scale": 1.0, "panx": 0, "pany": 0},
                                 "2d", 128)
    assert img.shape == (128, 128) and img.max() == 255
    # the 0.2-radius hole at the origin is empty
    assert img[64, 70] == 0


def test_scheme_scene_auto_2d_mode():
    shapes_, st = viewer._eval_src("(circle 0.4)")
    assert st["mode"] == "2d"
    shapes_, st = viewer._eval_src("(sphere 0.4)")
    assert st["mode"] is None          # 3D scene keeps the default


def test_save_stl(tmp_path):
    path = str(tmp_path / "scene.io")
    out, err = viewer._save_stl("(sphere 0.5)", path, size=16)
    assert err == "" and out.endswith(".stl")
    from mpr_tpu.io import mesh
    tris = mesh.read_stl(out)
    assert mesh.mesh_volume(tris) > 0.3
    # errors are reported, not raised
    out, err = viewer._save_stl("(circle", path)
    assert out == "" and "save_stl failed" in err


def test_python_scripts_are_sandboxed(monkeypatch):
    """Viewer Python scenes run with restricted builtins (the
    eval-sandboxed Guile analog, /root/reference/gui/interpreter.cpp:
    22-50): no import, no file IO; benign builtins + the DSL work."""
    monkeypatch.delenv("MPR_TPU_TRUST_SCRIPTS", raising=False)
    shapes_, _ = viewer._eval_src(
        "shapes = [circle(0.1 + 0.05 * i) for i in range(3)]\n"
        "n = len(shapes); assert min(1, 2) == 1\n", "s.py")
    assert len(shapes_) == 3
    import pytest
    with pytest.raises(ImportError):
        viewer._eval_src("import os\nshape = circle(0.1)\n", "s.py")
    with pytest.raises(NameError):
        viewer._eval_src("open('/etc/passwd')\n", "s.py")
    # the escape hatch restores full builtins
    monkeypatch.setenv("MPR_TPU_TRUST_SCRIPTS", "1")
    shapes_, _ = viewer._eval_src(
        "import math\nshape = circle(math.sin(0.5))\n", "s.py")
    assert len(shapes_) == 1
