"""Live viewer: the TPU-side analog of the reference's GUI (L5a).

The reference embeds a Guile Scheme editor whose script evaluates to
shapes that re-render on every edit (/root/reference/gui/main.cpp:263-302,
gui/interpreter.cpp).  Here the scripting language IS Python — the
frontend DSL replaces libfive-guile — and the display is a browser page
(this environment is headless; CUDA-GL interop has no TPU analog, so the
render travels as PNG bytes over HTTP instead of a GL surface):

    python -m mpr_tpu.viewer examples/hello_world.py --serve 8000
    python -m mpr_tpu.viewer examples/gear.py --watch --out /tmp/view.png

Script protocol (the analog of the .io directives,
/root/reference/gui/examples/architecture.io):
  * define ``shape`` (a Tree) or ``shapes`` (a list of Trees);
  * optional module-level settings: SIZE (256/512/1024/2048), MODE
    ("2d" | "heightmap" | "normals" | "ssao" | "shaded"), VIEW
    (4x4 matrix or (yaw, pitch, perspective) tuple).

Multi-shape scenes composite like the GUI's append mode
(/root/reference/gui/tex.cu:35-147): 2D fills OR together; 3D depths
take the per-pixel max with the winning shape's normals.
"""

from __future__ import annotations

import argparse
import http.server
import io
import os
import sys
import threading
import time

import numpy as np

_PAGE = b"""<!doctype html>
<title>mpr_tpu viewer</title>
<body style="margin:0;background:#111;color:#ccc;font:13px monospace">
<div id=s style="padding:4px"></div>
<img id=v style="image-rendering:pixelated;max-width:100vw">
<script>
async function tick() {
  try {
    const r = await fetch('/status'); const j = await r.json();
    document.getElementById('s').textContent =
      `${j.script}  ${j.mode} ${j.size}px  render ${j.ms} ms  #${j.seq}`;
    document.getElementById('v').src = '/frame.png?seq=' + j.seq;
  } catch (e) {}
  setTimeout(tick, 500);
}
tick();
</script>
"""


class ViewerState:
    def __init__(self):
        self.png = b""
        self.seq = 0
        self.ms = 0.0
        self.mode = ""
        self.size = 0
        self.script = ""
        self.lock = threading.Lock()


def _eval_script(path: str):
    """Run the script with the DSL preloaded; collect shapes + settings
    (the interpreter.cpp analog — errors are reported, not fatal)."""
    from .frontend import shapes as shapelib
    from .frontend import tree as treelib
    env = {"__builtins__": __builtins__}
    env.update({k: getattr(shapelib, k) for k in dir(shapelib)
                if not k.startswith("_")})
    for k in ("x", "y", "z", "const", "minimum", "maximum", "sqrt",
              "square", "Tree"):
        env[k] = getattr(treelib, k)
    with open(path) as f:
        src = f.read()
    exec(compile(src, path, "exec"), env)
    out = env.get("shapes")
    if out is None:
        out = [env["shape"]] if "shape" in env else []
    settings = {"size": int(env.get("SIZE", 512)),
                "mode": str(env.get("MODE", "shaded")),
                "view": env.get("VIEW", None)}
    return list(out), settings


def _view_matrix(view, mode):
    from .render import camera
    if view is None:
        return (camera.identity2() if mode == "2d"
                else camera.gui3d_view())
    v = np.asarray(view, np.float32)
    if v.shape == (3,):
        return camera.gui3d_view(float(v[0]), float(v[1]), float(v[2]))
    return v


def render_script(path: str):
    """Render the script once; returns (rgb uint8 image, settings, ms)."""
    from .render import effects
    from .render.pipeline2d import render2d
    from .render.pipeline3d import render3d
    from .tape.tape import compile_tree

    shapes, st = _eval_script(path)
    size, mode = st["size"], st["mode"]
    mat = _view_matrix(st["view"], mode)
    t0 = time.perf_counter()
    if mode == "2d":
        acc = np.zeros((size, size), bool)
        for s in shapes:
            acc |= render2d(compile_tree(s), mat=mat, size=size)
        img = np.where(acc[::-1], 255, 0).astype(np.uint8)
    else:
        depth = np.zeros((size, size), np.int32)
        normals = np.zeros((size, size, 3), np.float32)
        for s in shapes:
            d, n = render3d(compile_tree(s), mat=mat, size=size)
            win = d > depth
            depth = np.where(win, d, depth)
            normals = np.where(win[..., None], n, normals)
        if mode == "heightmap":
            img = (depth / size * 255).astype(np.uint8)[::-1]
        elif mode == "normals":
            img = ((normals * 127) + 128).clip(0, 255).astype(
                np.uint8)[::-1]
        elif mode == "ssao":
            occ = np.asarray(effects.draw_ssao(depth, normals))
            img = (occ * 255).astype(np.uint8)[::-1]
        else:
            sh = np.asarray(effects.draw_shaded(depth, normals))
            img = (sh * 255).astype(np.uint8)[::-1]
    ms = (time.perf_counter() - t0) * 1e3
    return img, st, ms


def _png_bytes(img) -> bytes:
    from .io.png import write_png
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
        name = f.name
    write_png(name, img)
    with open(name, "rb") as f:
        data = f.read()
    os.unlink(name)
    return data


def _watch_loop(path, state: ViewerState, once=False, out=None):
    last_mtime = 0.0
    while True:
        try:
            m = os.stat(path).st_mtime
        except OSError:
            time.sleep(0.3)
            continue
        if m != last_mtime:
            last_mtime = m
            try:
                img, st, ms = render_script(path)
                png = _png_bytes(img)
                with state.lock:
                    state.png = png
                    state.seq += 1
                    state.ms = round(ms, 1)
                    state.mode = st["mode"]
                    state.size = st["size"]
                    state.script = os.path.basename(path)
                if out:
                    with open(out, "wb") as f:
                        f.write(png)
                print(f"rendered #{state.seq} {st['mode']} "
                      f"{st['size']}px in {ms:.1f} ms", file=sys.stderr)
            except Exception as e:  # script errors are shown, not fatal
                print(f"script error: {e!r}", file=sys.stderr)
        if once:
            return
        time.sleep(0.3)


def serve(path: str, port: int, out=None):
    state = ViewerState()
    threading.Thread(target=_watch_loop, args=(path, state),
                     kwargs={"out": out}, daemon=True).start()

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.startswith("/frame.png"):
                with state.lock:
                    body, ctype = state.png, "image/png"
            elif self.path.startswith("/status"):
                import json
                with state.lock:
                    body = json.dumps({
                        "seq": state.seq, "ms": state.ms,
                        "mode": state.mode, "size": state.size,
                        "script": state.script}).encode()
                ctype = "application/json"
            else:
                body, ctype = _PAGE, "text/html"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port), H)
    print(f"viewer at http://localhost:{port} (watching {path})",
          file=sys.stderr)
    httpd.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mpr_tpu.viewer")
    ap.add_argument("script")
    ap.add_argument("--serve", type=int, default=0, metavar="PORT")
    ap.add_argument("--watch", action="store_true")
    ap.add_argument("--out", default=None, help="also write PNG here")
    args = ap.parse_args(argv)
    if args.serve:
        serve(args.script, args.serve, out=args.out)
    else:
        state = ViewerState()
        _watch_loop(args.script, state, once=not args.watch, out=args.out)


if __name__ == "__main__":
    main()
