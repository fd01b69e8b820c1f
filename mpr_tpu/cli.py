"""Command-line render & benchmark suite.

The TPU-native analog of the reference's benchmark executables
(/root/reference/benchmark/CMakeLists.txt:18-32) behind one entry point:

    python -m mpr_tpu.cli render2d FILE.frep --size 1024 --out out.png
    python -m mpr_tpu.cli render3d FILE.frep --size 512 --mode shaded
    python -m mpr_tpu.cli table2d FILE.frep            # render_2d_table
    python -m mpr_tpu.cli table3d FILE.frep            # render_3d_table
    python -m mpr_tpu.cli brute FILE.frep              # brute 3-way compare
    python -m mpr_tpu.cli tape-time FILE.frep          # tape_building_time
    python -m mpr_tpu.cli dump-tape FILE.frep          # print_tape_table

Timing protocol: warmup + timed-runs mean, like benchmark/stats.cpp:19-47,
via the fori_loop-chained harness (utils/timing.py) because per-call sync
is unreliable over remote-dispatch tunnels.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _load_tree(path: str):
    """Shape source -> (Tree, ScriptResult-or-None).  Sources: a .frep
    archive, a .io Scheme scene (all shapes unioned; the ScriptResult
    carries its directives), or ``stress:N``."""
    from .frontend import frep
    if path.startswith("stress:"):
        # synthetic long-tape model, e.g. ``stress:1500`` — the working
        # analog of the reference's missing prospero_long.frep
        # (/root/reference/benchmark/tape_shortening.cpp:29); see
        # frontend/shapes.py::stress_2d
        from .frontend import shapes as shapelib
        return shapelib.stress_2d(int(path.split(":", 1)[1])), None
    if path.endswith(".io"):
        # a Scheme scene script (the reference GUI's source format,
        # /root/reference/gui/examples/*.io)
        from .frontend import scheme
        from .frontend import shapes as shapelib
        res = scheme.run_file(path)
        if not res.shapes:
            raise SystemExit(f"{path}: script produced no shapes")
        return shapelib.union(*res.shapes), res
    return frep.load(path)[0].tree, None


def _load(path: str):
    from .tape.tape import compile_tree
    return compile_tree(_load_tree(path)[0])


def _save(path, img):
    from .io.png import write_png
    write_png(path, img)
    print(f"wrote {path}", file=sys.stderr)


def _depth_to_u8(depth, size):
    return (depth.astype(np.float32) / size * 255.0).astype(np.uint8)


def _normals_to_rgb(normals):
    return ((normals * 127.0) + 128.0).clip(0, 255).astype(np.uint8)



def _apply_sets(tape, sets):
    """--set NAME=VALUE overrides for named vars (frontend var()):
    pure imm-vector data, so the same compiled executables serve every
    value (Tape.imms_with)."""
    if not sets:
        return tape
    import dataclasses
    vals = {}
    for s in sets:
        name, eq, v = s.partition("=")
        if not eq:
            raise SystemExit(f"--set expects NAME=VALUE, got {s!r}")
        vals[name] = float(v)
    missing = [k for k in vals if k not in tape.params]
    if missing:
        raise SystemExit(f"unknown var(s) {missing}; this shape has "
                         f"{sorted(tape.params) or 'none'}")
    return dataclasses.replace(tape, imms=tape.imms_with(vals))


def cmd_render2d(args):
    from .render import pipeline2d, brute, unrolled
    tape = _apply_sets(_load(args.file), getattr(args, "sets", None))
    if getattr(args, "sharded", False):
        from .parallel import sharded
        fn = (sharded.render2d_sharded_unrolled
              if args.engine == "unrolled" else sharded.render2d_sharded)
    else:
        fn = (brute.render2d_brute if args.brute else
              unrolled.render2d if args.engine == "unrolled" else
              pipeline2d.render2d)
    img = fn(tape, size=args.size)
    _save(args.out, (img * np.uint8(255)))
    if args.check:
        # CPU-oracle cross-check, the render_2d.cpp:71-74 analog (exact:
        # both paths evaluate the same clause semantics)
        from . import oracle
        from .render import camera
        p = camera.pixel_centers(args.size)
        X, Y = np.meshgrid(p, p)
        ref = oracle.eval_f(tape, X, Y) < 0
        mism = (ref != img).mean()
        print(f"oracle cross-check: mismatch {mism:.2e}")
        if mism > 1e-4:
            sys.exit(f"FAIL: {mism:.2%} pixels differ from the oracle")


def _add_ssao_flags(p):
    p.add_argument("--ssao-mode", default=None,
                   choices=["static", "gather"],
                   help="static: gather-free fixed-offset AO (TPU-fast); "
                        "gather: the reference's rotated-hemisphere "
                        "mechanism (default: config.ssao_mode)")
    p.add_argument("--ao-scale", type=int, default=None, metavar="K",
                   help="compute raw AO at 1/K resolution (1 = full-res "
                        "reference-parity; default: config auto)")


def _ssao_override(args):
    """config.override(...) context from the --ssao-mode/--ao-scale flags
    (ADVICE round-4: full-res reference-parity AO must be reachable from
    the CLI without editing code)."""
    from . import config
    kw = {}
    if getattr(args, "ssao_mode", None) is not None:
        kw["ssao_mode"] = args.ssao_mode
    if getattr(args, "ao_scale", None) is not None:
        kw["ao_scale"] = args.ao_scale
    return config.override(**kw)


def cmd_render3d(args):
    from .render import effects
    from .render import camera
    tape = _apply_sets(_load(args.file), getattr(args, "sets", None))
    if getattr(args, "sharded", False):
        from .parallel import sharded
        render3d = (sharded.render3d_sharded_unrolled
                    if args.engine == "unrolled"
                    else sharded.render3d_sharded)
    elif args.engine == "unrolled":
        from .render.unrolled import render3d
    else:
        from .render.pipeline3d import render3d
    mat = camera.bench3d_view() if args.view == "bench" else (
        camera.gui3d_view() if args.view == "gui" else camera.identity3())
    depth, normals = render3d(tape, mat=mat, size=args.size)
    base = args.out.rsplit(".", 1)[0]
    if args.mode in ("heightmap", "all"):
        _save(f"{base}_depth.png", _depth_to_u8(depth, args.size))
    if args.mode in ("normals", "all"):
        _save(f"{base}_norm.png", _normals_to_rgb(normals))
    with _ssao_override(args):
        if args.mode in ("ssao", "all"):
            occ = np.asarray(effects.draw_ssao(depth, normals))
            _save(f"{base}_ssao.png", (occ * 255).astype(np.uint8))
        if args.mode in ("shaded", "all"):
            img = np.asarray(effects.draw_shaded(depth, normals))
            _save(f"{base}_shaded.png", (img * 255).astype(np.uint8))


def _table(tape, sizes, frame_of_size, stop_ms=None, profile_dir=None):
    from .utils.timing import time_frames
    import contextlib
    if profile_dir:
        # jax.profiler traces (the nvprof/ptxas-line-info analog,
        # /root/reference/src/CMakeLists.txt:1): view with xprof/tensorboard
        import jax
        ctx = jax.profiler.trace(profile_dir)
        print(f"writing profiler trace to {profile_dir}", file=sys.stderr)
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        print(f"{'size':>6} {'mean_ms':>10}")
        for size in sizes:
            frame, fargs = frame_of_size(size)
            ms = time_frames(frame, *fargs, n=args_runs(size), n0=5)
            print(f"{size:>6} {ms:>10.4f}")
            if stop_ms and ms > stop_ms:
                print(f"(stopped: mean > {stop_ms} ms)", file=sys.stderr)
                break


def args_runs(size):
    return 50 if size <= 1024 else 20


def cmd_table2d(args):
    # sizes per /root/reference/benchmark/render_2d_table.cpp:50
    import jax.numpy as jnp
    from .ops.tape_data import TapeData
    from .render import camera, pipeline2d, unrolled
    tape = _load(args.file)
    mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)

    if args.engine == "unrolled":
        r = unrolled.get_renderer(tape)

        def frame_of_size(size):
            # compile + converge caps to the snug steady-state tier
            # (3 same-count frames from a cold obs cache, 2 warm)
            for _ in range(4):
                r.render2d(size=size)
                if r._snug(("2d", size)):
                    break
            caps = r._caps2d(size)

            def frame(mat):
                img, _ = r._r2(r._imms_j, mat, z, size, *caps)
                return img
            return frame, (mat,)
    else:
        td = TapeData.from_tape(tape)

        def frame_of_size(size):
            n_side = size // pipeline2d.TILE

            def frame(mat):
                img, _ = pipeline2d.render_tile_block(
                    td, mat, z, size, jnp.int32(0), n_side,
                    jnp.int32(0), n_side)
                return img
            return frame, (mat,)

    sizes = args.sizes or [256, 512, 1024, 2048, 3072, 4096]
    _table(tape, sizes, frame_of_size, profile_dir=args.profile)


def cmd_table3d(args):
    # sizes + 750 ms stop per benchmark/render_3d_table.cpp:51,71-73
    import jax.numpy as jnp
    from .ops.tape_data import TapeData
    from .render import camera, unrolled
    tape = _load(args.file)
    mat = jnp.asarray(camera.bench3d_view())

    if args.engine == "unrolled":
        r = unrolled.get_renderer(tape)
        mat_np = camera.bench3d_view()

        def frame_of_size(size):
            # converge to the snug steady-state tier (see table2d)
            return r.steady_frame3d(mat_np, size), (mat,)
    else:
        import dataclasses

        import numpy as np

        from . import config as _config
        from .render.pipeline3d import cached_frame3d
        td = TapeData.from_tape(tape)

        def frame_of_size(size):
            # converge the capacity config exactly like render3d's
            # grow-and-retry, then time the converged zero-recompile
            # frame (cached_frame3d, the r5 interactive 3D contract)
            cfg = _config.get()
            n = size // 64
            while True:
                fr = cached_frame3d(td, size, True, cfg)
                _, _, counters = fr(td, mat)
                c = np.asarray(counters)
                if c[0] <= c[2] and c[1] <= c[3]:
                    break
                grow = {}
                if c[0] > c[2]:
                    grow["p0_scale"] = cfg.p0_scale * 2
                if c[1] > c[3]:
                    grow["c1_scale"] = cfg.c1_scale * 2
                cfg = dataclasses.replace(cfg, **grow)
                if cfg.p0_scale > 64 * n and cfg.c1_scale > 64 * 64 * n:
                    break

            def frame(mat):
                return fr(td, mat)[0]
            return frame, (mat,)

    sizes = args.sizes or [256, 512, 1024, 1536, 2048]
    _table(tape, sizes, frame_of_size, stop_ms=750.0,
           profile_dir=args.profile)


def cmd_brute(args):
    """Three-way consistency + speed comparison, like benchmark/brute.cu:
    (a) unrolled per-shape XLA kernel, (b) brute interpreter, (c) full
    culling pipeline."""
    import jax
    import jax.numpy as jnp
    from .ops.tape_data import TapeData
    from .render import brute, camera, pipeline2d
    from .utils.timing import time_frames
    tape = _load(args.file)
    td = TapeData.from_tape(tape)
    size = args.size
    mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)
    n_side = size // pipeline2d.TILE

    img_c = pipeline2d.render2d(tape, size=size)
    img_b = brute.render2d_brute(tape, size=size)
    agree = (img_c == img_b).mean()
    print(f"culling vs brute agreement: {agree:.6f}")

    unrolled = brute.build_unrolled_f(tape)
    p = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0

    def frame_a(mat):
        x, y = camera.transform2(mat, p[None, :], p[:, None], jnp)
        return unrolled(jnp.broadcast_to(x, (size, size)),
                        jnp.broadcast_to(y, (size, size))) < 0.0

    def frame_b(mat):
        from .ops import eval_scan
        x, y = camera.transform2(mat, p[None, :], p[:, None], jnp)
        return eval_scan.eval_f(td, jnp.broadcast_to(x, (size, size)),
                                jnp.broadcast_to(y, (size, size))) < 0.0

    def frame_c(mat):
        img, _ = pipeline2d.render_tile_block(
            td, mat, z, size, jnp.int32(0), n_side, jnp.int32(0), n_side)
        return img

    for name, f in [("unrolled-XLA", frame_a), ("brute-interp", frame_b),
                    ("full-pipeline", frame_c)]:
        ms = time_frames(f, mat, n=20, n0=3)
        print(f"{name:>14}: {ms:9.3f} ms @ {size}")


def cmd_shorten_stats(args):
    """Per-tile shortened-tape length distribution at the 64-px stage —
    the tape_shortening figure data (benchmark/tape_shortening.cpp; that
    executable ships broken — references a missing .frep — so this is the
    working equivalent)."""
    import jax.numpy as jnp
    from .ops import kernels
    from .ops.tape_data import TapeData
    from .render import camera
    from .render.pipeline2d import (TILE, _shorten_prepass, _tile_boxes_2d,
                                    tape_meta)
    tape = _load(args.file)
    td = TapeData.from_tape(tape)
    n_side = args.size // TILE
    meta = jnp.asarray(tape_meta(td)).at[6].set(td.num_runs)
    branch_ops, remap = kernels.build_remap(td.ops_present)
    remap_j = jnp.asarray(remap)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    boxes = _tile_boxes_2d(n_side, jnp.asarray(camera.identity2()),
                           jnp.float32(0.0))
    s_cap = max(8, -(-td.num_slots // 8) * 8)
    status, codes = kernels.interval_shorten(meta, td.packed, td.imms,
                                             runs_full, boxes,
                                             branch_ops=branch_ops,
                                             s_cap=s_cap)
    _, _, _, lens = _shorten_prepass(codes, td.packed, td.imms,
                                     td.length, remap_j)
    status = np.asarray(status)
    lens = np.asarray(lens)
    amb = lens[status == kernels.ST_AMBIG]
    print(f"tape length {tape.length}; tiles {n_side}x{n_side}: "
          f"empty {(status == 0).sum()} filled {(status == 1).sum()} "
          f"ambiguous {(status == 2).sum()}")
    if len(amb):
        q = np.percentile(amb, [0, 25, 50, 75, 90, 100]).astype(int)
        print(f"shortened lengths (ambiguous tiles): min {q[0]} p25 {q[1]} "
              f"median {q[2]} p75 {q[3]} p90 {q[4]} max {q[5]} "
              f"mean {amb.mean():.1f} ({amb.mean() / tape.length:.1%} "
              "of full)")


def cmd_circle_figure(args):
    """Stage-decision figure for a circle: colors each pixel by which
    stage decided it (benchmark/circle.cpp:42-103)."""
    import jax.numpy as jnp
    from .frontend import shapes
    from .ops import kernels
    from .ops.tape_data import TapeData
    from .render import camera
    from .render.pipeline2d import TILE, _tile_boxes_2d, tape_meta, render2d
    from .tape.tape import compile_tree
    tape = compile_tree(shapes.circle(0.8))
    td = TapeData.from_tape(tape)
    size = args.size
    n_side = size // TILE
    meta = jnp.asarray(tape_meta(td)).at[6].set(td.num_runs)
    branch_ops, remap = kernels.build_remap(td.ops_present)
    runs_full = jnp.asarray(remap)[td.runs & 0xFF] | (td.runs & ~0xFF)
    boxes = _tile_boxes_2d(n_side, jnp.asarray(camera.identity2()),
                           jnp.float32(0.0))
    status, _ = kernels.interval_shorten(meta, td.packed, td.imms,
                                         runs_full, boxes,
                                         branch_ops=branch_ops,
                                         s_cap=max(8, -(-td.num_slots // 8) * 8))
    status = np.asarray(status).reshape(n_side, n_side)
    img = render2d(tape, size=size)
    rgb = np.zeros((size, size, 3), np.uint8)
    st = np.repeat(np.repeat(status, TILE, 0), TILE, 1)
    rgb[st == 0] = (40, 40, 40)        # tile-stage empty
    rgb[st == 1] = (60, 120, 220)      # tile-stage filled
    rgb[(st == 2) & img] = (240, 160, 40)    # pixel-stage filled
    rgb[(st == 2) & ~img] = (120, 80, 20)    # pixel-stage empty
    _save(args.out, rgb)


def _heat_png(path, h):
    h = h / max(h.max(), 1e-9)
    _save(path, (np.sqrt(h) * 255).astype(np.uint8))


def cmd_heatmap2d(args):
    if args.engine == "unrolled":
        from .render.workmap import workmap2d
        heat, totals = workmap2d(_load(args.file), size=args.size)
        print(json.dumps(totals))
        _heat_png(args.out, heat)
        return
    from .render.heatmap import render2d_heatmap
    _heat_png(args.out, render2d_heatmap(_load(args.file), size=args.size))


def cmd_heatmap3d(args):
    from .render import camera
    if args.engine == "unrolled":
        from .render.workmap import workmap3d
        heat, totals = workmap3d(_load(args.file),
                                 mat=camera.bench3d_view(), size=args.size)
        print(json.dumps(totals))
        _heat_png(args.out, heat)
        return
    from .render.heatmap import render3d_heatmap
    _heat_png(args.out, render3d_heatmap(_load(args.file),
                                         mat=camera.bench3d_view(),
                                         size=args.size))


def cmd_table_effects(args):
    """Frame times for depth+normals / +SSAO / +shaded at each size —
    the render_effects benchmark
    (/root/reference/benchmark/render_effects.cpp), on the production
    (unrolled) engine with effects fused into the frame."""
    import jax.numpy as jnp
    from .render import camera, effects, unrolled
    from .utils.timing import time_frames
    tape = _load(args.file)
    r = unrolled.get_renderer(tape)
    mat_np = camera.bench3d_view()
    jmat = jnp.asarray(mat_np)
    print(f"{'size':>6} {'depth+normals':>14} {'+ssao':>10} "
          f"{'+shaded':>10}   (ms/frame)")
    for size in (int(s) for s in args.sizes.split(",")):
        base = r.steady_frame3d(mat_np, size)

        def f_plain(mat):
            return base(mat)[0]

        def f_ssao(mat):
            depth, normals = base(mat)
            return effects.draw_ssao(depth, normals)

        def f_shaded(mat):
            depth, normals = base(mat)
            return effects.draw_shaded(depth, normals)

        with _ssao_override(args):
            cols = [time_frames(f, jmat, n=args.frames, n0=3)
                    for f in (f_plain, f_ssao, f_shaded)]
        print(f"{size:>6} {cols[0]:>14.2f} {cols[1]:>10.2f} "
              f"{cols[2]:>10.2f}", flush=True)


def cmd_tape_time(args):
    # mean tape construction time over 100 builds
    # (/root/reference/benchmark/tape_building_time.cpp:44-57)
    from .tape.tape import compile_tree
    tree, _ = _load_tree(args.file)
    compile_tree(tree)
    t0 = time.perf_counter()
    for _ in range(100):
        compile_tree(tree)
    ms = (time.perf_counter() - t0) / 100 * 1e3
    print(f"tape build: {ms:.3f} ms mean over 100")


def cmd_dump_tape(args):
    # clause listing, like benchmark/print_tape_table.cpp:44-51
    tape = _load(args.file)
    print(tape.pretty(limit=args.limit))
    print(f"length={tape.length} slots={tape.num_slots} "
          f"choices={tape.num_choices}")


def cmd_mesh(args):
    """Mesh extraction + STL export (io/mesh.py) — the geometry-export
    step the reference's users go back to libfive for."""
    from .io import mesh
    from .tape.tape import compile_tree
    tree, script = _load_tree(args.file)
    lo, hi = args.bounds
    if (args.bounds == (-1.0, 1.0) and script is not None
            and script.bounds is not None):
        # honor the scene's (set-bounds! lo hi) when the user didn't
        # pass --bounds (per-axis; the box need not be a cube)
        lo = np.asarray(script.bounds[0], np.float32)
        hi = np.asarray(script.bounds[1], np.float32)
        print(f"using script bounds {script.bounds}", file=sys.stderr)
    tape = compile_tree(tree)
    tris = mesh.mesh_tape(tape, n=args.size, lo=lo, hi=hi,
                          method=args.method)
    if args.out.endswith(".obj"):
        mesh.write_obj(args.out, tris)
    else:
        mesh.write_stl(args.out, tris)
    print(f"mesh: {len(tris)} triangles, area {mesh.mesh_area(tris):.4f}, "
          f"volume {mesh.mesh_volume(tris):.4f}")
    print(f"wrote {args.out}", file=sys.stderr)


def cmd_convert(args):
    """Convert any loadable shape source — a ``.npz`` tape checkpoint
    (``cli fit --out``), a ``.frep`` archive, or a ``stress:N`` synthetic
    model — into a ``.frep`` archive via the tape decompiler
    (tape/decompile.py).  The reference has no such path: its tapes are a
    one-way GPU upload (/root/reference/src/tape.cpp:223-227)."""
    from .frontend import frep
    from .io import checkpoint
    from .tape.decompile import tape_to_tree
    if args.file.endswith(".npz"):
        tape = checkpoint.load_tape(args.file)
    else:
        tape = _load(args.file)
    frep.dump([frep.ArchiveShape(tree=tape_to_tree(tape), name=args.name)],
              args.out)
    print(f"wrote {args.out}", file=sys.stderr)


def _oracle_fill(tape, size):
    """NumPy-oracle boolean fill image (the fit target / render-out
    convention — one definition so the two can't drift apart)."""
    from . import oracle
    from .render import camera
    p = camera.pixel_centers(size)
    X, Y = np.meshgrid(p, p)
    return oracle.eval_f(tape, X, Y) < 0


def _oracle_depth(tape, size):
    """NumPy-oracle dense-grid depth (voxel units, the pipeline3d
    depth convention: 0 = empty, else top filled voxel index + 1)."""
    from . import oracle
    from .render import camera
    c = camera.pixel_centers(size)
    Z, Y, X = np.meshgrid(c, c, c, indexing="ij")
    filled = oracle.eval_f(tape, X, Y, Z) < 0
    zi = np.arange(size, dtype=np.float32)[:, None, None] + 1.0
    return np.max(np.where(filled, zi, 0.0), axis=0)


def cmd_fit(args):
    """Differentiable fitting (beyond the reference): gradient-descend
    FILE's tape constants until its soft render matches a target —
    another model's oracle render (.frep) or a grayscale PNG (cli
    render2d / render3d conventions).  --mode 2d fits a fill image;
    --mode 3d fits a DEPTH image via volume-compositing soft depth
    (sharded.make_fit_step_3d).  Runs sharded over all visible devices
    (one psum per step); --engine unrolled trains through the production
    evaluator (parallel/sharded.py::make_fit_step[_unrolled])."""
    import jax.numpy as jnp
    from .io import checkpoint
    from .ops.tape_data import TapeData
    from .parallel import sharded
    from .render import camera
    tape = _load(args.file)
    fit3d = args.mode == "3d"
    grad_mask = None
    if getattr(args, "params_only", False):
        if not tape.params:
            sys.exit("--params-only: the shape declares no named vars")
        grad_mask = np.zeros(tape.length, np.float32)
        for idxs in tape.params.values():
            grad_mask[list(idxs)] = 1.0
    # 3d's dense grid is cubed (size^3 voxels through value_and_grad
    # every step): default small; the culled (depth-window) engine is
    # O(size^2 * window) and affords render-resolution fits
    if args.size is not None:
        size = args.size
    elif fit3d:
        size = 128 if args.engine == "culled" else 32
    else:
        size = 256
    if args.lr is None:
        # voxel-unit losses steepen with resolution: the culled 3d
        # default matches its render-resolution regime
        args.lr = (2e-5 if args.engine == "culled" else 3e-4) if fit3d \
            else 1e-2
    if args.target.endswith(".png"):
        from .io.png import read_png_gray
        tgt = read_png_gray(args.target).astype(np.float32) / 255.0
        if tgt.shape != (size, size):
            sys.exit(f"target is {tgt.shape}, expected {(size, size)}")
        if fit3d:
            tgt *= size       # undo render3d's _depth_to_u8 scaling
    elif fit3d:
        tgt = _oracle_depth(_load(args.target), size)
    else:
        tgt = _oracle_fill(_load(args.target), size).astype(np.float32)
    mesh = sharded.make_mesh()
    tgt_j = jnp.asarray(tgt)
    every = max(1, args.steps // 10)
    if fit3d:
        mat = jnp.asarray(camera.identity3())
        if args.engine == "culled":
            step3 = sharded.make_fit_step_3d_window(tape, size, mesh,
                                                    lr=args.lr,
                                                    grad_mask=grad_mask)
        else:
            step3 = sharded.make_fit_step_3d(tape, size, mesh, lr=args.lr,
                                             grad_mask=grad_mask)
        step = lambda st, t, m, z_: step3(st, t, m)
        state = jnp.asarray(tape.imms)
    elif args.engine == "culled":
        stepc = sharded.make_fit_step_culled(tape, size, mesh, lr=args.lr,
                                             grad_mask=grad_mask)
        step = lambda st, t, m, z_: stepc(st, np.asarray(t), m, float(z_))
        state = jnp.asarray(tape.imms)
    elif args.engine == "unrolled":
        step = sharded.make_fit_step_unrolled(tape, size, mesh,
                                               lr=args.lr,
                                               grad_mask=grad_mask)
        state = jnp.asarray(tape.imms)
    else:
        step = sharded.make_fit_step(size, mesh, lr=args.lr,
                                     grad_mask=grad_mask)
        state = TapeData.from_tape(tape)
    if not fit3d:
        mat = jnp.asarray(camera.identity2())
    z = jnp.float32(0.0)
    for i in range(args.steps):
        loss, state = step(state, tgt_j, mat, z)
        if i % every == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.6f}")
    fitted = np.asarray(
        state if (fit3d or args.engine in ("unrolled", "culled"))
        else state.imms)
    checkpoint.save_tape(args.out, tape, imms=fitted)
    print(f"wrote {args.out}", file=sys.stderr)
    if args.out_frep:
        # decompile the fitted tape back to an expression and archive it
        # — the artifact loads anywhere .frep does (our viewer/CLI, the
        # reference's benchmarks)
        from .frontend import frep
        from .tape.decompile import tape_to_tree
        t2 = checkpoint.load_tape(args.out)
        frep.dump([frep.ArchiveShape(tree=tape_to_tree(t2), name="fitted")],
                  args.out_frep)
        print(f"wrote {args.out_frep}", file=sys.stderr)
    if args.render_out:
        t2 = checkpoint.load_tape(args.out)
        if fit3d:
            _save(args.render_out, _depth_to_u8(_oracle_depth(t2, size),
                                                size))
        else:
            _save(args.render_out, _oracle_fill(t2, size) * np.uint8(255))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="mpr_tpu.cli", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render2d")
    p.add_argument("file")
    p.add_argument("--set", dest="sets", action="append", metavar="NAME=V",
                   help="override a named var (frontend var() / Scheme "
                   "(var ...)); repeatable")
    p.add_argument("--engine", default="interp",
                   choices=["interp", "unrolled"],
                   help="interp: no per-shape compile (interactive); "
                        "unrolled: per-shape XLA specialization (fastest "
                        "frames, compile amortized by the persistent "
                        "cache)")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--out", default="out_2d.png")
    p.add_argument("--brute", action="store_true")
    p.add_argument("--sharded", action="store_true",
                   help="shard tile rows over all visible devices "
                        "(either engine; bit-exact vs single-chip)")
    p.add_argument("--check", action="store_true",
                   help="cross-check against the NumPy oracle")
    p.set_defaults(fn=cmd_render2d)

    p = sub.add_parser("render3d")
    p.add_argument("file")
    p.add_argument("--set", dest="sets", action="append", metavar="NAME=V",
                   help="override a named var; repeatable")
    p.add_argument("--engine", default="interp",
                   choices=["interp", "unrolled"])
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", default="out_3d.png")
    p.add_argument("--mode", default="all",
                   choices=["heightmap", "normals", "ssao", "shaded", "all"])
    p.add_argument("--view", default="bench",
                   choices=["identity", "bench", "gui"])
    p.add_argument("--sharded", action="store_true",
                   help="shard tile rows over all visible devices")
    _add_ssao_flags(p)
    p.set_defaults(fn=cmd_render3d)

    for name, fn, sizes_default in [("table2d", cmd_table2d, None),
                                    ("table3d", cmd_table3d, None)]:
        p = sub.add_parser(name)
        p.add_argument("file")
        p.add_argument("--engine", default="unrolled",
                       choices=["interp", "unrolled"],
                       help="benchmark tables default to the unrolled "
                            "engine (the repeated-render regime the "
                            "reference protocol measures)")
        p.add_argument("--sizes", type=lambda s: [int(x) for x in
                                                  s.split(",")],
                       default=sizes_default)
        p.add_argument("--profile", default=None, metavar="DIR",
                       help="write a jax.profiler trace")
        p.set_defaults(fn=fn)

    p = sub.add_parser("brute")
    p.add_argument("file")
    p.add_argument("--size", type=int, default=1024)
    p.set_defaults(fn=cmd_brute)

    p = sub.add_parser("shorten-stats")
    p.add_argument("file")
    p.add_argument("--size", type=int, default=1024)
    p.set_defaults(fn=cmd_shorten_stats)

    p = sub.add_parser("circle-figure")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", default="out_circle.png")
    p.set_defaults(fn=cmd_circle_figure)

    p = sub.add_parser("heatmap2d")
    p.add_argument("file")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--out", default="out_heat2d.png")
    p.add_argument("--engine", choices=["interp", "unrolled"],
                   default="interp",
                   help="unrolled: production-engine workmap "
                        "(render/workmap.py) + work totals on stdout")
    p.set_defaults(fn=cmd_heatmap2d)

    p = sub.add_parser("heatmap3d")
    p.add_argument("file")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", default="out_heat3d.png")
    p.add_argument("--engine", choices=["interp", "unrolled"],
                   default="interp",
                   help="unrolled: production-engine workmap "
                        "(render/workmap.py) + work totals on stdout")
    p.set_defaults(fn=cmd_heatmap3d)

    p = sub.add_parser("table-effects")
    p.add_argument("file")
    p.add_argument("--sizes", default="1024")
    p.add_argument("--frames", type=int, default=20)
    _add_ssao_flags(p)
    p.set_defaults(fn=cmd_table_effects)

    p = sub.add_parser("tape-time")
    p.add_argument("file")
    p.set_defaults(fn=cmd_tape_time)

    p = sub.add_parser("dump-tape")
    p.add_argument("file")
    p.add_argument("--limit", type=int, default=60)
    p.set_defaults(fn=cmd_dump_tape)

    p = sub.add_parser("fit", help="fit tape constants to a target image")
    p.add_argument("file")
    p.add_argument("--target", required=True,
                   help=".frep (oracle-rendered) or grayscale .png")
    p.add_argument("--mode", default="2d", choices=["2d", "3d"],
                   help="2d: soft fill vs a fill image; 3d: volume-"
                        "compositing soft depth vs a depth image "
                        "(--size is the voxel grid side, CUBED in "
                        "memory — keep it small)")
    p.add_argument("--size", type=int, default=None,
                   help="default 256 (2d) / 32 (3d: size^3 voxels per "
                        "gradient step)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--params-only", action="store_true",
                   help="update only the named vars (frontend var() / "
                   "Scheme (var ...)) and freeze every other constant "
                   "(libfive-Studio-style direct manipulation via "
                   "gradient descent)")
    p.add_argument("--lr", type=float, default=None,
                   help="default 1e-2 (2d) / 3e-4 (3d: voxel-unit loss)")
    p.add_argument("--engine", default="scan",
                   choices=["scan", "unrolled", "culled"],
                   help="scan: differentiable interpreter; unrolled: "
                        "production evaluator, dense pixels; culled: "
                        "production ladder with the backward pass on "
                        "ambiguous tiles only (2d) / a depth window "
                        "(3d) — O(boundary), fits at render sizes")
    p.add_argument("--out", default="fitted.npz")
    p.add_argument("--out-frep", default="",
                   help="also decompile the fitted tape to a .frep "
                        "archive (loadable by the reference tools and "
                        "the viewer)")
    p.add_argument("--render-out", default="",
                   help="also render the fitted tape (oracle) to PNG")
    p.set_defaults(fn=cmd_fit)

    p = sub.add_parser("convert", help="decompile any shape source "
                       "(.npz checkpoint / .frep / .io / stress:N) to a "
                       ".frep archive")
    p.add_argument("file")
    p.add_argument("out")
    p.add_argument("--name", default="converted")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("mesh", help="extract a watertight triangle mesh "
                       "(marching tetrahedra over the unrolled evaluator) "
                       "and write binary STL — geometry export beyond the "
                       "render-only reference")
    p.add_argument("file")
    p.add_argument("--size", type=int, default=64,
                   help="voxel grid resolution per axis")
    p.add_argument("--bounds", type=float, nargs=2, default=(-1.0, 1.0),
                   metavar=("LO", "HI"))
    p.add_argument("--method", default="mt", choices=("mt", "dc"),
                   help="mt: marching tetrahedra (robust); dc: dual "
                   "contouring (sharp edges via Deriv-evaluator normals)")
    p.add_argument("--out", default="out.stl",
                   help=".stl (binary) or .obj (welded vertices)")
    p.set_defaults(fn=cmd_mesh)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
