"""A/B: 2^3 sub-refinement of surviving 4^3 cells in the unrolled 3D
voxel stage (VERDICT r4 item 7 lever (b)) vs the single-phase stage.

Remote compiles of gears-scale unrolled ladders cost ~35 min each, so
the protocol is staged: (1) probe graph (stages A/B/B' + children
interval classify, debug_stage="R") gives the child-survival count m3
AND, timed against the single-phase ladder's measured stage prefix, the
marginal cost of the refinement's interval classify; (2) the projected
refined frame time is computed from the round-4 stage split; (3) only
if the projection promises a win is the full refined ladder compiled
and timed.

Usage: python benchmarks/measure_refine2.py [model ...]
"""
import faulthandler
import sys
import time

faulthandler.dump_traceback_later(3600, repeat=True)
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils.timing import time_frames

SIZE = 1024
MODELS = sys.argv[1:] or ["involute_gear_3d"]
print("backend:", jax.default_backend(), file=sys.stderr, flush=True)
mat = np.asarray(camera.bench3d_view())

for name in MODELS:
    tree = frep.load(f"/root/reference/benchmark/files/{name}.frep")[0].tree
    tape = compile_tree(tree)
    r = unrolled.UnrolledRenderer(tape)
    for _ in range(3):
        r.render3d(mat=mat, size=SIZE)
    p0, c1, c2, c2a, c2b, pn = r._caps3d(SIZE)
    skip4 = r._skip4(SIZE)
    if skip4:
        print(f"{name}: skip4 model, refinement n/a", flush=True)
        continue
    print(f"{name}: caps p0={p0} c1={c1} c2={c2} pn={pn}", flush=True)
    jmat = jnp.asarray(mat)

    def ladder(c3, dbg=""):
        return jax.jit(lambda m: unrolled._render3d_impl(
            r.fi, r.f, r.fd, m, SIZE, p0, c1, c2, pn, True, False,
            debug_stage=dbg, c3=c3))

    # ---- stage 1: probe (compile already cached from a prior run or
    # paid once here) -----------------------------------------------------
    t0 = time.time()
    probe = ladder(8 * c2, "R")
    cnt = np.asarray(probe(jmat)[2])
    m3 = int(cnt[0])
    frac = m3 / (8.0 * c2)
    print(f"  ambiguous 2^3 children: {m3} = {100*frac:.1f}% of 8*c2 "
          f"lanes [probe ready in {time.time()-t0:.0f}s]", flush=True)

    t_probe = time_frames(lambda m: probe(m)[2], jmat, n=20, n0=3)
    fa = ladder(0)
    t_single = time_frames(lambda m: fa(m)[0], jmat, n=20, n0=3)
    t_bp = time_frames(lambda m: ladder(0, "Bp")(m)[2], jmat, n=20, n0=3)
    print(f"  single-phase full: {t_single:.2f} ms; through-B'+compact "
          f"(Bp): {t_bp:.2f} ms; probe (Bp prefix + children interval "
          f"classify): {t_probe:.2f} ms", flush=True)

    # projection: refined = single - voxel_stage + children_classify
    #             + child_compact(~compaction cost of 8*c2 lanes)
    #             + voxel_stage * (m3*8 lanes / (n2*64 lanes))
    da, _, ca = fa(jmat)
    n2 = int(np.asarray(ca)[2])
    t_children = t_probe - t_bp
    # voxel-stage cost from this run's own numbers: single minus its
    # prefix minus (composition+normals, ~5 ms from the r4 stage split)
    t_voxel = t_single - t_bp - 5.0
    t_refined_proj = (t_single - t_voxel + t_children
                      + t_voxel * (m3 * 8.0) / (n2 * 64.0))
    print(f"  n2={n2}; voxel~{t_voxel:.1f} ms; children classify "
          f"{t_children:.2f} ms; projected refined "
          f"{t_refined_proj:.2f} ms vs single {t_single:.2f} ms",
          flush=True)

    if t_refined_proj > t_single * 0.92:
        print(f"  projection shows <8% win -> skipping the ~40 min "
              f"refined-ladder compile (negative result)", flush=True)
        continue

    # ---- stage 2: the real refined ladder -------------------------------
    c3 = max(256, -(-int(m3 * 1.05) // 256) * 256)
    fb = ladder(c3)
    tb = time_frames(lambda m: fb(m)[0], jmat, n=20, n0=3)
    db, _, cb = fb(jmat)
    print(f"  refined (c3={c3}): {tb:.2f} ms; counters="
          f"{np.asarray(cb)}; depth bit-equal: "
          f"{np.array_equal(np.asarray(da), np.asarray(db))}", flush=True)
