"""Perfect-occlusion upper bound for the unrolled 3D voxel stage.

Gears' 54 ms is 43 ms of voxel evaluation over a2 ≈ 271k ambiguous 4^3
cells (docs/perf_notes.md round-4 split).  Before building a two-phase
(front-to-back) voxel stage, measure the prize: how many of those cells
lie entirely at-or-below the FINAL depth surface of their xy block —
i.e. would be culled by an oracle that already knew the answer.  The
two-phase scheme can recover at most that fraction (minus its own
compaction/composition overhead).

Usage: python benchmarks/analyze_occlusion_3d.py [model] [size]
"""
import sys

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

from mpr_tpu.frontend import frep
from mpr_tpu.render import camera, unrolled
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils import compcache

compcache.enable()
MODEL = sys.argv[1] if len(sys.argv) > 1 else "involute_gear_3d"
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

tree = frep.load(f"/root/reference/benchmark/files/{MODEL}.frep")[0].tree
tape = compile_tree(tree)
r = unrolled.UnrolledRenderer(tape)
mat = camera.bench3d_view()
depth, _ = r.render3d(mat=mat, size=SIZE, with_normals=False)
print(f"{MODEL} @{SIZE}: depth rendered", flush=True)

p0, c1, c2, _c2a, _c2b, pn = r._caps3d(SIZE)
skip4 = r._skip4(SIZE)
if skip4:
    print("model uses skip4; two-phase targets the 16^3 direct path "
          "instead — analysis below treats 16^3 cells", flush=True)

# re-run the interval stages to recover the surviving 4^3 cell list
# (mirrors _render3d_impl; c2 also bounds the list cap)
from mpr_tpu.render.unrolled import (_cell_boxes_3d, _classify,
                                     _compact_ids)

n = SIZE // 64
c4 = jnp.arange(64, dtype=jnp.int32)
cx4, cy4, cz4 = c4 % 4, (c4 // 4) % 4, c4 // 16


def survivors(mat):
    fi = r.fi
    t = jnp.arange(n * n * n, dtype=jnp.int32)
    tx, ty, tz = t % n, (t // n) % n, t // (n * n)
    lo, hi = fi(*_cell_boxes_3d(mat, tx, ty, tz, n))
    st0 = _classify(lo, hi)
    h0 = jnp.max(jnp.where((st0 == unrolled.ST_FILLED).reshape(n, n, n),
                           (jnp.arange(n, dtype=jnp.int32) + 1)[:, None,
                                                                None] * 64,
                           0), axis=0).reshape(-1)
    occl0 = (tz + 1) * 64 <= h0[ty * n + tx]
    ids0, n0 = _compact_ids((st0 == unrolled.ST_AMBIG) & ~occl0, p0)
    txp, typ, tzp = ids0 % n, (ids0 // n) % n, ids0 // (n * n)
    g16x = (txp[:, None] * 4 + cx4[None, :]).reshape(-1)
    g16y = (typ[:, None] * 4 + cy4[None, :]).reshape(-1)
    g16z = (tzp[:, None] * 4 + cz4[None, :]).reshape(-1)
    lo, hi = fi(*_cell_boxes_3d(mat, g16x, g16y, g16z, 4 * n))
    okB = jnp.arange(p0 * 64) < jnp.minimum(n0, p0) * 64
    st1 = jnp.where(okB, _classify(lo, hi), 0)
    ids1, n1 = _compact_ids(st1 == unrolled.ST_AMBIG, c1)
    g16x_c, g16y_c, g16z_c = g16x[ids1], g16y[ids1], g16z[ids1]
    g4x = (g16x_c[:, None] * 4 + cx4[None, :]).reshape(-1)
    g4y = (g16y_c[:, None] * 4 + cy4[None, :]).reshape(-1)
    g4z = (g16z_c[:, None] * 4 + cz4[None, :]).reshape(-1)
    lo, hi = fi(*_cell_boxes_3d(mat, g4x, g4y, g4z, 16 * n))
    okC = jnp.arange(c1 * 64) < jnp.minimum(n1, c1) * 64
    st2 = jnp.where(okC, _classify(lo, hi), 0)
    amb = st2 == unrolled.ST_AMBIG
    return g4x, g4y, g4z, amb


g4x, g4y, g4z, amb = jax.jit(survivors)(jnp.asarray(mat))
g4x, g4y, g4z, amb = (np.asarray(a) for a in (g4x, g4y, g4z, amb))
# perfect-occlusion test vs the FINAL 4px-block max depth
d = np.asarray(depth)
blk = d.reshape(SIZE // 4, 4, SIZE // 4, 4).max(axis=(1, 3))   # (y4, x4)
top2 = (g4z + 1) * 4
final_h = blk[np.minimum(g4y, SIZE // 4 - 1),
              np.minimum(g4x, SIZE // 4 - 1)]
occluded = amb & (top2 <= final_h)
n_amb = int(amb.sum())
n_occ = int(occluded.sum())
print(f"surviving ambiguous 4^3 cells: {n_amb}", flush=True)
print(f"  of which <= final surface (perfect-occlusion cullable): "
      f"{n_occ} ({100.0 * n_occ / max(n_amb, 1):.1f}%)", flush=True)
print(f"  voxel-stage upper bound speedup: "
      f"{n_amb / max(n_amb - n_occ, 1):.2f}x", flush=True)
# z distribution: is the visible surface concentrated in the top band?
zcol = {}
for z_, y_, x_, a_ in zip(g4z[amb], g4y[amb], g4x[amb], amb[amb]):
    key = (y_, x_)
    zcol.setdefault(key, []).append(z_)
tops = np.array([max(v) for v in zcol.values()])
sizes = np.array([len(v) for v in zcol.values()])
in_top1 = sum(1 for v in zcol.values())
print(f"columns with ambiguous cells: {len(zcol)}; cells/column mean "
      f"{sizes.mean():.2f} p95 {np.percentile(sizes, 95):.0f}", flush=True)
