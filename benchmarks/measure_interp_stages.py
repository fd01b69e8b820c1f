"""Stage split of the interp (zero-compile) 2D pipeline on the real chip.

VERDICT r3 item 5: interp @1024 is 4.05-4.17 ms vs the V100's 3.856 —
the round-3 split (kernel A 0.44 + prepass/compaction 0.72 + pixel 2.96)
predates the round-4 pipeline changes; re-measure before spending the
remaining 5%.  Cumulative sub-graphs, differenced like time_frames.

Usage: python benchmarks/measure_interp_stages.py [size]
"""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np

from mpr_tpu.frontend import frep
from mpr_tpu.ops import kernels
from mpr_tpu.ops.tape_data import TapeData
from mpr_tpu.render import camera, pipeline2d
from mpr_tpu.tape.tape import compile_tree
from mpr_tpu.utils import compcache
from mpr_tpu.utils.timing import time_frames

compcache.enable()
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
n_side = SIZE // 64

tree = frep.load("/root/reference/benchmark/files/prospero.frep")[0].tree
td = TapeData.from_tape(compile_tree(tree))
mat = jnp.asarray(camera.identity2())
z = jnp.float32(0.0)
print(f"backend: {jax.default_backend()}, prospero @{SIZE}, "
      f"{td.length} clauses", file=sys.stderr, flush=True)

meta0 = jnp.asarray([td.length, td.num_slots, td.result_slot,
                     td.axis_slots[0], td.axis_slots[1], td.axis_slots[2],
                     td.num_runs, 0], jnp.int32)
branch_ops, remap = kernels.build_remap(td.ops_present)
remap_np = np.asarray(remap)
s_cap = max(8, -(-td.num_slots // 8) * 8)
cap = td.capacity // (8 if n_side >= 16 else 4)


def stage_A(mat):
    remap_j = jnp.asarray(remap_np)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    boxes = pipeline2d._tile_boxes_2d(n_side, mat, z)
    status, codes = kernels.interval_shorten(meta0, td.packed, td.imms,
                                             runs_full, boxes,
                                             branch_ops=branch_ops,
                                             s_cap=s_cap)
    return status


def stage_AC(mat):
    remap_j = jnp.asarray(remap_np)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    boxes = pipeline2d._tile_boxes_2d(n_side, mat, z)
    status, codes = kernels.interval_shorten(meta0, td.packed, td.imms,
                                             runs_full, boxes,
                                             branch_ops=branch_ops,
                                             s_cap=s_cap)
    amb = status == kernels.ST_AMBIG
    order = jnp.argsort(jnp.logical_not(amb), stable=True).astype(jnp.int32)
    n_amb = amb.sum().astype(jnp.int32)
    codes_sel = codes[order]
    wrw, irw, rem, lens = pipeline2d._shorten_prepass(
        codes_sel, td.packed, td.imms, meta0[0], remap_j)
    G = wrw.shape[0]
    lens = jnp.pad(lens, (0, G - lens.shape[0]))
    cmeta = jnp.asarray([0, cap, cap, 0, 0, 0, 0, 0],
                        jnp.int32).at[0].set(n_amb)
    tpi = 16 if G % 16 == 0 else 1
    tw, ti_bits, runs, gmeta = kernels.compact_bitshift_batched(
        cmeta, lens, wrw, irw, rem, cap=cap, tpi=tpi)
    return tw


def stage_AP(mat):
    """A + prepass, NO pallas compaction kernel (isolates the kernel)."""
    remap_j = jnp.asarray(remap_np)
    runs_full = remap_j[td.runs & 0xFF] | (td.runs & ~0xFF)
    boxes = pipeline2d._tile_boxes_2d(n_side, mat, z)
    status, codes = kernels.interval_shorten(meta0, td.packed, td.imms,
                                             runs_full, boxes,
                                             branch_ops=branch_ops,
                                             s_cap=s_cap)
    amb = status == kernels.ST_AMBIG
    order = jnp.argsort(jnp.logical_not(amb), stable=True).astype(jnp.int32)
    codes_sel = codes[order]
    wrw, irw, rem, lens = pipeline2d._shorten_prepass(
        codes_sel, td.packed, td.imms, meta0[0], remap_j)
    return wrw


def full(mat):
    img, _ = pipeline2d.render_tile_block(td, mat, z, SIZE, jnp.int32(0),
                                          n_side, jnp.int32(0), n_side)
    return img


rows = []
for name, fn in [("A (interval+codes)", stage_A),
                 ("A+prepass", stage_AP),
                 ("A+prepass+compact", stage_AC),
                 ("full frame", full)]:
    t0 = time.time()
    ms = time_frames(fn, mat, n=40, n0=5)
    rows.append((name, ms))
    print(f"{name:24s} {ms:7.3f} ms  [{time.time()-t0:.0f}s incl compile]",
          flush=True)
prev = 0.0
print("\nmarginal:", flush=True)
for name, ms in rows:
    print(f"  {name:24s} {ms - prev:7.3f} ms", flush=True)
    prev = ms
