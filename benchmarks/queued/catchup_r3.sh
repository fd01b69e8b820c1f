#!/bin/bash
# Round-3 TPU catchup: same pieces as run_when_tpu_up.sh but with
# generous per-piece timeouts — the round-boundary re-image wiped the
# persistent XLA compile cache, and on this 1-core host the cold
# unrolled-engine compiles take ~5-10 min per (size, caps) variant.
# Every completed compile lands in ~/.cache/mpr_tpu/xla, so interrupted
# pieces resume where they left off on re-run.
set -u
cd "$(dirname "$0")/../.."
ts=$(date +%Y%m%d-%H%M%S)
out="benchmarks/results/tpu_catchup_$ts.log"
mkdir -p benchmarks/results
exec > >(tee "$out") 2>&1

echo "== tunnel probe =="
timeout 240 python -c "import jax; print(jax.devices())" || {
    echo "tunnel dead; aborting"; exit 1; }

echo "== headline bench (prospero 2D table + vs_baseline) =="
timeout 7200 python bench.py

echo "== 2D large sizes (2048/4096, snug caps) =="
timeout 7200 python benchmarks/queued/measure_2d_large.py

echo "== 3D table + gears fast_transcendentals A/B =="
timeout 10800 python benchmarks/queued/measure_3d.py

echo "== scaling: real-chip sharded overhead (interp + unrolled) =="
timeout 7200 python benchmarks/scaling_curve.py

echo "== done =="
