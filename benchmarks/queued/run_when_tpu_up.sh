#!/bin/bash
# One-shot: close every TPU measurement left open while the axon tunnel
# was down (2026-08-17).  Run from the repo root with the tunnel alive:
#
#   bash benchmarks/queued/run_when_tpu_up.sh
#
# Writes a timestamped log under benchmarks/results/ and leaves
# scaling.json refreshed.  Each piece is independently restartable.
set -u
cd "$(dirname "$0")/../.."
ts=$(date +%Y%m%d-%H%M%S)
out="benchmarks/results/tpu_catchup_$ts.log"
mkdir -p benchmarks/results
exec > >(tee "$out") 2>&1

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel dead; aborting"; exit 1; }

echo "== headline bench (prospero 2D table + vs_baseline) =="
timeout 1200 python bench.py

echo "== 2D large sizes (2048/4096, snug caps) =="
timeout 1800 python benchmarks/queued/measure_2d_large.py

echo "== 3D table + gears fast_transcendentals A/B =="
timeout 2400 python benchmarks/queued/measure_3d.py

echo "== scaling: real-chip sharded overhead (interp + unrolled) =="
timeout 2400 python benchmarks/scaling_curve.py

echo "== done: update docs/perf_notes.md + README.md with the above =="
