#!/bin/bash
# Benchmark suite runner — the analog of the reference's run_benchmarks.sh:
# logs provenance (date/host/git SHA/uncommitted diff,
# /root/reference/run_benchmarks.sh:11-19), then runs the table benchmarks
# over the paper models and saves PNG artifacts per run.
set -u
cd "$(dirname "$0")/.."
FILES=${FILES:-/root/reference/benchmark/files}
OUT=${OUT:-benchmarks/results/$(date +%Y%m%d-%H%M%S)}
mkdir -p "$OUT"

{
  echo "date:   $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "host:   $(hostname)"
  echo "git:    $(git rev-parse HEAD 2>/dev/null || echo '?')"
  echo "dirty:"
  git diff --stat 2>/dev/null
  python -c "import jax; print('jax:', jax.__version__, jax.default_backend())"
} | tee "$OUT/provenance.txt"

run() { echo "== $*" | tee -a "$OUT/log.txt"; "$@" 2>>"$OUT/stderr.txt" | tee -a "$OUT/log.txt"; }

# 2D tables (render_2d_table analog; prospero is the headline model)
run python -m mpr_tpu.cli table2d "$FILES/prospero.frep"
run python -m mpr_tpu.cli table2d "$FILES/involute_gear_2d.frep" --sizes 256,512,1024,2048

# 3D tables (render_3d_table analog)
for m in architecture involute_gear_3d bear; do
  run python -m mpr_tpu.cli table3d "$FILES/$m.frep" --sizes 256,512,1024
done

# render artifacts
run python -m mpr_tpu.cli render2d "$FILES/prospero.frep" --size 1024 --out "$OUT/prospero_2d.png"
run python -m mpr_tpu.cli render3d "$FILES/bear.frep" --size 512 --mode all --out "$OUT/bear.png"
run python -m mpr_tpu.cli heatmap2d "$FILES/prospero.frep" --out "$OUT/prospero_heat.png"
run python -m mpr_tpu.cli shorten-stats "$FILES/prospero.frep"
run python -m mpr_tpu.cli tape-time "$FILES/prospero.frep"
run python bench.py

echo "results in $OUT"
