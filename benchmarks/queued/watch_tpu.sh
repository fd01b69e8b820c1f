#!/bin/bash
# Long-running sentinel: probe the axon TPU tunnel every 10 min; the
# moment it answers, run the queued measurement batch
# (run_when_tpu_up.sh) and exit.  Safe to leave in the background —
# each probe is timeout-guarded so a dead tunnel never wedges it.
cd "$(dirname "$0")/../.."
for i in $(seq 1 70); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel ALIVE at attempt $i $(date)"
    bash benchmarks/queued/run_when_tpu_up.sh
    exit $?
  fi
  echo "attempt $i dead $(date)"
  sleep 600
done
echo "gave up after 70 attempts (~12h)"
exit 1
