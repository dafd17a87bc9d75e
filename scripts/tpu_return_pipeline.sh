#!/bin/bash
# Outage-recovery measurement pipeline: wait for the tunneled TPU backend
# to come back, then capture every pending on-TPU artifact in priority
# order. Designed to run detached (nohup) during an outage — see the
# round-3/4 playbook in ROADMAP.md.
#
#   1. scripts/prewarm_bench.sh — warm the persistent compile cache for
#      bench.py's programs so the driver's round-end bench warm-starts.
#   2. python bench.py          — a full on-TPU bench (proves green).
#   3. benchmarks/serving_bench.py — gatys/video/reload/fast daemon
#      latencies for docs/serving.md.
#   4. benchmarks/gatys_history_bench.py — H sweep for the serving
#      default decision (docs/performance.md).
#
# Logs to /tmp/tpu_pipeline.log, JSON results to /tmp/tpu_pipeline/,
# touches /tmp/tpu_pipeline.done when finished. Each step is bounded and
# failures fall through to the next step (the tunnel can flake mid-run).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_pipeline.log
OUT=/tmp/tpu_pipeline
mkdir -p "$OUT"

say() { echo "=== $1 $(date -u +%FT%TZ)" >> "$LOG"; }

say "pipeline start; waiting for backend"
until timeout 120 python -c "import styletransfer_tpu, jax; print(jax.devices())" >> "$LOG" 2>&1; do
  echo "probe failed $(date -u +%FT%TZ)" >> "$LOG"
  sleep 300
done
say "BACKEND UP"

# Let the pre-existing gatys drive watcher (gatys_retry4.sh) finish its
# one drive first so its compile doesn't contend with the bench timings.
for i in $(seq 1 45); do
  [ -f /tmp/gatys_tpu_drive4.done ] && break
  sleep 60
done
say "step 1: prewarm"
timeout 10800 bash scripts/prewarm_bench.sh >> "$LOG" 2>&1
say "step 1 rc=$?"

say "step 2: full bench"
timeout 7200 python bench.py > "$OUT/bench.json" 2>> "$LOG"
say "step 2 rc=$?"

say "step 3: serving bench"
timeout 14400 python benchmarks/serving_bench.py > "$OUT/serving_bench.json" 2>> "$LOG"
say "step 3 rc=$?"

say "step 4: gatys history sweep"
timeout 14400 python benchmarks/gatys_history_bench.py > "$OUT/gatys_history.json" 2>> "$LOG"
say "step 4 rc=$?"

say "step 5: gatys coarse-to-fine curve"
timeout 14400 python benchmarks/gatys_coarse_bench.py > "$OUT/gatys_coarse.json" 2>> "$LOG"
say "step 5 rc=$?"

say "pipeline done"
touch /tmp/tpu_pipeline.done
