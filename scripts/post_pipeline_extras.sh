#!/bin/bash
# Follow-on to scripts/tpu_return_pipeline.sh: once the main
# outage-recovery pipeline finishes (/tmp/tpu_pipeline.done), capture the
# round-4 additions' on-TPU numbers. Separate file because the main
# pipeline script is already running detached — bash reads scripts
# incrementally, so appending steps to a RUNNING script corrupts it.
#
# Logs to /tmp/tpu_extras.log, JSON to /tmp/tpu_pipeline/, touches
# /tmp/tpu_extras.done when finished.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_extras.log
OUT=/tmp/tpu_pipeline
mkdir -p "$OUT"

say() { echo "=== $1 $(date -u +%FT%TZ)" >> "$LOG"; }

say "extras: waiting for main pipeline"
until [ -f /tmp/tpu_pipeline.done ]; do sleep 120; done

say "step E1: pipe-vs-tcp transport bench (256px)"
timeout 7200 python benchmarks/tcp_transport_bench.py > "$OUT/tcp_transport.json" 2>> "$LOG"
say "step E1 rc=$?"

say "extras done"
touch /tmp/tpu_extras.done
