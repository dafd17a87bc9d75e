#!/bin/bash
# Pre-warm the persistent XLA compile cache for bench.py's programs.
#
# The cache keys on the exact HLO (which carries source locations), so ANY
# source edit that shifts traced lines re-keys this round's programs — and
# the round-end driver bench then pays the full tunnel compile cold
# (BENCH_r01: 281.8s, BENCH_r02: 217.3s compile+first). Run this once
# after the LAST edit to the compute path (models/, ops/, engines/) and
# the driver's bench.py will warm-start (<60s compile+first).
#
# BENCH_TRIALS=1 BENCH_ITERS=2 keeps the execution side minimal: compile
# work (what we want cached) is identical to the real bench because the
# program shapes are the same.
set -e
cd "$(dirname "$0")/.."
BENCH_TRIALS=1 BENCH_ITERS=2 python bench.py
