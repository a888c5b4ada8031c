#!/bin/bash
# One-shot TPU measurement session: run every pending hardware A/B in one
# tunnel window and log to /tmp/tpu_session_<ts>.log. The transport's
# bandwidth swings 3-4x between windows (VALIDATION 23), so numbers are
# only comparable WITHIN one run of this script.
#
# Usage:  bash benchmarks/tpu_session.sh [quick]
#   quick = skip the 512^3 run and the training probe.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:/root/repo"
TS=$(date +%s)
LOG=/tmp/tpu_session_${TS}.log
echo "logging to $LOG"
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | tee -a "$LOG"
}

# 0. Window probe: absolute transport bandwidth for context
run python benchmarks/transport_probe.py

# 1. Headline + sub-pixel decoder A/B (pending from VALIDATION 25).
# `env VAR=...` goes through run()'s "$*" so the log header names the arm.
run env MP_BENCH_SUBPIXEL=0 python bench.py 256
run env MP_BENCH_SUBPIXEL=1 python bench.py 256

# 2. Validation-epoch dispatch A/B (pending from VALIDATION 26)
run python benchmarks/validation_epoch_probe.py 16 128 25

# 2b. Pallas double-buffered pass kernel vs XLA einsum (VERDICT r2 item 9)
run python benchmarks/shear_impl_probe.py 256 --pallas

# 3. Cohort pipeline, fused + pipelined combined mode
run python benchmarks/cohort_pipeline_probe.py 256 6 u8 serial,pipelined3

if [ "${1:-}" != "quick" ]; then
  # 4. 512^3 stress (channel-grouped shear remap) + view-pipelining A/B
  #    (MP_VIEW_INFLIGHT=2 overlaps view v's remap with view v+1's
  #    stack+U-Net — HBM headroom + speedup pending hardware measurement)
  run env MP_VIEW_INFLIGHT=1 python bench.py 512
  run env MP_VIEW_INFLIGHT=2 python bench.py 512
  # 5. Training profile (sampler/step attribution)
  run python benchmarks/train_profile_probe.py 64 128 20
fi
echo "done: $LOG"
