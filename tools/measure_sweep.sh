#!/bin/bash
# One-shot TPU measurement sweep (run when the axon tunnel is up).
# Captures every headline metric: e2e pipeline (default = overlapped
# fetch), generator forward, train step, and the frame_batch/bf16/fetch
# matrix. Each line of results.jsonl is one bench.py JSON output.
#
# IMPORTANT: run with NOTHING else on this host. The box has one CPU
# core; a concurrent pytest/compile steals it from the bench's host-side
# orchestration and the torch CPU baseline, and was measured to skew
# rows by 2-3x (2026-08-19).
set -u
cd "$(dirname "$0")/.."
out="${1:-/tmp/measure_sweep.jsonl}"
: > "$out"

run() {
  echo "=== $*" >&2
  env "$@" BENCH_WATCHDOG_SECS=1800 python bench.py 2>/dev/null \
    | tail -1 | sed "s/^/{\"env\": \"$*\", \"result\": /;s/$/}/" >> "$out"
  tail -1 "$out" >&2
}

run BENCH_DUMMY=0                                   # e2e fp32 fb8 overlap (+torch baseline)
run BENCH_SKIP_TORCH=1 AP_FETCH=bulk                # e2e fp32 fb8, bulk fetch
run BENCH_SKIP_TORCH=1 BENCH_FB=16                  # e2e fp32 fb16
run BENCH_SKIP_TORCH=1 BENCH_BF16=1                 # e2e bf16 fb8
run BENCH_SKIP_TORCH=1 BENCH_BF16=1 BENCH_FB=16     # e2e bf16 fb16
run BENCH_MODE=generator                            # generator fp32 (+baseline)
run BENCH_MODE=generator BENCH_BF16=1 BENCH_SKIP_TORCH=1
run BENCH_TRAIN=1                                   # train step batch 1
echo "sweep done -> $out" >&2
