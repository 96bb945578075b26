#!/bin/bash
# One-shot TPU measurement sweep (run when the axon tunnel is up).
# Captures every headline metric after the outage-period optimizations
# (PERF.md "awaiting measurement" section): e2e pipeline, generator
# forward, train step, and the renderer frame_batch/bf16 matrix.
# Each line of results.jsonl is one bench.py JSON output.
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

run BENCH_DUMMY=0                                   # e2e fp32 fb8 (+torch baseline)
run BENCH_SKIP_TORCH=1 BENCH_FB=16                  # e2e fp32 fb16
run BENCH_SKIP_TORCH=1 BENCH_BF16=1                 # e2e bf16 fb8
run BENCH_SKIP_TORCH=1 BENCH_BF16=1 BENCH_FB=16     # e2e bf16 fb16
run BENCH_SKIP_TORCH=1 BENCH_BF16=1 BENCH_FB=32     # e2e bf16 fb32
run BENCH_SKIP_TORCH=1 AP_FETCH=overlap             # e2e fp32 fb8, overlapped fetch
run BENCH_MODE=generator                            # generator fp32 (+baseline)
run BENCH_MODE=generator BENCH_BF16=1 BENCH_SKIP_TORCH=1
run BENCH_TRAIN=1                                   # train step batch 1
echo "sweep done -> $out" >&2
