#!/bin/bash
# Poll the axon tunnel; when jax.devices() answers within the timeout,
# run the one-shot measurement sweep (tools/measure_sweep.sh) exactly
# once and exit. Safe to leave running across an outage.
set -u
cd "$(dirname "$0")/.."
out="${1:-/tmp/measure_sweep.jsonl}"
log="${2:-/tmp/tunnel_watch.log}"
while true; do
  if timeout 90 python - <<'EOF' >>"$log" 2>&1
import jax
d = jax.devices()
assert d and d[0].platform == "tpu", d
print("tunnel up:", d)
EOF
  then
    echo "$(date -u +%FT%TZ) tunnel up, starting sweep" >>"$log"
    bash tools/measure_sweep.sh "$out" >>"$log" 2>&1
    echo "$(date -u +%FT%TZ) sweep finished" >>"$log"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >>"$log"
  sleep 300
done
