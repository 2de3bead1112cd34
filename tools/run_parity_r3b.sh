#!/bin/bash
# Round-3 session B: the three W>=4 GDG rows (the r3a attempts ran against
# a mid-edit tree and crashed the worker; docs/GDG_W4_CRASH.md). Each row:
# probe the chip first (wait out a wedge), validate the spans path on a
# small probe, then run the row; if the spans probe crashes, fall back to
# ensemble_mode=host_loop for everything that follows.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl
STATUS=docs/r3b_campaign.log

note() { echo "$*" | tee -a "$STATUS" >&2; }

probe_chip() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
assert float((x @ x).sum()) > 0
EOF
}

wait_chip() {
  for i in $(seq 1 40); do
    probe_chip && return 0
    note "chip probe failed (attempt $i); waiting 120s"
    sleep 120
  done
  return 1
}

run() {
  local t=$1 c=$2; shift 2
  wait_chip || { note "chip never recovered before $c; aborting"; exit 1; }
  note "=== $c $(date +%H:%M:%S)"
  timeout "$t" python tools/validate_parity.py "$c" "$@" >> "$OUT" 2> "docs/parity_${c}.log"
  local rc=$?
  if [ $rc -ne 0 ]; then
    note "$c FAILED rc=$rc $(date +%H:%M:%S)"
  else
    note "$c ok $(date +%H:%M:%S)"
  fi
}

wait_chip || { note "chip never recovered; aborting"; exit 1; }
note "=== spans-probe $(date +%H:%M:%S)"
if timeout 900 python tools/probe_gdg_w4_spans.py --shots 256 --bucket 64 \
     > docs/r3b_spans_probe.out 2>&1; then
  note "spans probe ok — using ensemble_mode=spans"
else
  note "spans probe FAILED — falling back to SWD_GDG_MODE=host_loop"
  export SWD_GDG_MODE=host_loop
fi

run 5400 gdg-288-41 --shots 4096
run 5400 gdg-144-52 --shots 4096
run 5400 gdg-last-osd --shots 4096
note "r3b campaign done $(date +%H:%M:%S)"
