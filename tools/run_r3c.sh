#!/bin/bash
# Round-3 session C: rare-event 1e7-shot campaigns (with a deliberate
# interrupt+resume on the first), Pallas CN decision sweep, on-chip
# scaling probe, and the gdg-144-w3 throughput re-measurement.
set -u
cd "$(dirname "$0")/.."
STATUS=docs/r3c_campaign.log

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

step() {
  local t=$1 name=$2; shift 2
  wait_chip || { note "chip never recovered before $name; aborting"; exit 1; }
  note "=== $name $(date +%H:%M:%S)"
  timeout "$t" "$@" >> docs/r3c_${name}.out 2> docs/r3c_${name}.err
  local rc=$?
  [ $rc -ne 0 ] && note "$name FAILED rc=$rc" || note "$name ok $(date +%H:%M:%S)"
}

# 1. rare-event campaigns; the first is interrupted after 40 batches and
# resumed (checkpoint/elastic exercised in anger, VERDICT r2 #6)
step 1200 rare-osdcs-part1 python tools/run_rare_event.py cc-osdcs --shots 10000000 --stop-after-batches 40
step 4500 rare-osdcs python tools/run_rare_event.py cc-osdcs --shots 10000000
step 4500 rare-gdg python tools/run_rare_event.py cc-gdg --shots 10000000
step 3600 rare-osd0 python tools/run_rare_event.py cc-osd0 --shots 10000000

# 2. Pallas CN decision at the production bench config
step 2400 pallas-sweep python tools/bench_sweep.py --configs spans_48_136_b1024,spans_48_136_b1024_cnpallas

# 3. on-chip shard-overhead (scaling argument)
step 1800 scaling python tools/scaling_chip_probe.py

# 4. gdg-144-w3 throughput re-measurement (fixed spans ensemble)
step 3000 gdg-w3-row python tools/validate_parity.py gdg-144-w3 --shots 8192

note "r3c campaign done $(date +%H:%M:%S)"
