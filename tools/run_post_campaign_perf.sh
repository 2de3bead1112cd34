#!/bin/bash
# Sequel to run_parity_r2d.sh: wait for the campaign to release the chip,
# probe health, retry the GDG rows that crashed the worker at
# ensemble_bucket=64 (now auto-16 for W>=4 in validate_parity.py), then
# run the throughput sweep (incl. the never-measured Pallas CN engine)
# and a 32k-shot bench.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl

probe() {
  timeout 180 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("probe:", float((x @ x).sum()))
EOF
}

run() {
  local t=$1 c=$2; shift 2
  echo "=== $c $(date +%H:%M:%S)"
  timeout "$t" python tools/validate_parity.py "$c" "$@" >> "$OUT" 2> "docs/parity_${c}.log"
  local rc=$?
  [ $rc -ne 0 ] && echo "$c FAILED rc=$rc" || echo "$c ok $(date +%H:%M:%S)"
}

# wait for campaign end marker (max ~3h)
for i in $(seq 1 1080); do
  grep -q "r2d campaign done" docs/r2d_campaign.log 2>/dev/null && break
  sleep 10
done
echo "campaign done; probing chip $(date +%H:%M:%S)"
sleep 30
if ! probe; then
  echo "chip probe FAILED; waiting 90s and retrying"
  sleep 90
  probe || { echo "chip wedged; aborting"; exit 1; }
fi

# GDG retries at the smaller ensemble bucket
run 1800 gdg-144-52 --shots 8192
sleep 15; probe || { sleep 90; probe || { echo "chip wedged after gdg-144-52"; exit 1; }; }
run 1800 gdg-288-41 --shots 8192
sleep 15; probe || { sleep 90; probe || { echo "chip wedged after gdg-288-41"; exit 1; }; }

echo "=== sweep $(date +%H:%M:%S)"
timeout 3600 python tools/bench_sweep.py \
  --configs spans_48_136,spans_48_136_b1024,spans_48_136_b1024_cnpallas \
  > docs/sweep_r2d.log 2> docs/sweep_r2d.err.log
echo "=== bench 32k $(date +%H:%M:%S)"
timeout 3600 python bench.py --shots 32768 > docs/bench_32k.json 2> docs/bench_32k.err.log
echo "post-campaign perf done $(date +%H:%M:%S)"
