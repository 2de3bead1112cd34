#!/bin/bash
# Sequel to run_parity_r2d.sh: wait for the campaign to release the chip,
# probe health, then run the throughput sweep (incl. the never-measured
# Pallas CN engine) and a 32k-shot bench. GDG W>=4 rows are excluded:
# they crash the TPU worker at any ensemble bucket (CPU runs the same
# workload fine) — root-caused interactively, see docs/GDG_W4_CRASH.md.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 180 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print("probe:", float((x @ x).sum()))
EOF
}

found=0
for i in $(seq 1 1080); do
  grep -q "r2d campaign done" docs/r2d_campaign.log 2>/dev/null && { found=1; break; }
  sleep 10
done
if [ "$found" -ne 1 ]; then
  echo "campaign-done marker never appeared; aborting (chip may still be busy)"
  exit 1
fi
echo "campaign done; probing chip $(date +%H:%M:%S)"
sleep 30
if ! probe; then
  echo "chip probe FAILED; waiting 90s and retrying"
  sleep 90
  probe || { echo "chip wedged; aborting"; exit 1; }
fi

echo "=== sweep $(date +%H:%M:%S)"
timeout 3600 python tools/bench_sweep.py \
  --configs spans_48_136,spans_48_136_b1024,spans_48_136_b1024_cnpallas \
  > docs/sweep_r2d.log 2> docs/sweep_r2d.err.log
echo "=== bench 32k $(date +%H:%M:%S)"
timeout 3600 python bench.py --shots 32768 > docs/bench_32k.json 2> docs/bench_32k.err.log
echo "post-campaign perf done $(date +%H:%M:%S)"
