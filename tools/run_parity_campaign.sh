#!/bin/bash
# Sequential golden-number parity campaign (run on the TPU; the chip is
# exclusive). Appends one JSON line per config to docs/parity_results.jsonl.
# Usage: tools/run_parity_campaign.sh [config ...]   (default: full list)
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl
mkdir -p docs

CONFIGS=${@:-"sw-shortened sw-w4 sw-w5 sw-288-w4 global-144 global-144-shortened \
sw-p003-w3 sw-p003-w4 sw-p003-w5 global-144-p003 \
gdg-144-w3 gdg-288-41 gdg-144-52 gdg-last-osd \
cc-osd0 cc-osdcs cc-gdg \
cc882-bpgd-all cc882-bpgd-partial cc882-osd0 cc882-osdcs cc882-gdg \
phenom-osd phenom-gdg bp4-osd0 bp4-osdcs camel-362"}

for c in $CONFIGS; do
  echo "=== $c $(date +%H:%M:%S)" >&2
  timeout 5400 python tools/validate_parity.py "$c" >> "$OUT" 2> "docs/parity_${c}.log"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "{\"config\": \"$c\", \"error\": \"exit $rc\"}" >> "$OUT"
    echo "$c FAILED rc=$rc" >&2
  fi
done
echo "campaign done $(date +%H:%M:%S)" >&2
