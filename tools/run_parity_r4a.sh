#!/bin/bash
# Round-4 session A: re-measure all four sliding-window GDG rows with the
# spans ensemble + lane dormancy + bf16 message/history rings.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl
STATUS=docs/r4a_campaign.log

run() {
  local t=$1 c=$2; shift 2
  echo "=== $c $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
  timeout "$t" python tools/validate_parity.py "$c" "$@" >> "$OUT" 2> "docs/parity_${c}.log"
  local rc=$?
  echo "$c rc=$rc $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
}

run 4200 gdg-144-w3 --shots 8192
run 5400 gdg-288-41 --shots 4096
run 5400 gdg-144-52 --shots 4096
run 5400 gdg-last-osd --shots 4096
echo "r4a campaign done $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
