#!/bin/bash
# Round-2 continuation: remaining parity configs, ordered to cover every
# untouched experiment family first. Appends to docs/parity_results.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl

run() {  # run <timeout_s> <config> [extra args...]
  local t=$1 c=$2; shift 2
  echo "=== $c $(date +%H:%M:%S)" >&2
  timeout "$t" python tools/validate_parity.py "$c" "$@" >> "$OUT" 2> "docs/parity_${c}.log"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "$c FAILED rc=$rc" >&2
  else
    echo "$c ok $(date +%H:%M:%S)" >&2
  fi
}

run 900  phenom-osd
run 900  phenom-gdg --shots 32768
run 900  bp4-osd0
run 900  bp4-osdcs
run 900  camel-362
run 900  cc882-osd0
run 900  cc882-osdcs
run 900  gdg-144-52
run 900  gdg-288-41
run 1200 gdg-last-osd
run 900  cc882-bpgd-all
run 900  cc882-bpgd-partial
run 1200 cc882-gdg
run 1200 cc-osd0 --shots 1000000
echo "r2b campaign done $(date +%H:%M:%S)" >&2
