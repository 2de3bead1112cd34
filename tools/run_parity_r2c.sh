#!/bin/bash
# Re-runs with corrected decoder parameterization (perp-kernel fix,
# reference-exact phenom GDG/OSD params, BP4 ms=0.625, camel batch 1024).
# Later jsonl lines supersede earlier ones in parity_report.py.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl

run() {
  local t=$1 c=$2; shift 2
  echo "=== $c $(date +%H:%M:%S)" >&2
  timeout "$t" python tools/validate_parity.py "$c" "$@" >> "$OUT" 2> "docs/parity_${c}.log"
  local rc=$?
  [ $rc -ne 0 ] && echo "$c FAILED rc=$rc" >&2 || echo "$c ok $(date +%H:%M:%S)" >&2
}

run 900 bp4-osd0 --shots 32768
run 900 bp4-osdcs --shots 32768
run 900 phenom-osd
run 900 phenom-gdg --shots 32768
run 900 camel-362
run 900 gdg-144-52 --shots 4096
echo "r2c reruns done $(date +%H:%M:%S)" >&2
