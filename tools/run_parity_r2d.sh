#!/bin/bash
# Round-2 session D: rerun rows invalidated by the perp-kernel/param fixes
# (132a1cd) and fill the remaining not-yet-run BASELINE rows.
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

# stale rows (run pre-fix with a broken logical check / wrong params)
run 1200 bp4-osd0 --shots 32768
run 1200 bp4-osdcs --shots 32768
run 1200 phenom-osd --shots 65536
run 1200 phenom-gdg --shots 32768
# never-run rows
run 1200 camel-362 --shots 32768
run 1500 gdg-144-52 --shots 8192
run 1500 gdg-288-41 --shots 8192
run 1800 gdg-last-osd --shots 8192
run 1500 cc882-bpgd-all
run 1500 cc882-bpgd-partial
run 1800 cc882-gdg --shots 65536
run 1500 cc-osd0 --shots 1900544
# the "done" marker goes to the file the sequel script greps, not stderr
echo "r2d campaign done $(date +%H:%M:%S)" | tee -a docs/r2d_campaign.log >&2
