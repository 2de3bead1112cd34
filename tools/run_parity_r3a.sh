#!/bin/bash
# Round-3 session A: fill the rows VERDICT round 2 called missing —
# the three W>=4 sliding-window GDG configs (via ensemble_mode=host_loop,
# selected automatically by validate_parity.run_gdg for W>=4), the SHYPS
# window/global rows, and one x-basis row.
# Quick rows first so partial progress is maximal if the chip wedges.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl
STATUS=docs/r3a_campaign.log

run() {
  local t=$1 c=$2; shift 2
  echo "=== $c $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
  timeout "$t" python tools/validate_parity.py "$c" "$@" >> "$OUT" 2> "docs/parity_${c}.log"
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "$c FAILED rc=$rc $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
  else
    echo "$c ok $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
  fi
}

run 1800 shyps-window --shots 16384
run 1800 shyps-global --shots 16384
run 1800 sw-xbasis --shots 16384
# W>=4 GDG rows (ensemble_mode=spans): 4096 shots is ample for the 3-sigma
# test (expected fails ~150/150/28 per the reference rates)
run 5400 gdg-288-41 --shots 4096
run 5400 gdg-144-52 --shots 4096
run 5400 gdg-last-osd --shots 4096
echo "r3a campaign done $(date +%H:%M:%S)" | tee -a "$STATUS" >&2
