#!/bin/bash
# Round-4 session B: the 1e7-shot rare-event code-capacity campaigns
# (VERDICT item 3) with a deliberate interrupt+resume on cc-osdcs to
# exercise checkpointing in anger. At the round-4 device-campaign rates
# (osd ~200k shots/s, gdg ~17k) these are minutes, not hours.
set -u
cd "$(dirname "$0")/.."
OUT=docs/parity_results.jsonl
STATUS=docs/r4b_campaign.log

note() { echo "$*" | tee -a "$STATUS" >&2; }

note "=== rare-osdcs interrupt leg $(date +%H:%M:%S)"
rm -rf docs/ckpt_cc-osdcs docs/ckpt_cc-gdg docs/ckpt_cc-osd0
timeout 2400 python tools/run_rare_event.py cc-osdcs --shots 10000000 \
  --stop-after-batches 60 > /dev/null 2> docs/rare_cc-osdcs.log
note "interrupt leg rc=$? (3 = deliberate stop; checkpoint persisted)"
note "=== rare-osdcs resume leg $(date +%H:%M:%S)"
timeout 2400 python tools/run_rare_event.py cc-osdcs --shots 10000000 \
  >> "$OUT" 2>> docs/rare_cc-osdcs.log
note "rare-osdcs rc=$? $(date +%H:%M:%S)"

note "=== rare-osd0 $(date +%H:%M:%S)"
timeout 2400 python tools/run_rare_event.py cc-osd0 --shots 10000000 \
  >> "$OUT" 2> docs/rare_cc-osd0.log
note "rare-osd0 rc=$? $(date +%H:%M:%S)"

note "=== rare-gdg $(date +%H:%M:%S)"
timeout 4800 python tools/run_rare_event.py cc-gdg --shots 10000000 \
  >> "$OUT" 2> docs/rare_cc-gdg.log
note "rare-gdg rc=$? $(date +%H:%M:%S)"
note "r4b campaign done $(date +%H:%M:%S)"
