#!/bin/bash
# Round-4 measurement chain, priority-ordered for the remaining tunnel
# budget (VERDICT round-3 tasks 1/4/5):
#   1. spectra year 12/12 — cheap per month now that the CLI runs the
#      zonal DFT on the device (minutes per month).
#   2. prob_0p25: complete the measured January (6 five-day segments;
#      round 3 recorded the first two).
#   3. official13_0p25: as many further validated 5-day segments as the
#      budget allows (segment 1 validated 2026-08-19, NORTHSTAR.jsonl).
#   4. det2_0p25 pass-2 clean-year re-run (remaining months), replacing
#      the NaN-poisoned committed year.
# Run detached (nohup); halts cleanly between segments if /tmp/ns_stop
# exists.  Idempotent: north_star.py skips segments already recorded ok
# (per pass), so relaunching resumes where it died.
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain.log}
run() {
  [ -f /tmp/ns_stop ] && { echo "chain: stop file, exiting" >>"$L"; exit 0; }
  echo "=== chain: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
run run spectra_0p25
run run prob_0p25 --seg 2020-01-01:2020-01-06 2020-01-06:2020-01-11 \
    2020-01-11:2020-01-16 2020-01-16:2020-01-21 2020-01-21:2020-01-26 \
    2020-01-26:2020-02-01
run run official13_0p25 --seg 2020-01-06:2020-01-11 2020-01-11:2020-01-16 \
    2020-01-16:2020-01-21 2020-01-21:2020-01-26 2020-01-26:2020-02-01
run run det2_0p25 --pass-id 2
echo "CHAIN-DONE $(date -u)" >>"$L"
