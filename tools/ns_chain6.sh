#!/bin/bash
# Round-5 chain, phase 2 (after chain3's det2 repair + year re-combine).
# Strict value order per round-4 VERDICT:
#   1. official13_0p25 repair pass: auto-targets 2020-01-06:11 (missing;
#      resumes from its retained checkpoint + input stores — the
#      cross-process resume bug is fixed in 8a6415a) AND 2020-01-26:02-01
#      (the concurrent-driver store-deletion corruption caught by the
#      structural-NaN audit; see tools/audit_results.py).
#   2. official13_0p25 January month combine (6 segments) — the
#      headline artifact; refuses unhealthy segments by construction now.
#   3. At-scale device runs for the two remaining partial CLI paths
#      (VERDICT task 6): one month of conservative 1440x721 -> 240x121
#      regridding, and a 3-year daily quantile pencil job.
#   4. prob_0p25 February segments — push the ENS ledger past January;
#      each ~45 min, the chain takes as many as the round's budget
#      allows (touch /tmp/ns_stop to wind down cleanly).
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain6.log}
export WB2_NS_MIN_FREE_GIB=30
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "=== chain6: waiting for pid $WAIT_PID (chain3 det2 legs) ===" >>"$L"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
run() {
  [ -f /tmp/ns_stop ] && { echo "chain6: stop file, exiting" >>"$L"; exit 0; }
  echo "=== chain6: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
run run official13_0p25 --pass-id 2
run combine official13_0p25 --expect-segments 6 --out-label month2020-01
run run regrid_0p25 --seg 2020-01
run run quantiles_0p25 --seg 1993-01-01:1996-01-01
# VERDICT task 5 (thrice-promised): the fused deterministic kernel tile
# sweep at the official 0.25-degree geometry.  Rides the chain so it
# never shares the tunnel with an eval; its 12:09 attempt died on a
# transient remote_compile network error, so retry once if the first
# pass reports no winner.
if [ ! -f /tmp/ns_stop ]; then
  for attempt in 1 2; do
    echo "=== chain6: sweep_tiles 30 official_0p25 (attempt $attempt) [$(date -u +%H:%M:%S)] ===" >>"$L"
    timeout 2700 python tools/sweep_tiles.py 30 official_0p25 \
        >/tmp/sweep_r5b.log 2>&1
    rc=$?
    echo "sweep rc=$rc (see /tmp/sweep_r5b.log)" >>"$L"
    grep -q '"best": {}' /tmp/sweep_r5b.log || break
  done
fi
run run prob_0p25 --seg 2020-02-01:2020-02-06 2020-02-06:2020-02-11 \
    2020-02-11:2020-02-16 2020-02-16:2020-02-21 2020-02-21:2020-02-26 \
    2020-02-26:2020-03-01
run combine prob_0p25 --expect-segments 12 --out-label months2020-01-02
echo "CHAIN6-DONE $(date -u)" >>"$L"
