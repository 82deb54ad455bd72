#!/bin/bash
# Round-4 chain, phase 3 (post-official13 January).
#
# Waits for the in-flight official13_0p25 January run (chain2's last
# active leg; its bash wrapper was retired so the det2 full-pass leg it
# had queued never fires), then spends the remaining tunnel budget in
# strict value order:
#   1. prob_0p25 repair pass: the two January segments measured in
#      round 3 BEFORE repo-persisting existed — their ledger rows are
#      ok but the .nc files died with the round-3 cache, so the month
#      combine has nothing to combine without a re-run.
#   2. prob_0p25 January month combine (6 segments, month label).
#   3. official13_0p25 January month combine (6 segments).
#   4. det2_0p25 repair pass: auto-targets only unhealthy months
#      (07-12 lost with the round-3 cache; 01-06 persisted clean) —
#      the round-3 geopotential-ACC NaN blemish fix.
#   5. det2_0p25 year re-combine (only fires if 12/12 healthy).
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain.log}
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "=== chain3: waiting for pid $WAIT_PID (official13 leg) ===" >>"$L"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
rm -f /tmp/ns_stop
run() {
  [ -f /tmp/ns_stop ] && { echo "chain3: stop file, exiting" >>"$L"; exit 0; }
  echo "=== chain3: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
run run prob_0p25 --pass-id 2 --seg 2020-01-01:2020-01-06 \
    2020-01-06:2020-01-11
run combine prob_0p25 --expect-segments 6 --out-label month2020-01
run combine official13_0p25 --expect-segments 6 --out-label month2020-01
# VERDICT round-3 task 7: the fused deterministic kernel tile sweep at
# the official 0.25-degree geometry — needs the chip to itself, so it
# rides the chain (never concurrently with an eval; the tunnel
# serializes users and pollutes both measurements).
if [ ! -f /tmp/ns_stop ]; then
  echo "=== chain3: sweep_tiles 30 official_0p25 [$(date -u +%H:%M:%S)] ===" >>"$L"
  timeout 2400 python tools/sweep_tiles.py 30 official_0p25 \
      >/tmp/sweep_r4c.log 2>&1
  echo "sweep rc=$? (see /tmp/sweep_r4c.log)" >>"$L"
fi
run run det2_0p25 --pass-id 2
run combine det2_0p25 --expect-segments 12
echo "CHAIN3-DONE $(date -u)" >>"$L"
