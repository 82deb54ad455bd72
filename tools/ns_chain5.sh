#!/bin/bash
# Round-5 chain: finish the January 0.25-degree month ledgers, clean the
# det2 year record, then the twice-promised kernel sweep.  Strict value
# order per VERDICT round 4:
#   1. official13_0p25 January: resume the timed-out 2020-01-06:11 from
#      its retained checkpoint+stores, resume 2020-01-21:26 (killed at
#      round-4 end, checkpoint+stores retained), run 2020-01-26:02-01
#      fresh.  Driver now has adaptive watchdog (stall/cap) + overlapped
#      datagen + real checkpoint reuse (fresh_data bug fixed).
#   2. official13_0p25 January month combine (6 segments).
#   3. prob_0p25 repair pass 2: the two January segments whose .nc files
#      died with the round-3 cache.
#   4. prob_0p25 January month combine (6 segments).
#   5. det2_0p25 repair pass 2: auto-targets the unhealthy months
#      (07-12; candidates now derived from the ledger, not _months()).
#   6. det2_0p25 year re-combine -> replaces the 19%-NaN artifact.
#   7. sweep_tiles at the official 0.25-degree geometry (VERDICT task 5).
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain5.log}
# global gate below the box's current 49 GiB free: the first two legs
# consume ~0 new disk (retained stores); per-segment preflight still
# enforces 20 GiB headroom on every store write
export WB2_NS_MIN_FREE_GIB=40
rm -f /tmp/ns_stop
run() {
  [ -f /tmp/ns_stop ] && { echo "chain5: stop file, exiting" >>"$L"; exit 0; }
  echo "=== chain5: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
run run official13_0p25 --seg 2020-01-06:2020-01-11 \
    2020-01-21:2020-01-26 2020-01-26:2020-02-01
run combine official13_0p25 --expect-segments 6 --out-label month2020-01
run run prob_0p25 --pass-id 2 --seg 2020-01-01:2020-01-06 \
    2020-01-06:2020-01-11
run combine prob_0p25 --expect-segments 6 --out-label month2020-01
run run det2_0p25 --pass-id 2
run combine det2_0p25 --expect-segments 12
if [ ! -f /tmp/ns_stop ]; then
  echo "=== chain5: sweep_tiles 30 official_0p25 [$(date -u +%H:%M:%S)] ===" >>"$L"
  timeout 2400 python tools/sweep_tiles.py 30 official_0p25 \
      >/tmp/sweep_r5.log 2>&1
  echo "sweep rc=$? (see /tmp/sweep_r5.log)" >>"$L"
fi
echo "CHAIN5-DONE $(date -u)" >>"$L"
