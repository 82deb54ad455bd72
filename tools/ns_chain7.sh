#!/bin/bash
# Round-5 chain, phase 4: takes over from chain6 after its sweep leg.
#
# chain6's tail order was (sweep -> prob February); the round-4 VERDICT
# ranks the official13_0p25 ledger ("the summit itself") ABOVE the ENS
# ledger, and an official13 segment costs roughly half a prob segment,
# so this chain flips the tail: official13 February first, then prob
# February with whatever budget remains.  Takeover protocol: wait for
# chain6 to reach its sweep leg (the last leg we keep), raise
# /tmp/ns_stop so chain6 skips its prob tail, wait for it to exit,
# clear the flag, proceed.
#
# WB2_CHAIN_DEADLINE (epoch seconds, optional): a watchdog raises
# /tmp/ns_stop at the deadline so no NEW segment starts after it and
# the chip is free for the driver's end-of-round bench.py run.  The
# month combines still run (cheap, host-side, no chip time) on
# whatever segments completed.
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain7.log}
export WB2_NS_MIN_FREE_GIB=30
DEADLINE=${WB2_CHAIN_DEADLINE:-0}

CHAIN6_PID=${1:-}
if [ -n "$CHAIN6_PID" ] && kill -0 "$CHAIN6_PID" 2>/dev/null; then
  echo "chain7: waiting for chain6 ($CHAIN6_PID) sweep leg [$(date -u +%H:%M:%S)]" >>"$L"
  while kill -0 "$CHAIN6_PID" 2>/dev/null; do
    grep -q "sweep_tiles 30 official_0p25" /tmp/ns_chain6.log 2>/dev/null && break
    sleep 60
  done
  if kill -0 "$CHAIN6_PID" 2>/dev/null; then
    touch /tmp/ns_stop
    echo "chain7: ns_stop raised [$(date -u +%H:%M:%S)]; waiting for chain6 exit" >>"$L"
    while kill -0 "$CHAIN6_PID" 2>/dev/null; do sleep 30; done
  fi
  rm -f /tmp/ns_stop
  echo "chain7: chain6 exited [$(date -u +%H:%M:%S)]" >>"$L"
fi

if [ "$DEADLINE" -gt 0 ]; then
  ( while :; do
      [ "$(date +%s)" -ge "$DEADLINE" ] && { touch /tmp/ns_stop; break; }
      sleep 60
    done ) &
  echo $! >/tmp/chain7_watchdog.pid
  echo "chain7: wind-down watchdog armed for $(date -u -d @"$DEADLINE" +%H:%M:%S)" >>"$L"
fi

run() {
  [ -f /tmp/ns_stop ] && { echo "chain7: stop file, skipping $*" >>"$L"; return 0; }
  echo "=== chain7: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
# combines ignore the stop flag: host-side, seconds of wall, no chip
combine() {
  echo "=== chain7: combine $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py combine "$@" >>"$L" 2>&1
}

run run official13_0p25 --seg 2020-02-01:2020-02-06 2020-02-06:2020-02-11 \
    2020-02-11:2020-02-16 2020-02-16:2020-02-21 2020-02-21:2020-02-26 \
    2020-02-26:2020-03-01
combine official13_0p25 --expect-segments 12 --out-label months2020-01-02 \
  || true
run run prob_0p25 --seg 2020-02-01:2020-02-06 2020-02-06:2020-02-11 \
    2020-02-11:2020-02-16 2020-02-16:2020-02-21 2020-02-21:2020-02-26 \
    2020-02-26:2020-03-01
combine prob_0p25 --expect-segments 12 --out-label months2020-01-02 || true
[ -f /tmp/chain7_watchdog.pid ] && kill "$(cat /tmp/chain7_watchdog.pid)" 2>/dev/null
echo "CHAIN7-DONE $(date -u)" >>"$L"
