#!/bin/bash
# Round-5 chain, final orchestration: re-orders chain7's tail so the
# chip is IDLE when the driver's end-of-round bench.py runs (~22:05).
#
# chain7's own order (official13 Feb -> combine -> prob Feb until the
# 22:05 watchdog -> combine) leaves chain8's tile sweep to fire only
# after chain7 exits — i.e. AFTER 22:05, colliding with bench.py on the
# tunnel.  This chain instead: (1) kills chain8's waiter immediately,
# (2) lets chain7 finish the official13 February leg + month combine,
# (3) raises /tmp/ns_stop so chain7 skips its prob leg and exits,
# (4) runs the official-geometry tile sweep in that clean gap (its 3
# prior attempts died on transient remote_compile flakes — running it
# early leaves time to react), then (5) runs prob February segments
# with a 21:10 cutoff so the last segment drains by ~21:55.
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain9.log}
export WB2_NS_MIN_FREE_GIB=30
C7=/tmp/ns_chain7.log

# (1) chain8 only waits on a fragile wrapper pid; we own the sweep now.
for f in /tmp/chain8.pid /tmp/chain8_sh.pid; do
  p=$(cat "$f" 2>/dev/null) && [ -n "$p" ] && kill "$p" 2>/dev/null
done
echo "chain9: chain8 waiter neutralized [$(date -u +%H:%M:%S)]" >>"$L"

# (2) wait for the final official13 Feb segment to start (or the leg to
# end some other way), then raise the stop flag: the in-flight segment
# and the combine still run; the prob leg is skipped.
while :; do
  grep -q "=== official13_0p25 2020-02-26:2020-03-01 ===" "$C7" 2>/dev/null && break
  grep -q "=== chain7: combine official13_0p25" "$C7" 2>/dev/null && break
  grep -q "CHAIN7-DONE" "$C7" 2>/dev/null && break
  sleep 60
done
touch /tmp/ns_stop
echo "chain9: ns_stop raised [$(date -u +%H:%M:%S)]" >>"$L"
while ! grep -q "CHAIN7-DONE" "$C7" 2>/dev/null; do sleep 60; done
echo "chain9: chain7 done [$(date -u +%H:%M:%S)]" >>"$L"
rm -f /tmp/ns_stop

# (4) tile sweep in the clean gap (VERDICT round-4 task 5, thrice-flaked)
echo "=== chain9: sweep_tiles 10 official_0p25 [$(date -u +%H:%M:%S)] ===" >>"$L"
timeout 2400 python tools/sweep_tiles.py 10 official_0p25 >/tmp/sweep_r5d.log 2>&1
echo "chain9: sweep rc=$? (see /tmp/sweep_r5d.log)" >>"$L"

# (5) prob February until the cutoff; completed segments are skipped
# via the ledger, so a partial chain7 prob leg composes cleanly.
D=$(date -d "2026-08-19 21:10 UTC" +%s)
( while :; do
    [ "$(date +%s)" -ge "$D" ] && { touch /tmp/ns_stop; break; }
    sleep 60
  done ) &
WD=$!
echo "=== chain9: prob_0p25 February [$(date -u +%H:%M:%S)] ===" >>"$L"
python tools/north_star.py run prob_0p25 --seg 2020-02-01:2020-02-06 \
    2020-02-06:2020-02-11 2020-02-11:2020-02-16 2020-02-16:2020-02-21 \
    2020-02-21:2020-02-26 2020-02-26:2020-03-01 >>"$L" 2>&1
python tools/north_star.py combine prob_0p25 --expect-segments 12 \
    --out-label months2020-01-02 >>"$L" 2>&1 || true
kill "$WD" 2>/dev/null
touch /tmp/ns_stop  # keep the chip quiet for the driver's bench run
echo "CHAIN9-DONE $(date -u)" >>"$L"
