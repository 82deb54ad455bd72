#!/bin/bash
# Round-5 chain, final leg: the official-geometry tile sweep in the
# wind-down window (after chain7's deadline watchdog stops new eval
# segments), when the chip is otherwise idle.  The sweep's three prior
# in-chain attempts died on transient remote_compile network errors;
# sweep_tiles.py now retries those per schedule.  10 iterations (not
# 30): each timed scan at (126, 1.04M, 13) consumes ~1.6 GB of program
# input behind the ~55 s/GB tunnel, so 30-iteration walls are priced by
# the tunnel, not the kernel — 10 keeps the whole sweep inside the
# window while still amortizing dispatch RTT across the scan.
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain8.log}
CHAIN7_PID=${1:-}
if [ -n "$CHAIN7_PID" ]; then
  echo "chain8: waiting for chain7 ($CHAIN7_PID) [$(date -u +%H:%M:%S)]" >>"$L"
  while kill -0 "$CHAIN7_PID" 2>/dev/null; do sleep 60; done
fi
echo "=== chain8: sweep_tiles 10 official_0p25 [$(date -u +%H:%M:%S)] ===" >>"$L"
timeout 2400 python tools/sweep_tiles.py 10 official_0p25 \
    >/tmp/sweep_r5c.log 2>&1
echo "chain8: sweep rc=$? (see /tmp/sweep_r5c.log)" >>"$L"
echo "CHAIN8-DONE $(date -u)" >>"$L"
