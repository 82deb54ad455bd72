#!/bin/bash
# Round-4 chain, phase 2 (tunnel-budget-aware reprioritization).
#
# Measured this round: the sandbox tunnel costs ~50-70 s per GB of
# EXECUTED device input (hashing/validation inside the tunnel client),
# independent of program count or h2d burst rate (~1.5 GiB/s into the
# client cache).  The device spectra path is therefore ~3x slower than
# host numpy HERE (and only here); its design point is recorded by the
# 2020-03/04 device rows (nonzero h2d, jitted MXU DFT).  The remaining
# spectra months run the host path (WB2_NO_DEVICE=1) to finish the year
# 12/12, and the tunnel budget goes to the probabilistic 0.25-degree
# month (VERDICT round-3 task 4: at least 6 five-day segments).
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain.log}
run() {
  [ -f /tmp/ns_stop ] && { echo "chain: stop file, exiting" >>"$L"; exit 0; }
  echo "=== chain: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
# finish the spectra year on host (fast here; rows record the path via
# chunks/h2d fields)
WB2_NO_DEVICE=1 run run spectra_0p25
# the probabilistic ENS 0.25-degree January (round 3 measured the first
# two segments; this completes the month)
run run prob_0p25 --seg 2020-01-01:2020-01-06 2020-01-06:2020-01-11 \
    2020-01-11:2020-01-16 2020-01-16:2020-01-21 2020-01-21:2020-01-26 \
    2020-01-26:2020-02-01
# further official13_0p25 segments as budget allows
run run official13_0p25 --seg 2020-01-06:2020-01-11 2020-01-11:2020-01-16 \
    2020-01-16:2020-01-21 2020-01-21:2020-01-26 2020-01-26:2020-02-01
run run det2_0p25 --pass-id 2
echo "CHAIN-DONE $(date -u)" >>"$L"
