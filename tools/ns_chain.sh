#!/bin/bash
# Round-3 measurement chain: the workloads queued behind the backend
# outage, in priority order.  Run detached (nohup); halts cleanly
# between segments if /tmp/ns_stop exists.  Log: /tmp/ns_chain.log.
# Idempotent: north_star.py skips segments already recorded ok (per
# pass), so relaunching after a session restart resumes where it died.
set -u
cd /root/repo
L=${WB2_CHAIN_LOG:-/tmp/ns_chain.log}
run() {
  [ -f /tmp/ns_stop ] && { echo "chain: stop file, exiting" >>"$L"; exit 0; }
  echo "=== chain: $* [$(date -u +%H:%M:%S)] ===" >>"$L"
  python tools/north_star.py "$@" >>"$L" 2>&1
}
run run official13_0p25 --seg 2020-01-01:2020-01-06
run run spectra_0p25 --seg 2020-01
run run official13_0p25 --seg 2020-01-06:2020-01-11
# clean-year re-run after the store-corruption incident (pass 2;
# original pass-1 rows stay as the historical measurement)
run run det2_0p25 --pass-id 2
echo "CHAIN-DONE $(date -u)" >>"$L"
