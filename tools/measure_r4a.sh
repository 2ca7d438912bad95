#!/bin/bash
# Round-4 measurement batch A — strictly sequential TPU jobs, each guarded
# by a relay-liveness probe; on a wedge we sleep 10 min and retry once.
# Logs under /root/repo/.cache/r4a/.
set -u
cd /root/repo
mkdir -p .cache/r4a

probe() {
  for i in 1 2 3; do
    python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1',8083))" 2>/dev/null \
      && python tools/tpu_probe.py --wait 120 >/dev/null 2>&1 && return 0
    echo "probe failed ($i) — sleeping 600s" >&2
    sleep 600
  done
  return 1
}

run() {  # run <name> <cmd...>
  local name=$1; shift
  probe || { echo "SKIP $name: tunnel down" | tee .cache/r4a/$name.log; return 1; }
  echo "=== $name: $(date -u +%H:%M:%S) ===" > .cache/r4a/$name.log
  "$@" >> .cache/r4a/$name.log 2>&1
  local rc=$?
  echo "=== rc=$rc $(date -u +%H:%M:%S) ===" >> .cache/r4a/$name.log
  if [ $rc -ne 0 ]; then sleep 600; fi  # let the tunnel settle after any failure
}

run trunk_sites python tools/bench_trunk_sites.py
run profile_2d python tools/profile_2d.py
run psm_segments python tools/profile_psmnet.py --segments
echo ALL_DONE > .cache/r4a/DONE
