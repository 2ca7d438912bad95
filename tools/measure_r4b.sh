#!/bin/bash
# Round-4 measurement batch B: validate cvdec + per-site gates on chip,
# re-segment PSMNet, then the full bench at pairs 4 and 8.
set -u
cd /root/repo
mkdir -p .cache/r4b

probe() {
  for i in 1 2 3; do
    python -c "import socket; s=socket.socket(); s.settimeout(3); s.connect(('127.0.0.1',8083))" 2>/dev/null \
      && python tools/tpu_probe.py --wait 120 >/dev/null 2>&1 && return 0
    echo "probe failed ($i) — sleeping 600s" >&2
    sleep 600
  done
  return 1
}

run() {
  local name=$1; shift
  probe || { echo "SKIP $name: tunnel down" | tee .cache/r4b/$name.log; return 1; }
  echo "=== $name: $(date -u +%H:%M:%S) ===" > .cache/r4b/$name.log
  "$@" >> .cache/r4b/$name.log 2>&1
  local rc=$?
  echo "=== rc=$rc $(date -u +%H:%M:%S) ===" >> .cache/r4b/$name.log
  if [ $rc -ne 0 ]; then sleep 600; fi
}

run ab_cvdec python tools/ab_psmnet.py --configs default,no_cvdec,no_cvdec_no_cv
run psm_segments python tools/profile_psmnet.py --segments
run bench4 python bench.py --pairs 4 --train ""
run bench8 python bench.py --pairs 8 --train ""
run stage3_ref python tools/profile_stage3.py --pre-nms 768 --post-nms 100
run stage3_head python tools/profile_stage3.py
run tower_sites python tools/bench_tower_sites.py
run rcnn_trace_ref python tools/profile_rcnn_trace.py --rois 1600
run trace_2d python tools/trace_hotspots.py --skip rpn3d
echo ALL_DONE > .cache/r4b/DONE
