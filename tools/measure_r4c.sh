#!/bin/bash
# Round-4 batch C: re-warm the multichip dryrun's persistent compile cache
# (the cvdec + batch-linear-ROIAlign changes invalidated the round-3 warm
# entries) and re-time the exact driver command. CPU-only — safe to run
# while the TPU tunnel rests, but NOT concurrently with TPU jobs (they
# compete for host cores during XLA:CPU compile).
set -u
cd /root/repo
mkdir -p .cache/r4c
echo "=== dryrun cold+warm: $(date -u +%H:%M:%S) ===" > .cache/r4c/dryrun.log
/usr/bin/time -v python - >> .cache/r4c/dryrun.log 2>&1 <<'EOF'
import time, __graft_entry__ as g
t0 = time.time()
g.dryrun_multichip(8)
print(f"COLD-ISH TOTAL {time.time()-t0:.1f}s", flush=True)
EOF
echo "=== warm re-run: $(date -u +%H:%M:%S) ===" >> .cache/r4c/dryrun.log
timeout 580 python - >> .cache/r4c/dryrun.log 2>&1 <<'EOF'
import time, __graft_entry__ as g
t0 = time.time()
g.dryrun_multichip(8)
print(f"WARM TOTAL {time.time()-t0:.1f}s", flush=True)
EOF
echo "=== rc=$? $(date -u +%H:%M:%S) ===" >> .cache/r4c/dryrun.log
echo DONE > .cache/r4c/DONE
