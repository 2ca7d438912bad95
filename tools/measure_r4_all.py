"""Round-4 consolidated measurement session: ONE process, ONE tunnel attach.

The axon tunnel needs a long rest after every process exit (killed or not),
so per-tool processes cost ~20 min of probe-retry each. This runs the whole
measurement list in-process via runpy — chained executions in one client
are tunnel-safe. Each step is isolated by try/except; output goes to
stdout (tee to a log).

Usage: python tools/measure_r4_all.py [--skip name1,name2] [--only a,b]
"""
from __future__ import annotations

import argparse
import runpy
import sys
import time
import traceback

sys.path.insert(0, ".")

STEPS = [
    ("ab_cvdec", "tools/ab_psmnet.py",
     ["--configs", "default,no_cvdec,no_cvdec_no_cv"]),
    ("psm_segments", "tools/profile_psmnet.py", ["--segments"]),
    ("bench4", "bench.py", ["--pairs", "4", "--train", ""]),
    ("bench8", "bench.py", ["--pairs", "8", "--train", ""]),
    ("stage3_ref", "tools/profile_stage3.py",
     ["--pre-nms", "768", "--post-nms", "100"]),
    ("stage3_head", "tools/profile_stage3.py", []),
    ("profile_2d", "tools/profile_2d.py", []),
    ("tower_sites", "tools/bench_tower_sites.py", []),
    ("rcnn_trace_ref", "tools/profile_rcnn_trace.py", ["--rois", "1600"]),
    ("trace_2d", "tools/trace_hotspots.py", ["--skip", "rpn3d"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    for name, path, argv in STEPS:
        if name in skip or (only and name not in only):
            continue
        print(f"\n===== {name} START {time.strftime('%H:%M:%S')} =====",
              flush=True)
        t0 = time.time()
        sys.argv = [path] + list(argv)
        try:
            runpy.run_path(path, run_name="__main__")
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"[{name}] SystemExit({e.code})", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"[{name}] FAILED — continuing", flush=True)
        print(f"===== {name} END {time.time() - t0:.0f}s =====", flush=True)


if __name__ == "__main__":
    main()
