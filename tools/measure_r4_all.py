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
import os
import runpy
import sys
import time
import traceback

sys.path.insert(0, ".")

_REAL_EXIT = os._exit


class _StepExit(BaseException):
    """Raised in place of os._exit so one tool's clean-FIN exit (ab_psmnet,
    bench) can't kill the whole chained session — the first run of this
    script died after step 1 exactly that way."""

STEPS = [
    # (name, path, argv, env-overrides)
    ("ab_cvdec", "tools/ab_psmnet.py",
     ["--configs", "default,no_cvdec,no_cvdec_no_cv"], {}),
    # r3_gates: per-site spatial gate OFF (Pallas at every trunk site) =
    # round-3 behavior, to bisect the 37.97 vs 28.76 ms full-fwd regression
    ("ab_r3_gates", "tools/ab_psmnet.py",
     ["--configs", "default,no_cvdec"],
     {"DISPRCNN_CONV3D_MIN_HW": "0"}),
    ("psm_segments", "tools/profile_psmnet.py", ["--segments"], {}),
    ("bench4", "bench.py", ["--pairs", "4", "--train", ""], {}),
    ("bench8", "bench.py", ["--pairs", "8", "--train", ""], {}),
    ("stage3_ref", "tools/profile_stage3.py",
     ["--pre-nms", "768", "--post-nms", "100"], {}),
    ("stage3_head", "tools/profile_stage3.py", [], {}),
    ("ab_stage3_ref", "tools/ab_stage3.py", ["--post-nms", "100"], {}),
    ("profile_2d", "tools/profile_2d.py", [], {}),
    ("tower_sites", "tools/bench_tower_sites.py", [], {}),
    ("rcnn_trace_ref", "tools/profile_rcnn_trace.py", ["--rois", "1600"], {}),
    ("trace_2d", "tools/trace_hotspots.py", ["--skip", "rpn3d"], {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    os._exit = lambda code=0: (_ for _ in ()).throw(_StepExit(code))
    for name, path, argv, env in STEPS:
        if name in skip or (only and name not in only):
            continue
        print(f"\n===== {name} START {time.strftime('%H:%M:%S')} =====",
              flush=True)
        t0 = time.time()
        sys.argv = [path] + list(argv)
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            runpy.run_path(path, run_name="__main__")
        except _StepExit:
            pass
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"[{name}] SystemExit({e.code})", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"[{name}] FAILED — continuing", flush=True)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        print(f"===== {name} END {time.time() - t0:.0f}s =====", flush=True)
    print("ALL STEPS DONE", flush=True)
    _REAL_EXIT(0)


if __name__ == "__main__":
    main()
