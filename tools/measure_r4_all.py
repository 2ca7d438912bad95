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
    # r4c CLEAN queue: the r4b queue ran with ab_psmnet's leaked
    # PALLAS_ENABLE=s2,wconv,softargmin after step 1 — every PSMNet number
    # was all_on, not shipping (the "39.31 ms r3 config" = r3's all_on 39.1,
    # not a slower chip). Re-measure the contaminated set cleanly.
    ("ab_shipping", "tools/ab_psmnet.py",
     ["--configs", "shipping,shipping_cvdec,all_on"], {}),
    ("psm_segments", "tools/profile_psmnet.py", ["--segments"], {}),
    ("bench8", "bench.py", ["--pairs", "8", "--train", ""], {}),
    ("bench16", "bench.py", ["--pairs", "16", "--train", ""], {}),
    ("trace_trunk", "tools/trace_hotspots.py",
     ["--skip", "2d,tower,rpn3d"], {}),
    ("bench_full", "bench.py", [], {}),  # driver-equivalent incl train
    # --- r4d follow-ups (run with --only; not part of the r4c queue) ---
    # 1) real-Mosaic compile + bit-parity of the r4 SA variants
    ("smoke_sa", "tools/kernel_smoke.py",
     ["--skip", "conv3d,s2,deconv,cl1,cv,wconv,fp,roipool,softargmin,topk"],
     {}),
    # 2) rpn3d standalone: r3 ledger said 1.24 ms at default gate, r4b said
    #    4.42 and the pipeline says 5.0-5.4 — reproduce or retract the 1.24;
    #    plus the SA-variant A/B at the headline geometry
    ("ab_s3_head", "tools/ab_stage3.py",
     ["--configs",
      "default(c0=64),ranks_cumsum,vt_fold,cumsum+fold",
      "--post-nms", "16"], {}),
    # 3) the SA-variant A/B where the win lives: 1600-ROI reference budget
    ("ab_s3_ref", "tools/ab_stage3.py",
     ["--configs", "default(c0=64),ranks_cumsum,vt_fold,cumsum+fold",
      "--post-nms", "100"], {}),
    ("trace_rpn3d", "tools/trace_hotspots.py",
     ["--skip", "2d,tower,trunk"], {}),
    # --- r4e follow-ups: cumsum fixed (Pallas had no cumsum lowering —
    # now a log-shift scan) + the rows-per-grid-step variant
    ("smoke_sa2", "tools/kernel_smoke.py",
     ["--skip", "conv3d,s2,deconv,cl1,cv,wconv,fp,roipool,softargmin,topk"],
     {}),
    ("ab_s3_head2", "tools/ab_stage3.py",
     ["--configs",
      "default(c0=64),ranks_cumsum,cumsum+fold,rows4,rows4+cumsum+fold",
      "--post-nms", "16"], {}),
    ("ab_s3_ref2", "tools/ab_stage3.py",
     ["--configs",
      "default(c0=64),ranks_cumsum,cumsum+fold,rows4,rows4+cumsum+fold",
      "--post-nms", "100"], {}),
    # --- r4f: the dynamic-gather SA kernel (smoke incl. gather parity
    # now lives in smoke_sa2's variant check)
    ("smoke_sa3", "tools/kernel_smoke.py",
     ["--skip", "conv3d,s2,deconv,cl1,cv,wconv,fp,roipool,softargmin,topk"],
     {}),
    ("ab_s3_head3", "tools/ab_stage3.py",
     ["--configs", "default(c0=64),gather,gather+rows4",
      "--post-nms", "16"], {}),
    ("ab_s3_ref3", "tools/ab_stage3.py",
     ["--configs", "default(c0=64),gather,gather+rows4",
      "--post-nms", "100"], {}),
    # --- r4h: xfold (one selection dot) x ranks; bisect dropped — Mosaic's
    # dynamic_gather can't index >1 vreg along the gather dim (r4g queue)
    ("smoke_sa4", "tools/kernel_smoke.py",
     ["--skip", "conv3d,s2,deconv,cl1,cv,wconv,fp,roipool,softargmin,topk"],
     {}),
    ("ab_s3_head4", "tools/ab_stage3.py",
     ["--configs", "default(c0=64),xfold,xfold+cumsum",
      "--post-nms", "16"], {}),
    ("ab_s3_ref4", "tools/ab_stage3.py",
     ["--configs", "default(c0=64),xfold,xfold+cumsum,ranks_cumsum",
      "--post-nms", "100"], {}),
    # full driver-equivalent bench with the candidate new defaults pinned
    # (flip the code defaults to whichever wins before round end)
    ("bench_xfold", "bench.py", [], {"DISPRCNN_SA_XFOLD": "1"}),
    ("bench_xfold_cumsum", "bench.py", [],
     {"DISPRCNN_SA_XFOLD": "1", "DISPRCNN_SA_RANKS": "cumsum"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    os._exit = lambda code=0: (_ for _ in ()).throw(_StepExit(code))
    # Baseline of every DISPRCNN_* env var at session start: restored before
    # EACH step so one tool's leaked mutation (ab_psmnet's unrestored
    # PALLAS_ENABLE contaminated the whole 2026-08-19 r4b queue) can't bleed
    # into the next step's measurement.
    base_env = {k: v for k, v in os.environ.items()
                if k.startswith("DISPRCNN_")}
    for name, path, argv, env in STEPS:
        if name in skip or (only and name not in only):
            continue
        print(f"\n===== {name} START {time.strftime('%H:%M:%S')} =====",
              flush=True)
        t0 = time.time()
        sys.argv = [path] + list(argv)
        for k in [k for k in os.environ if k.startswith("DISPRCNN_")]:
            os.environ.pop(k, None)
        os.environ.update(base_env)
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
