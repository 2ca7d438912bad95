"""Round-5 consolidated measurement session: ONE process, ONE tunnel attach.

Same discipline as measure_r4_all.py (the axon tunnel needs a long rest
after every process exit, so all steps chain in-process via runpy; env is
re-baselined before each step after the r4b leak).

Queues (--only groups):
  r5a — lanes-gather SA kernel: on-chip Mosaic acceptance + bit-parity
        (kernel_smoke sa variants), then the A/B at both budgets.
  r5b — pairs=16 with the ROI-block scan + reference-budget stage-3
        profile with whatever SA default won r5a.
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
    pass


STEPS = [
    # --- r5a: the lanes kernel meets real Mosaic ---
    ("probe_lanes", "tools/probe_lanes_gather.py", [], {}),
    # smoke keeps sa (lanes variants) AND roipool (r5 bf16-fold gather)
    ("smoke_sa", "tools/kernel_smoke.py",
     ["--skip", "conv3d,s2,deconv,cl1,cv,wconv,fp,softargmin,topk"],
     {}),
    ("ab_sa_kernel", "tools/ab_sa_kernel.py",
     ["--configs", "default,mt64,mt32,mt64+rows2"], {}),
    ("ab_s3_ref_mt", "tools/ab_stage3.py",
     ["--configs", "default(c0=64),mt64,mt32", "--post-nms", "100"], {}),
    # --- r5b: batching + profiles (run with --only after r5a's verdict) ---
    ("bench16", "bench.py", ["--pairs", "16", "--train", ""], {}),
    ("bench8", "bench.py", ["--pairs", "8", "--train", ""], {}),
    ("stage3_ref", "tools/profile_stage3.py",
     ["--pre-nms", "768", "--post-nms", "100"], {}),
    ("rcnn_trace", "tools/profile_rcnn_trace.py", ["--rois", "1600"], {}),
    ("profile_2d", "tools/profile_2d.py", [], {}),
    ("psm_segments", "tools/profile_psmnet.py", ["--segments"], {}),
    # --- r5c: train-stage batch sweeps (judge r4 weak #6) ---
    ("train_sweep_psm", "tools/bench_train.py",
     ["--stages", "psm", "--sweep", "1,2,4",
      "--out", ".cache/r5/train_sweep_psm.json"], {}),
    ("train_sweep_pc", "tools/bench_train.py",
     ["--stages", "pc", "--sweep", "1,2,4",
      "--out", ".cache/r5/train_sweep_pc.json"], {}),
    ("train_sweep_2d", "tools/bench_train.py",
     ["--stages", "2d", "--sweep", "2,4,8",
      "--out", ".cache/r5/train_sweep_2d.json"], {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}

    os._exit = lambda code=0: (_ for _ in ()).throw(_StepExit(code))
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
        print(f"===== {name} END {time.time() - t0:.1f}s =====", flush=True)
    _REAL_EXIT(0)


if __name__ == "__main__":
    main()
