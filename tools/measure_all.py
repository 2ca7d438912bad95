"""One-attach measurement batch: stage3 + pipeline breakdowns + bench.

The axon tunnel wedges when TPU clients are killed or run concurrently
(CLAUDE.md); every process attach is a risk. This runs all the standard
measurements sequentially inside ONE process / ONE tunnel attach.

Usage: python tools/measure_all.py [--skip stage3,pipeline,bench]
"""
from __future__ import annotations

import argparse
import sys
import traceback

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: stage3,pipeline,psmnet,bench")
    ap.add_argument("--pairs", type=int, default=4)
    skip = set(ap.parse_args().skip.split(","))

    def run(name, fn):
        if name in skip:
            return
        print(f"\n===== {name} =====", flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()
        print(f"===== {name} done =====", flush=True)

    import tools.kernel_smoke as ks
    import tools.profile_stage3 as ps3
    import tools.profile_pipeline as pp
    import bench

    # kernel smoke FIRST: a Mosaic rejection gets attributed to a kernel
    # name instead of failing a 2-minute pipeline compile (kernel_smoke
    # sys.exits on failure — catch and continue so the XLA-fallback
    # measurements still happen; bisect later with DISPRCNN_PALLAS_DISABLE)
    def smoke():
        try:
            ks.main([])
        except SystemExit as e:
            if e.code:
                raise RuntimeError(f"kernel smoke failures (rc={e.code})")

    run("kernel_smoke", smoke)
    run("stage3", ps3.main)
    run("pipeline", lambda: pp.main([]))
    run("bench", lambda: bench.main(pairs=ap.parse_args().pairs))
    run("bench8", lambda: bench.main(pairs=8, budgets="headline"))


if __name__ == "__main__":
    main()
