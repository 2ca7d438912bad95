"""Aggregate a jax.profiler trace into a per-op-name duration report.

The axon tunnel has no TensorBoard; the .trace.json.gz event dump is parsed
directly: device-stream tracks are detected heuristically (many distinct
HLO names) and durations summed per (possibly truncated) op name.

Usage:
  from tools.trace_report import capture, report
  capture(fn, *args, trace_dir="/tmp/t", iters=5)   # fn must be jitted
  report("/tmp/t", top=30)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json


def capture(fn, *args, trace_dir: str, iters: int = 5):
    import os

    import jax
    import jax.numpy as jnp

    os.system(f"rm -rf {trace_dir}")
    out = fn(*args)
    jax.block_until_ready(out)
    # host readback: block_until_ready is a no-op over the axon tunnel
    float(sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)))
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        float(sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(out)))
    return out


def report(trace_dir: str, top: int = 30, name_len: int = 60, iters: int = 5):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    for f in files:
        ev = json.load(gzip.open(f))["traceEvents"]
        bypid = collections.defaultdict(collections.Counter)
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                bypid[e.get("pid", -1)][e.get("name", "")[:name_len]] += e["dur"]
        for pid, c in bypid.items():
            tot = sum(c.values())
            if tot > 1000 and len(c) > 5:
                # skip the XLA-module parent span (covers all children)
                inner = {n: d for n, d in c.items() if not n.startswith("jit_")}
                itot = sum(inner.values())
                print(f"--- pid {pid}: {itot / 1e3 / iters:.2f} ms/iter "
                      f"device-op time over {len(inner)} names")
                for name, dur in collections.Counter(inner).most_common(top):
                    print(f"   {dur / 1e3 / iters:9.3f} ms  {name}")



def report_by_source(trace_dir: str, hlo_text: str, top: int = 25, iters: int = 5,
                     depth: int = 3, prefix: str = ""):
    """Join device-op durations with the compiled HLO's metadata: aggregates
    trace time per op_name prefix (module path) / source line."""
    import re

    meta = {}
    for line in hlo_text.splitlines():
        m = re.search(r"%(\S+?) = ", line)
        op = re.search(r'op_name="([^"]+)"', line)
        if m and op:
            meta[m.group(1)] = op.group(1)
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    agg = collections.Counter()
    unattributed = 0
    for f in files:
        ev = json.load(gzip.open(f))["traceEvents"]
        for e in ev:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "")
            if name.startswith("jit_") or "$" in name or name.startswith("Pjit"):
                continue
            key = meta.get(name)
            if key is None:
                unattributed += e["dur"] if e.get("pid") == 3 else 0
                continue
            # aggregate at a path level (module scope); paths start with the
            # jit(...) wrapper, so match/print from parts[1:]
            parts = key.split("/")
            if prefix and not "/".join(parts[1:]).startswith(prefix):
                continue
            scope = "/".join(parts[1:depth]) if len(parts) >= depth else key
            agg[scope] += e["dur"]
    total = sum(agg.values())
    print(f"attributed {total / 1e3 / iters:.2f} ms/iter; "
          f"unattributed {unattributed / 1e3 / iters:.2f} ms/iter")
    for scope, dur in agg.most_common(top):
        print(f"   {dur / 1e3 / iters:9.3f} ms  {scope}")

if __name__ == "__main__":
    import sys

    report(sys.argv[1], top=int(sys.argv[2]) if len(sys.argv) > 2 else 30)
