"""On-chip smoke for every round-2 Pallas kernel, one at a time.

None of these kernels has met real Mosaic (they were developed against a
dead tunnel, interpret-verified only). Run THIS before measure_all: each
kernel compiles+executes standalone at its production geometry with a
try/except, so a Mosaic rejection is attributed to a kernel name instead
of failing a 2-minute pipeline compile. Exits 0 if all pass.

Usage: python tools/kernel_smoke.py [--skip a,b]
"""
from __future__ import annotations

import argparse
import sys
import traceback

import functools
import os

import numpy as np

sys.path.insert(0, ".")

# DISPRCNN_SMOKE_INTERPRET=1: run every kernel in interpret mode (CPU
# validation of the harness's shapes without a chip)
_INTERPRET = os.environ.get("DISPRCNN_SMOKE_INTERPRET") == "1"


def _maybe_interpret(fn):
    return functools.partial(fn, interpret=True) if _INTERPRET else fn

FAILED = []


def run(name, fn):
    print(f"--- {name}", flush=True)
    try:
        fn()
        print(f"    OK", flush=True)
    except Exception:
        FAILED.append(name)
        traceback.print_exc()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    skip = set(ap.parse_args(argv).skip.split(","))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)
    r = np.random.default_rng(0)

    def put(a, dt=jnp.bfloat16):
        return jax.device_put(jnp.asarray(a, dt), dev)

    if "conv3d" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel
        from disprcnn_tpu.ops.pallas import packed_conv as _pc
        packed_conv_bn = _maybe_interpret(_pc.packed_conv_bn)
        packed_conv_bn_pair = _maybe_interpret(_pc.packed_conv_bn_pair)

        x4 = put(r.normal(size=(96, 56, 56, 128)))
        k = put(r.normal(size=(3, 3, 3, 32, 32)) * 0.1)
        mul = put(np.ones(128), jnp.float32)
        add = put(np.zeros(128), jnp.float32)

        def f():
            w2 = pack_kernel(k, 4)
            y = packed_conv_bn(x4, w2, mul, add, 6, 4, relu=True)
            y2 = packed_conv_bn(x4, w2, mul, add, 6, 4, relu=True,
                                residual=y)
            float(jnp.sum(y2.astype(jnp.float32)))

        run("conv3d stride-1 (+residual)", f)
        run("conv3d multirow rows=4", lambda: float(jnp.sum(packed_conv_bn(
            put(r.normal(size=(96, 28, 28, 128))), pack_kernel(k, 4),
            mul, add, 6, 4, relu=True, rows=4).astype(jnp.float32))))
        run("conv3d out_repack", lambda: float(jnp.sum(packed_conv_bn(
            x4, pack_kernel(k, 4), mul, add, 6, 4, relu=True,
            out_repack=True).astype(jnp.float32))))
        run("conv3d pair", lambda: float(jnp.sum(packed_conv_bn_pair(
            x4, x4, pack_kernel(k, 4), pack_kernel(k, 4), mul, add, 6, 4,
            relu=True).astype(jnp.float32))))

    if "s2" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel_strided
        from disprcnn_tpu.ops.pallas import packed_conv as _pc2
        packed_conv_bn_s2 = _maybe_interpret(_pc2.packed_conv_bn_s2)

        k2 = put(r.normal(size=(3, 3, 3, 32, 64)) * 0.1)
        run("s2 56->28", lambda: float(jnp.sum(packed_conv_bn_s2(
            put(r.normal(size=(96, 56, 56, 128))),
            pack_kernel_strided(k2, 4),
            put(np.ones(128), jnp.float32), put(np.zeros(128), jnp.float32),
            6, 4, relu=True).astype(jnp.float32))))

    if "deconv" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel_transposed
        from disprcnn_tpu.ops.pallas import packed_conv as _pc3
        packed_deconv_bn = _maybe_interpret(_pc3.packed_deconv_bn)

        kd = put(r.normal(size=(3, 3, 3, 64, 64)) * 0.1)
        run("deconv 14->28 rows=4", lambda: float(jnp.sum(packed_deconv_bn(
            put(r.normal(size=(96, 14, 14, 64))),
            pack_kernel_transposed(kd, 1),
            put(np.ones(128), jnp.float32), put(np.zeros(128), jnp.float32),
            6, 1, relu=True, rows=4).astype(jnp.float32))))

    if "cv" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel
        from disprcnn_tpu.ops.pallas import packed_conv as _pc4
        cost_volume_conv_bn = _maybe_interpret(_pc4.cost_volume_conv_bn)

        kcv = put(r.normal(size=(3, 3, 3, 64, 32)) * 0.1)
        run("cost-volume conv", lambda: float(jnp.sum(cost_volume_conv_bn(
            put(r.normal(size=(16, 56, 56, 32))),
            put(r.normal(size=(16, 56, 56, 32))),
            pack_kernel(kcv[:, :, :, :32, :], 4),
            pack_kernel(kcv[:, :, :, 32:, :], 4),
            put(np.ones(128), jnp.float32), put(np.zeros(128), jnp.float32),
            6, 4, -12, relu=True).astype(jnp.float32))))

    if "wconv" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel_w
        from disprcnn_tpu.ops.pallas import packed_conv as _pc5
        wpacked_conv_bn = _maybe_interpret(_pc5.wpacked_conv_bn)

        kw = put(r.normal(size=(3, 3, 32, 32)) * 0.1)
        run("wpacked conv", lambda: float(jnp.sum(wpacked_conv_bn(
            put(r.normal(size=(32, 112, 28, 128))), pack_kernel_w(kw, 4),
            put(np.ones(128), jnp.float32), put(np.zeros(128), jnp.float32),
            4, relu=True).astype(jnp.float32))))

    if "sa" not in skip:
        from disprcnn_tpu.ops.pallas import sa_fused as _sf
        sa_ball_mlp_max = _maybe_interpret(_sf.sa_ball_mlp_max)

        ws = tuple(
            (put(r.normal(size=(128, 128)) * 0.1, jnp.float32),
             put(np.zeros(128), jnp.float32))
            for _ in range(2)
        )
        run("sa mega-kernel (256x128x64, N=512)", lambda: float(jnp.sum(
            sa_ball_mlp_max(
                put(r.normal(size=(256, 512, 3)) * 2, jnp.float32),
                put(r.normal(size=(256, 128, 3)) * 2, jnp.float32),
                put(r.normal(size=(256, 512, 128))),
                put(r.normal(size=(3, 128)) * 0.1, jnp.float32),
                put(np.ones(128), jnp.float32), put(np.zeros(128), jnp.float32),
                ws, 1.5, 64).astype(jnp.float32))))

    if "fp" not in skip:
        from disprcnn_tpu.ops.pallas import fp_fused as _ff
        fp_fused = _maybe_interpret(_ff.fp_fused)

        wf = ((put(r.normal(size=(384, 128)) * 0.1, jnp.float32),
               put(np.zeros(128), jnp.float32)),)
        run("fp fused (768<-256)", lambda: float(jnp.sum(fp_fused(
            put(r.normal(size=(16, 768, 3)) * 2, jnp.float32),
            put(r.normal(size=(16, 256, 3)) * 2, jnp.float32),
            put(r.normal(size=(16, 256, 256))),
            put(r.normal(size=(16, 768, 128))),
            wf).astype(jnp.float32))))

    if "roipool" not in skip:
        from disprcnn_tpu.ops.pallas import roipool3d_fused as _rf
        roipool3d_fused = _maybe_interpret(_rf.roipool3d_fused)

        boxes = np.tile(np.array([[0.0, 1, 0, 2, 3, 3, 0.4]], np.float32),
                        (16, 16, 1))
        run("roipool3d fused (16x16x768, S=512)", lambda: float(jnp.sum(
            roipool3d_fused(
                put(r.uniform(-4, 4, (16, 768, 3)), jnp.float32),
                put(r.normal(size=(16, 768, 130)), jnp.float32),
                put(boxes, jnp.float32), 512)[0])))

    if "topk" not in skip:
        from disprcnn_tpu.ops.topk_select import topk_threshold

        s = put(r.uniform(0, 1, (4, 119000)), jnp.float32)
        run("topk threshold 6000-of-119k", lambda: float(jnp.sum(
            topk_threshold(s, 6000)[0])))

    print(f"\n{'ALL OK' if not FAILED else 'FAILED: ' + ','.join(FAILED)}",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
