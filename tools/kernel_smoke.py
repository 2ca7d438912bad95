"""On-chip smoke + parity for every round-2 Pallas kernel, one at a time.

None of these kernels has met real Mosaic (they were developed against a
dead tunnel, interpret-verified only). Run THIS before measure_all: each
kernel compiles+executes standalone at its production geometry with a
try/except, so a Mosaic rejection is attributed to a kernel name instead
of failing a 2-minute pipeline compile. Where an XLA fallback exists the
outputs are also compared ON-CHIP — catching silent miscompiles
(pltpu.roll semantics, layout bugs) that a crash-only smoke would miss.
Exits 0 if all pass.

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


def check(name, got, want, tol=3e-2):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    denom = np.maximum(np.abs(want), 1.0)
    rel = float(np.max(np.abs(got - want) / denom))
    print(f"    max rel err vs XLA fallback: {rel:.2e}", flush=True)
    if not rel < tol:
        raise AssertionError(f"{name}: on-chip parity {rel:.3e} >= {tol}")


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

        from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_r4

        def f():
            w2 = pack_kernel(k, 4)
            y = packed_conv_bn(x4, w2, mul, add, 6, 4, relu=True)
            want = jnp.maximum(
                conv3d_packed_r4(x4, k, 4, 6).astype(jnp.float32) * mul + add,
                0)
            check("conv3d", y, want)
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

        from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_strided_r4

        k2 = put(r.normal(size=(3, 3, 3, 32, 64)) * 0.1)
        xs2 = put(r.normal(size=(96, 56, 56, 128)))

        def fs2():
            got = packed_conv_bn_s2(
                xs2, pack_kernel_strided(k2, 4),
                put(np.ones(128), jnp.float32),
                put(np.zeros(128), jnp.float32), 6, 4, relu=True)
            want = jnp.maximum(conv3d_packed_strided_r4(xs2, k2, 4, 6), 0)
            check("s2", got, want)

        run("s2 56->28", fs2)

    if "deconv" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel_transposed
        from disprcnn_tpu.ops.pallas import packed_conv as _pc3
        packed_deconv_bn = _maybe_interpret(_pc3.packed_deconv_bn)

        from disprcnn_tpu.ops.conv3d_packed import (
            conv3d_packed_transposed_r4,
        )

        kd = put(r.normal(size=(3, 3, 3, 64, 64)) * 0.1)
        xdc = put(r.normal(size=(96, 14, 14, 64)))

        def fdc():
            got = packed_deconv_bn(
                xdc, pack_kernel_transposed(kd, 1),
                put(np.ones(128), jnp.float32),
                put(np.zeros(128), jnp.float32), 6, 1, relu=True, rows=4)
            want = jnp.maximum(conv3d_packed_transposed_r4(xdc, kd, 1, 6), 0)
            check("deconv", got, want)

        run("deconv 14->28 rows=4", fdc)

    if "cl1" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_r4, pack_kernel
        from disprcnn_tpu.ops.pallas import packed_conv as _pcc
        _conv_bn_cl1 = _maybe_interpret(_pcc.packed_conv_bn)

        kcl = put(r.normal(size=(3, 3, 3, 32, 1)) * 0.1)
        xcl = put(r.normal(size=(16, 56, 56, 24 * 32)))

        def fcl1():
            got = _conv_bn_cl1(
                xcl, pack_kernel(kcl, 24),
                put(np.ones(24), jnp.float32),
                put(np.zeros(24), jnp.float32), 1, 24, relu=False)
            want = conv3d_packed_r4(xcl, kcl, 24, 1)
            check("cl1", got, want)

        run("cl1 classif G=24 Co=1 dg=1", fcl1)

    if "cv" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel
        from disprcnn_tpu.ops.pallas import packed_conv as _pc4
        cost_volume_conv_bn = _maybe_interpret(_pc4.cost_volume_conv_bn)

        from disprcnn_tpu.models.psmnet.psmnet import (
            build_cost_volume_packed,
        )
        from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_r4

        kcv = put(r.normal(size=(3, 3, 3, 64, 32)) * 0.1)
        lfcv = put(r.normal(size=(16, 56, 56, 32)))
        rfcv = put(r.normal(size=(16, 56, 56, 32)))

        def fcv():
            got = cost_volume_conv_bn(
                lfcv, rfcv,
                pack_kernel(kcv[:, :, :, :32, :], 4),
                pack_kernel(kcv[:, :, :, 32:, :], 4),
                put(np.ones(128), jnp.float32),
                put(np.zeros(128), jnp.float32), 6, 4, -12, relu=True)
            cvp = build_cost_volume_packed(lfcv, rfcv, -12, 12, 4)
            want = jnp.maximum(conv3d_packed_r4(cvp, kcv, 4, 6), 0)
            check("cv", got, want)

        run("cost-volume conv", fcv)

    if "wconv" not in skip:
        from disprcnn_tpu.ops.conv3d_packed import pack_kernel_w
        from disprcnn_tpu.ops.pallas import packed_conv as _pc5
        wpacked_conv_bn = _maybe_interpret(_pc5.wpacked_conv_bn)

        from disprcnn_tpu.ops.conv3d_packed import conv2d_wpacked

        kw = put(r.normal(size=(3, 3, 32, 32)) * 0.1)
        xw = put(r.normal(size=(32, 112, 28, 128)))

        def fw():
            got = wpacked_conv_bn(
                xw, pack_kernel_w(kw, 4),
                put(np.ones(128), jnp.float32),
                put(np.zeros(128), jnp.float32), 4, relu=True)
            want = jnp.maximum(conv2d_wpacked(xw, kw, 4), 0)
            check("wconv", got, want)

        run("wpacked conv", fw)

    if "sa" not in skip:
        from disprcnn_tpu.ops.pallas import sa_fused as _sf
        sa_ball_mlp_max = _maybe_interpret(_sf.sa_ball_mlp_max)

        ws = tuple(
            (put(r.normal(size=(128, 128)) * 0.1, jnp.float32),
             put(np.zeros(128), jnp.float32))
            for _ in range(2)
        )
        sa_args = (
            put(r.normal(size=(256, 512, 3)) * 2, jnp.float32),
            put(r.normal(size=(256, 128, 3)) * 2, jnp.float32),
            put(r.normal(size=(256, 512, 128))),
            put(r.normal(size=(3, 128)) * 0.1, jnp.float32),
            put(np.ones(128), jnp.float32), put(np.zeros(128), jnp.float32),
            ws, 1.5, 64,
        )
        run("sa mega-kernel (256x128x64, N=512)", lambda: float(jnp.sum(
            sa_ball_mlp_max(*sa_args).astype(jnp.float32))))

        def fsa_variants():
            import os as _os

            want = sa_ball_mlp_max(*sa_args)
            saved = {k: _os.environ.get(k)
                     for k in ("DISPRCNN_SA_RANKS", "DISPRCNN_SA_VT",
                               "DISPRCNN_SA_ROWS", "DISPRCNN_SA_GATHER",
                               "DISPRCNN_SA_XFOLD")}
            try:
                # want = shipped default (xfold+cumsum since r4h); every
                # legacy arm must stay bit-identical to it
                _os.environ["DISPRCNN_SA_XFOLD"] = "0"
                _os.environ["DISPRCNN_SA_RANKS"] = "cumsum"
                _os.environ["DISPRCNN_SA_VT"] = "fold"
                got = sa_ball_mlp_max(*sa_args)
                # bit-identical by construction (exact integer ranks,
                # exact one-hot selection)
                check("sa variants(cumsum+fold)", got, want, tol=1e-9)
                _os.environ["DISPRCNN_SA_ROWS"] = "4"
                got_r = sa_ball_mlp_max(*sa_args)
                check("sa variants(rows4+cumsum+fold)", got_r, want,
                      tol=1e-9)
                for k in ("DISPRCNN_SA_RANKS", "DISPRCNN_SA_VT",
                          "DISPRCNN_SA_ROWS"):
                    _os.environ.pop(k, None)
                # gather/bisect modes retired: Mosaic's dynamic_gather
                # rejects >1 source vreg along the gather dim (r4g queue)
                _os.environ["DISPRCNN_SA_RANKS"] = "tri"
                got_x = sa_ball_mlp_max(*sa_args)
                check("sa variants(legacy tri+twodot)", got_x, want,
                      tol=1e-9)
                _os.environ.pop("DISPRCNN_SA_XFOLD", None)
                _os.environ.pop("DISPRCNN_SA_RANKS", None)
                # r5 vsep (shipped default): VMEM-concatenated xfold
                # operand vs the XLA-side HBM concat — bit-identical
                _os.environ["DISPRCNN_SA_VSEP"] = "0"
                got_v = sa_ball_mlp_max(*sa_args)
                check("sa variants(xla-concat vs vsep default)", got_v,
                      want, tol=1e-9)
                _os.environ.pop("DISPRCNN_SA_VSEP", None)
                # r5 lanes kernel RETIRED from the on-chip matrix
                # (2026-08-20 r5a queue): lane-axis dynamic_gather IS
                # supported (<=128-lane tables, probe_lanes_gather all
                # green) but the chunked-gather SA formulation measured
                # 22.29 ms vs the one-hot dot's 21.79 at the SA0 reference
                # geometry AND carried 1.95e-02 of on-chip parity error
                # (Mosaic excess-precision elision of in-kernel bf16
                # round-trips, same mechanism as the roipool split bug).
                # No win even if fixed -> negative result; code stays
                # env-gated with interpret-mode parity tests.
            finally:
                for k, v_ in saved.items():
                    if v_ is None:
                        _os.environ.pop(k, None)
                    else:
                        _os.environ[k] = v_
            return float(jnp.sum(got.astype(jnp.float32)))

        run("sa variants cumsum+fold vs default", fsa_variants)

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

        import os

        boxes = np.tile(np.array([[0.0, 1, 0, 2, 3, 3, 0.4]], np.float32),
                        (16, 16, 1))
        rp_pts = put(r.uniform(-4, 4, (16, 768, 3)), jnp.float32)
        rp_f = put(r.normal(size=(16, 768, 130)), jnp.float32)
        rp_b = put(boxes, jnp.float32)

        def frp():
            from disprcnn_tpu.ops.roipool3d import roipool3d

            got, ge = roipool3d_fused(rp_pts, rp_f, rp_b, 512)
            os.environ["DISPRCNN_PALLAS_DISABLE"] = "roipool"
            try:
                want, we = roipool3d(rp_pts, rp_f, rp_b, sampled_pts_num=512)
            finally:
                os.environ["DISPRCNN_PALLAS_DISABLE"] = ""
            np.testing.assert_array_equal(np.asarray(ge), np.asarray(we))
            check("roipool3d", got, want, tol=1e-3)

        run("roipool3d fused (16x16x768, S=512)", frp)

    if "softargmin" not in skip:
        from disprcnn_tpu.ops.pallas import softargmin as _sam
        fused_softargmin = _maybe_interpret(_sam.fused_softargmin)

        def fsam():
            # production PSMNet head geometry: (R, 56, 56, 24) -> 224^2
            c = put(r.normal(size=(16, 56, 56, 24)), jnp.float32)
            got = fused_softargmin(c, (224, 224), -48, 48)
            from disprcnn_tpu.ops.pallas.softargmin import interp_matrix

            md = interp_matrix(24, 96)
            mh = interp_matrix(56, 224)
            mw = interp_matrix(56, 224)
            y = jnp.einsum("bhwd,ed->bhwe", c, md)
            y = jnp.einsum("bhwd,eh->bewd", y, mh)
            y = jnp.einsum("bhwd,ew->bhed", y, mw)
            p_ = jax.nn.softmax(y, axis=-1)
            disp = jnp.arange(-48, 48, dtype=p_.dtype)
            want = jnp.einsum("bhwd,d->bhw", p_, disp)
            check("softargmin", got, want)

        run("softargmin 16x224^2 D96", fsam)

    if "topk" not in skip:
        from disprcnn_tpu.ops.topk_select import topk_threshold

        import jax as _jx

        s = put(r.uniform(0, 1, (4, 119000)), jnp.float32)

        def ftk():
            gv, gi = topk_threshold(s, 6000)
            wv, wi = _jx.lax.top_k(s, 6000)
            np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
            np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))
            print("    exact match vs lax.top_k", flush=True)

        run("topk threshold 6000-of-119k", ftk)

    print(f"\n{'ALL OK' if not FAILED else 'FAILED: ' + ','.join(FAILED)}",
          flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
