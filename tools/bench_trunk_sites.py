"""Per-site microbench of every PSMNet trunk conv at its exact eval geometry.

The segment profiler (profile_psmnet.py --segments) attributes latency to
tower/dres/hg/classif; this tool goes one level deeper: each of the ~11
distinct conv sites (16 ROIs, 56^2 quarter-res, D=24, G=4, dg=6, bf16) is
timed standalone — the currently-engaged path (marked *) AND its alternative
(Pallas fused vs XLA windowed) where both exist. Reference workload:
modeling/psmnet/stackhourglass.py:54-174.

Usage: python tools/bench_trunk_sites.py [--sites substr,substr]
       python tools/bench_trunk_sites.py --interpret   # CPU shape check only
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    interp = "--interpret" in sys.argv
    import jax

    if interp:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.ops.conv3d_packed import (
        conv3d_packed_r4,
        conv3d_packed_strided_r4,
        conv3d_packed_transposed_r4,
        pack_kernel,
        pack_kernel_strided,
        pack_kernel_transposed,
    )
    from disprcnn_tpu.ops.pallas.packed_conv import (
        cost_volume_conv_bn,
        packed_conv_bn,
        packed_conv_bn_s2,
        packed_deconv_bn,
    )
    from disprcnn_tpu.utils.benchmarking import device_timeit

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    def t(shape, scale=1.0, dtype=jnp.bfloat16):
        return jax.device_put(
            jnp.asarray(rng.standard_normal(shape) * scale, dtype), dev)

    B, H, W = 16, 56, 56
    G, DG = 4, 6
    N = B * DG  # 96 packed rows

    def affine(y, mul, add):
        return y * mul.astype(y.dtype) + add.astype(y.dtype)

    lf, rf = t((B, H, W, 32)), t((B, H, W, 32))
    x_full = t((N, H, W, 128))
    x_half = t((N, 28, 28, 128))
    x_quart = t((N, 14, 14, 64))
    x_rep = t((B, H, W, 24 * 32))
    res_half = t((N, 28, 28, 128))
    res_full = t((N, H, W, 128))
    kcv = t((3, 3, 3, 64, 32), 0.05)
    k32 = t((3, 3, 3, 32, 32), 0.05)
    k64 = t((3, 3, 3, 64, 64), 0.05)
    k_dc1 = t((3, 3, 3, 64, 32), 0.05)
    k_cl1 = t((3, 3, 3, 32, 1), 0.05)
    m128, a128 = t((128,), 0.5, jnp.float32), t((128,), 0.1, jnp.float32)
    m64, a64 = t((64,), 0.5, jnp.float32), t((64,), 0.1, jnp.float32)

    gflop_s1_full = N * H * W * 9 * (G + 2) * 32 * G * 32 * 2 / 1e9
    gflop_s2a = N * 28 * 28 * 9 * (G + 1) * 32 * (G // 2) * 64 * 2 / 1e9
    gflop_s1_half = N * 28 * 28 * 9 * 4 * 64 * 2 * 64 * 2 / 1e9
    gflop_s2c = N * 14 * 14 * 9 * 3 * 64 * 1 * 64 * 2 / 1e9
    gflop_dc0 = N * 14 * 14 * 9 * 2 * 64 * 2 * 64 * 2 / 1e9
    gflop_dc1 = N * 28 * 28 * 9 * 3 * 64 * 4 * 32 * 2 / 1e9
    gflop_cl1 = B * H * W * 9 * 26 * 32 * 24 * 1 * 2 / 1e9

    # name -> (count_in_model, banded_gflop, [(path, fn, args), ...])
    # first path listed = the one the model currently engages (marked *)
    sites = {
        "cv_conv(dres0_0)": (1, 2 * gflop_s1_full, [
            ("pallas(cv)",
             lambda a, b, wa, wb, m, ad: cost_volume_conv_bn(
                 a, b, wa, wb, m, ad, DG, G, -12, relu=True, interpret=interp),
             (lf, rf, pack_kernel(kcv[:, :, :, :32, :], G),
              pack_kernel(kcv[:, :, :, 32:, :], G), m128, a128)),
        ]),
        "dres_s1": (3, gflop_s1_full, [
            ("pallas",
             lambda a, w, m, ad: packed_conv_bn(a, w, m, ad, DG, G, relu=True, interpret=interp),
             (x_full, pack_kernel(k32, G), m128, a128)),
            ("xla",
             lambda a, k, m, ad: jnp.maximum(
                 affine(conv3d_packed_r4(a, k, G, DG), m, ad), 0),
             (x_full, k32, m128, a128)),
        ]),
        "hg_s2_a(ConvBN_0)": (3, gflop_s2a, [
            ("xla",
             lambda a, k, m, ad: jnp.maximum(
                 affine(conv3d_packed_strided_r4(a, k, G, DG), m, ad), 0),
             (x_full, t((3, 3, 3, 32, 64), 0.05), m128, a128)),
            ("pallas",
             lambda a, w, m, ad: packed_conv_bn_s2(
                 a, w, m, ad, DG, G, relu=True, rows=2, interpret=interp),
             (x_full, pack_kernel_strided(t((3, 3, 3, 32, 64), 0.05), G),
              m128, a128)),
        ]),
        "hg_s1_b(ConvBN_1)": (3, gflop_s1_half, [
            ("pallas",
             lambda a, w, m, ad: packed_conv_bn(
                 a, w, m, ad, DG, 2, relu=True, rows=2, interpret=interp),
             (x_half, pack_kernel(k64, 2), m128, a128)),
            ("xla",
             lambda a, k, m, ad: jnp.maximum(
                 affine(conv3d_packed_r4(a, k, 2, DG), m, ad), 0),
             (x_half, k64, m128, a128)),
        ]),
        "hg_s2_c(ConvBN_2)": (3, gflop_s2c, [
            ("xla",
             lambda a, k, m, ad: jnp.maximum(
                 affine(conv3d_packed_strided_r4(a, k, 2, DG), m, ad), 0),
             (x_half, k64, m64, a64)),
            ("pallas",
             lambda a, w, m, ad: packed_conv_bn_s2(
                 a, w, m, ad, DG, 2, relu=True, rows=8, interpret=interp),
             (x_half, pack_kernel_strided(k64, 2), m64, a64)),
        ]),
        "hg_s1_d(ConvBN_3)": (3, gflop_s2c, [
            ("pallas",
             lambda a, w, m, ad: packed_conv_bn(
                 a, w, m, ad, DG, 1, relu=True, rows=8, interpret=interp),
             (x_quart, pack_kernel(k64, 1), m64, a64)),
            ("xla",
             lambda a, k, m, ad: jnp.maximum(
                 affine(conv3d_packed_r4(a, k, 1, DG), m, ad), 0),
             (x_quart, k64, m64, a64)),
        ]),
        "hg_deconv0": (3, gflop_dc0, [
            ("pallas",
             lambda a, r, w, m, ad: packed_deconv_bn(
                 a, w, m, ad, DG, 1, relu=True, residual=r, rows=8, interpret=interp),
             (x_quart, res_half, pack_kernel_transposed(k64, 1), m128, a128)),
            ("xla",
             lambda a, r, k, m, ad: jnp.maximum(
                 affine(conv3d_packed_transposed_r4(a, k, 1, DG), m, ad) + r,
                 0),
             (x_quart, res_half, k64, m128, a128)),
        ]),
        "hg_deconv1": (3, gflop_dc1, [
            ("pallas",
             lambda a, r, w, m, ad: packed_deconv_bn(
                 a, w, m, ad, DG, 2, relu=False, residual=r, rows=2, interpret=interp),
             (x_half, res_full, pack_kernel_transposed(k_dc1, 2), m128, a128)),
            ("xla",
             lambda a, r, k, m, ad: affine(
                 conv3d_packed_transposed_r4(a, k, 2, DG), m, ad) + r,
             (x_half, res_full, k_dc1, m128, a128)),
        ]),
        "classif_0(repack)": (3, gflop_s1_full, [
            ("pallas(repack)",
             lambda a, w, m, ad: packed_conv_bn(
                 a, w, m, ad, DG, G, relu=True, rows=1, out_repack=True, interpret=interp),
             (x_full, pack_kernel(k32, G), m128, a128)),
            ("pallas(norepack)",
             lambda a, w, m, ad: packed_conv_bn(a, w, m, ad, DG, G, relu=True, interpret=interp),
             (x_full, pack_kernel(k32, G), m128, a128)),
        ]),
        "classif_1(G24)": (3, gflop_cl1, [
            ("xla",
             lambda a, k: conv3d_packed_r4(a, k, 24, 1),
             (x_rep, k_cl1)),
            ("pallas(dg1)",
             lambda a, w, m, ad: packed_conv_bn(
                 a, w, m, ad, 1, 24, relu=False, interpret=interp),
             (x_rep, pack_kernel(k_cl1, 24), t((24,), 0.5, jnp.float32),
              t((24,), 0.1, jnp.float32))),
        ]),
    }

    only = None
    for i, a in enumerate(sys.argv):
        if a == "--sites":
            only = sys.argv[i + 1].split(",")

    total_engaged = 0.0
    print(f"{'site':22s} {'xN':>3s} {'path':>17s} {'ms':>8s} {'TFLOP/s':>8s}",
          flush=True)
    for name, (count, gflop, paths) in sites.items():
        if only and not any(s in name for s in only):
            continue
        for j, (pname, fn, args) in enumerate(paths):
            if interp:
                out = jax.jit(fn)(*args)
                shp = [getattr(l, "shape", None) for l in jax.tree.leaves(out)]
                print(f"{name:22s} {count:3d} {pname:>17s} OK {shp}",
                      flush=True)
                continue
            ms = device_timeit(fn, *args)
            tfs = gflop / ms if ms else 0.0
            mark = "*" if j == 0 else " "
            print(f"{name:22s} {count:3d} {pname:>17s} {ms:8.3f} "
                  f"{tfs:8.1f}{mark}", flush=True)
            if j == 0:
                total_engaged += ms * count
    print(f"\nsum over engaged paths (x count): {total_engaged:.2f} ms "
          f"(segments dres+hg+classif measured ~19.96 ms)")


if __name__ == "__main__":
    main()
