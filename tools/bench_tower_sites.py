"""Per-site microbench of the PSMNet feature-tower 2D convs.

The tower (FeatureExtraction, submodule.py:234-313) is ~8.7 ms of the
28.7 ms PSMNet stage at 16x224^2 ROIs (32 images through the siamese
tower). Its C=32 / C=64 sections currently run W-PACKED through the XLA
banded form (conv2d_wpacked: (G+2)/3 FLOP tax, 128 lanes) because plain
NHWC convs at Co=32/64 fill only 32/64 of the MXU's 128 output lanes.
This times both forms per section at the exact production geometry so the
layout choice is measured, not assumed (the round-3 'wconv' family A/B only
compared Pallas-vs-XLA *within* the packed layout).

Usage: python tools/bench_tower_sites.py [--batch 32]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)  # 16 ROIs x 2 views
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.ops.conv3d_packed import conv2d_wpacked, wpack
    from disprcnn_tpu.utils.benchmarking import device_timeit

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    b = args.batch

    def t(shape, scale=1.0, dtype=jnp.bfloat16):
        return jax.device_put(
            jnp.asarray(rng.standard_normal(shape) * scale, dtype), dev)

    def plain(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # (name, count_in_model, H, W, C, wp)
    sites = [
        ("stem_conv23 (112^2 c32)", 2, 112, 112, 32, 4),
        ("layer1 (112^2 c32)", 6, 112, 112, 32, 4),
        ("layer2_rest (56^2 c64)", 30, 56, 56, 64, 2),
        ("layer3/4 (56^2 c128)", 12, 56, 56, 128, 0),
    ]
    tot_packed = tot_plain = 0.0
    print(f"{'site':26s} {'xN':>3s} {'packed':>8s} {'plain':>8s} "
          f"{'TF/s(true)':>18s}")
    for name, count, h, w, c, wp in sites:
        x = t((b, h, w, c))
        k = t((3, 3, c, c), 0.05)
        gflop = b * h * w * 9 * c * c * 2 / 1e9
        if args.interpret:
            if wp:
                o1 = jax.jit(lambda a, kk: conv2d_wpacked(
                    wpack(a, wp), kk, wp))(x, k)
            o2 = jax.jit(plain)(x, k)
            print(name, "OK", o2.shape)
            continue
        if wp:
            xp = jax.device_put(wpack(x, wp), dev)
            ms_p = device_timeit(
                lambda a, kk: conv2d_wpacked(a, kk, wp), xp, k)
        else:
            ms_p = float("nan")
        ms_x = device_timeit(plain, x, k)
        tfp = gflop / ms_p if ms_p == ms_p else float("nan")
        tfx = gflop / ms_x
        print(f"{name:26s} {count:3d} {ms_p:8.3f} {ms_x:8.3f} "
              f"{tfp:8.1f} {tfx:8.1f}")
        if ms_p == ms_p:
            tot_packed += ms_p * count
        else:
            tot_packed += ms_x * count
        tot_plain += ms_x * count
    print(f"\nsum x count: packed-where-packed {tot_packed:.2f} ms, "
          f"all-plain {tot_plain:.2f} ms")


if __name__ == "__main__":
    main()
