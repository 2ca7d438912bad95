"""Microbench: Pallas fused packed conv+BN+ReLU vs XLA window+conv+BN at the
PSMNet trunk geometry. Also checks numerical parity on-device.

Usage: python tools/bench_packed_conv.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.ops.conv3d_packed import conv3d_packed_r4, pack_kernel
    from disprcnn_tpu.ops.pallas.packed_conv import packed_conv_bn
    from disprcnn_tpu.utils.benchmarking import device_timeit

    n, h, w, ci, co, g = 96, 56, 56, 32, 32, 4
    dg = 6
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    x4 = jax.device_put(jnp.asarray(
        rng.standard_normal((n, h, w, g * ci)), jnp.bfloat16), dev)
    kern = jax.device_put(jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)) * 0.05, jnp.bfloat16), dev)
    mul = jax.device_put(jnp.asarray(
        rng.standard_normal(g * co) * 0.5 + 1.0, jnp.float32), dev)
    add = jax.device_put(jnp.asarray(
        rng.standard_normal(g * co) * 0.1, jnp.float32), dev)

    def xla_form(a, k, m, b):
        y = conv3d_packed_r4(a, k, g, dg)
        return jnp.maximum(y * m.astype(y.dtype) + b.astype(y.dtype), 0)

    def pallas_form(a, k, m, b):
        return packed_conv_bn(a, pack_kernel(k, g), m, b, dg, g, relu=True)

    fx = jax.jit(xla_form)
    fp = jax.jit(pallas_form)
    got_x = np.asarray(fx(x4, kern, mul, add), np.float32)
    got_p = np.asarray(fp(x4, kern, mul, add), np.float32)
    err = np.max(np.abs(got_x - got_p))
    print(f"on-device parity max err: {err:.5f} "
          f"(scale {np.abs(got_x).max():.3f})", flush=True)

    gflop = n * h * w * 9 * (g + 2) * ci * g * co * 2 / 1e9
    for name, f in (("xla win+conv+bn", fx), ("pallas fused", fp)):
        ms = device_timeit(f, x4, kern, mul, add)
        print(f"{name}: {ms:7.3f} ms  banded {gflop:.1f} GFLOP "
              f"-> {gflop / ms:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
