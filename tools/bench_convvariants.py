"""Where does the packed trunk conv's time go? Variants at the trunk
geometry: window build alone, conv alone at 192/256/128 input channels,
and the fused win+conv (the production form).

Usage: python tools/bench_convvariants.py
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

    from disprcnn_tpu.ops.conv3d_packed import (
        _shift_groups, conv3d_packed_r4, pack_kernel,
    )
    from disprcnn_tpu.utils.benchmarking import device_timeit

    n, h, w, ci, co, g, dg = 96, 56, 56, 32, 32, 4, 6
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    x4 = jax.device_put(
        jnp.asarray(rng.standard_normal((n, h, w, g * ci)), jnp.bfloat16), dev)
    kern = jax.device_put(
        jnp.asarray(rng.standard_normal((3, 3, 3, ci, co)) * 0.05, jnp.bfloat16), dev)

    def win_only(a):
        return jnp.concatenate(
            [_shift_groups(a, dg, ci, -1), a, _shift_groups(a, dg, ci, +1)], -1)

    def conv_at(cin, cout=g * co):
        k2 = jax.device_put(jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.bfloat16), dev)
        xin = jax.device_put(jnp.asarray(
            rng.standard_normal((n, h, w, cin)), jnp.bfloat16), dev)

        def f(a, k):
            return jax.lax.conv_general_dilated(
                a, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ms = device_timeit(jax.jit(f), xin, k2)
        gflop = n * h * w * 9 * cin * cout * 2 / 1e9
        print(f"conv {cin:4d}->{cout}: {ms:7.3f} ms  {gflop:7.1f} GFLOP "
              f"-> {gflop / ms:6.1f} TFLOP/s", flush=True)

    ms = device_timeit(jax.jit(win_only), x4)
    print(f"window build alone: {ms:7.3f} ms", flush=True)
    ms = device_timeit(jax.jit(
        lambda a, k: conv3d_packed_r4(a, k, g, dg)), x4, kern)
    print(f"win+banded conv (production): {ms:7.3f} ms", flush=True)
    conv_at(192)
    conv_at(256)
    conv_at(128)
    conv_at(384)
    # matmul equivalent of the 192ch conv: im2col contraction as pure dot
    a = jax.device_put(jnp.asarray(
        rng.standard_normal((n * h * w, 9 * 192)), jnp.bfloat16), dev)
    b = jax.device_put(jnp.asarray(
        rng.standard_normal((9 * 192, 128)) * 0.05, jnp.bfloat16), dev)
    f = jax.jit(lambda a, b: a @ b)
    ms = device_timeit(f, a, b)
    gflop = a.shape[0] * a.shape[1] * b.shape[1] * 2 / 1e9
    print(f"im2col matmul {a.shape}x{b.shape}: {ms:7.3f} ms  {gflop:7.1f} GFLOP "
          f"-> {gflop / ms:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
