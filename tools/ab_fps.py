"""A/B DISPRCNN_FPS_ROWS at the RCNN SA0 FPS geometry (1600 clouds of
512 points -> 128 centers): the npoint loop is the sequential depth, so
rows/step trades VPU width for chain length.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from disprcnn_tpu.ops.pallas.fps import furthest_point_sample_pallas
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    r = np.random.default_rng(0)
    xyz = jax.device_put(jnp.asarray(
        r.normal(size=(1600, 512, 3)) * 2, jnp.float32), dev)
    want = None
    for rows in ("64", "128", "256", "512"):
        os.environ["DISPRCNN_FPS_ROWS"] = rows
        f = jax.jit(lambda x, _r=rows: furthest_point_sample_pallas(x, 128))
        try:
            got = np.asarray(f(xyz))
            if want is None:
                want = got
            ok = "EXACT" if np.array_equal(got, want) else "MISMATCH"
            t = device_timeit(f, xyz)
            print(f"rows={rows:>4}: {t:6.2f} ms  parity={ok}", flush=True)
        except Exception:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            print(f"rows={rows:>4}: FAILED", flush=True)
    os.environ.pop("DISPRCNN_FPS_ROWS", None)


if __name__ == "__main__":
    main()
