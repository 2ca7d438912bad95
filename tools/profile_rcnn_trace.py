"""Per-HLO-op trace of RCNNNet at the production eval geometry.

Builds RCNNNet standalone with synthetic params on the (256, 512, 133)
input (16 pairs x 16 proposals, 512 sampled points, 5 + 128 channels) and
prints the device-op duration report (tools/trace_report.py).

Usage: python tools/profile_rcnn_trace.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=256,
                    help="total rois (reference budget: 1600 = 16 x 100)")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from disprcnn_tpu.models.pointrcnn import rcnn3d
    from tools.trace_report import capture, report

    # name matches profile_stage3's so the persistent compile cache is shared
    rc = rcnn3d.RCNNNet(dtype=jnp.bfloat16, name="rcnn")
    b, n, c = args.rois, 512, 133
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k, a: rc.init(k, a), jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda s: jnp.asarray(0.05 * rng.standard_normal(s.shape), s.dtype), shapes
    )
    dev = jax.devices()[0]
    v, x = jax.device_put((v, x), dev)
    f = jax.jit(lambda v, p: rc.apply(v, p, train=False))
    capture(f, v, x, trace_dir="/tmp/rcnn_trace", iters=5)
    report("/tmp/rcnn_trace", top=35)


if __name__ == "__main__":
    main()
