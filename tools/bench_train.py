"""Training-step throughput of the 2D stereo detector on one TPU chip.

The reference's headline numbers are stage TRAINING times (docs/TRAIN_VAL.md:
~1.5 h for the 2D stage / 4140 iters @ global bs 4 on 4 GPUs = ~0.77 it/s =
~3.1 imgs/s). This measures our jitted SPMD train step (fwd+bwd+SGD) at the
same per-step shapes on a single chip.

Usage: python tools/bench_train.py [--bs 4]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--hw", default="384,1248")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from disprcnn_tpu.engine.trainer import create_train_state, make_train_step
    from disprcnn_tpu.models.detector.disprcnn import DispRCNN
    from disprcnn_tpu.solver.schedules import one_cycle
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    h, w = (int(v) for v in args.hw.split(","))
    b, m = args.bs, 8
    model = DispRCNN(
        body="R-101", max_det=16, max_gt=m, detections_per_img=16,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    left = jnp.asarray(nprng.uniform(-2, 2, (b, h, w, 3)), jnp.float32)
    gt_left = jnp.tile(jnp.asarray([[[100.0, 120, 300, 300], [400, 100, 700, 280],
                                     *([[0, 0, 0, 0]] * (m - 2))]]), (b, 1, 1))
    batch = dict(
        left=left, right=left,
        gt_left=gt_left, gt_right=gt_left - jnp.asarray([40.0, 0, 40, 0]),
        gt_labels=jnp.ones((b, m), jnp.int32),
        gt_valid=jnp.tile(jnp.asarray([[True, True] + [False] * (m - 2)]), (b, 1)),
        gt_masks=jnp.full((b, m, h, w), 0.7, jnp.float32),
    )

    print("init (eval_shape + numpy fill)...", flush=True)
    shapes = jax.eval_shape(
        lambda k, bb: model.init({"params": k, "sampling": k}, train=True, **bb),
        rng, batch,
    )

    def fill(path, s):
        a = (0.05 * nprng.standard_normal(s.shape)).astype(s.dtype)
        if any("var" in str(getattr(p, "key", "")) for p in path):
            a = np.abs(a) + np.asarray(0.9, s.dtype)
        return a

    variables = jax.tree_util.tree_map_with_path(fill, shapes)
    tx = optax.chain(optax.trace(decay=0.9),
                     optax.scale_by_learning_rate(one_cycle(0.01, 1000)))
    state = create_train_state(model, tx, variables)
    step = jax.jit(make_train_step(model, tx, do_grad_clip=True, grad_clip=10.0))

    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    rng = jax.device_put(rng, dev)

    print("compile + warm...", flush=True)

    def one(state_and_key):
        st, _ = step(state_and_key[0], batch, rng)
        return st, st.step

    ms = device_timeit(lambda st: step(st, batch, rng)[1]["loss_total"], state, n=10)
    imgs_s = args.bs / (ms / 1e3)
    ref = 3.1  # imgs/s on the reference's 4-GPU recipe
    print(f"train step (bs={args.bs}, {h}x{w}): {ms:.1f} ms "
          f"-> {imgs_s:.2f} imgs/s/chip ({imgs_s / ref:.2f}x the reference's "
          f"4-GPU aggregate)")


if __name__ == "__main__":
    main()
