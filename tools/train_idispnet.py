"""Standalone iDispNet trainer (epoch-based; replaces the reference's fastai
fit_one_cycle wrapper, tools/kitti_object/train_idispnet_fa.py:21-90).

Adam + OneCycle over epochs, deep-supervised masked smooth-L1 (PSMLoss),
EPE validation, best-model checkpointing.

Usage: python tools/train_idispnet.py --data-dir DIR [--synthetic N]
       [--epochs 100] [--bs 12] [--maxdisp 48] [--mindisp -48]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--bs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--maxdisp", type=int, default=48)
    p.add_argument("--mindisp", type=int, default=-48)
    p.add_argument("--roi-size", type=int, default=224)
    p.add_argument("--output", default="models/idispnet")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from disprcnn_tpu.data.datasets.kitti_roi import (
        KittiRoiDataset,
        SyntheticRoiDataset,
        collate_roi,
    )
    from disprcnn_tpu.models.psmnet.psmnet import PSMNet
    from disprcnn_tpu.ops.losses import masked_epe
    from disprcnn_tpu.solver.schedules import one_cycle
    from disprcnn_tpu.utils.checkpoint import Checkpointer
    from disprcnn_tpu.utils.logging import setup_logger

    logger = setup_logger("idispnet", args.output)
    if args.synthetic:
        train_ds = SyntheticRoiDataset(args.synthetic, args.roi_size, args.maxdisp)
        val_ds = SyntheticRoiDataset(max(args.synthetic // 4, 1), args.roi_size, args.maxdisp, seed=1)
    else:
        train_ds = KittiRoiDataset(args.data_dir, "train")
        val_ds = KittiRoiDataset(args.data_dir, "val")

    model = PSMNet(maxdisp=args.maxdisp, mindisp=args.mindisp)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, args.roi_size, args.roi_size, 3))
    variables = model.init({"params": rng}, z, z, train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    steps_per_epoch = max(len(train_ds) // args.bs, 1)
    tx = optax.adam(one_cycle(args.lr, args.epochs * steps_per_epoch))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def loss_fn(p):
            (p1, p2, p3), new_vars = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["left"], batch["right"], train=True, mutable=["batch_stats"],
            )
            m = batch["mask"] * (batch["disparity"] > args.mindisp) * (
                batch["disparity"] < args.maxdisp
            )
            denom = jnp.maximum(m.sum(), 1.0)

            def sl1(x):
                ax = jnp.abs(x)
                return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)

            loss = sum(
                w * (sl1(pred - batch["disparity"]) * m).sum() / denom
                for w, pred in ((0.5, p1), (0.7, p2), (1.0, p3))
            )
            return loss, new_vars["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    @jax.jit
    def val_step(params, batch_stats, batch):
        pred = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["left"], batch["right"], train=False,
        )
        return masked_epe(pred, batch["disparity"], batch["mask"])

    ckpt = Checkpointer(f"{args.output}/ckpt")
    best_epe = float("inf")
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        order = np.random.default_rng(epoch).permutation(len(train_ds))
        losses = []
        for i in range(steps_per_epoch):
            idxs = order[i * args.bs : (i + 1) * args.bs]
            batch = collate_roi([train_ds[int(j)] for j in idxs])
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch
            )
            losses.append(float(loss))
        epes = []
        for i in range(0, len(val_ds), args.bs):
            sl = [val_ds[j] for j in range(i, min(i + args.bs, len(val_ds)))]
            if len(sl) < args.bs:
                continue
            batch = {k: jnp.asarray(v) for k, v in collate_roi(sl).items()}
            epes.append(float(val_step(params, batch_stats, batch)))
        epe = float(np.mean(epes)) if epes else float("nan")
        logger.info(
            f"epoch {epoch}: loss {np.mean(losses):.4f} val EPE {epe:.4f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        if epe < best_epe:
            best_epe = epe
            ckpt.save(epoch, {"params": params, "batch_stats": batch_stats})
    logger.info(f"best EPE {best_epe:.4f}")


if __name__ == "__main__":
    main()
