"""Epoch-based iDispNet trainer (reference engine/psm_trainer.py:89-424 +
tools/kitti_object/train_idispnet_fa.py — the fastai Learner/fit_one_cycle
stack becomes a plain functional trainer class).

Used by tools/train_idispnet.py; exposed as a class for API parity
(`fit`, `train_epoch`, `validate`, `get_preds`).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.psmnet.psmnet import PSMNet
from ..ops.losses import masked_epe
from ..solver.schedules import one_cycle
from ..utils.checkpoint import Checkpointer
from ..utils.logging import setup_logger


class PSMTrainer:
    def __init__(
        self,
        maxdisp: int = 48,
        mindisp: int = -48,
        roi_size: int = 224,
        lr: float = 1e-3,
        epochs: int = 100,
        batch_size: int = 12,
        output_dir: str = "models/idispnet",
    ):
        self.maxdisp, self.mindisp = maxdisp, mindisp
        self.roi_size = roi_size
        self.epochs, self.bs = epochs, batch_size
        self.logger = setup_logger("psm_trainer", output_dir)
        self.ckpt = Checkpointer(f"{output_dir}/ckpt")
        self.model = PSMNet(maxdisp=maxdisp, mindisp=mindisp)
        z = jnp.zeros((1, roi_size, roi_size, 3))
        variables = self.model.init({"params": jax.random.PRNGKey(0)}, z, z, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.lr = lr
        self._train_step = None
        self._val_step = None

    def _build_steps(self, steps_per_epoch: int):
        tx = optax.adam(one_cycle(self.lr, self.epochs * steps_per_epoch))
        self.opt_state = tx.init(self.params)
        model, maxd, mind = self.model, self.maxdisp, self.mindisp

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                (p1, p2, p3), new_vars = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["left"], batch["right"], train=True, mutable=["batch_stats"],
                )
                m = batch["mask"] * (batch["disparity"] > mind) * (batch["disparity"] < maxd)
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
            return pred, masked_epe(pred, batch["disparity"], batch["mask"])

        self._train_step, self._val_step = train_step, val_step

    def fit(self, train_ds, val_ds, collate: Callable) -> float:
        steps = max(len(train_ds) // self.bs, 1)
        self._build_steps(steps)
        best = float("inf")
        for epoch in range(self.epochs):
            t0 = time.perf_counter()
            loss = self.train_epoch(train_ds, collate, epoch, steps)
            epe = self.validate(val_ds, collate)
            self.logger.info(
                f"epoch {epoch}: loss {loss:.4f} EPE {epe:.4f} "
                f"({time.perf_counter() - t0:.1f}s)"
            )
            if epe < best:
                best = epe
                self.ckpt.save(epoch, {"params": self.params, "batch_stats": self.batch_stats})
        return best

    def train_epoch(self, ds, collate, epoch: int, steps: int) -> float:
        order = np.random.default_rng(epoch).permutation(len(ds))
        losses = []
        for i in range(steps):
            idxs = order[i * self.bs : (i + 1) * self.bs]
            batch = {k: jnp.asarray(v) for k, v in collate([ds[int(j)] for j in idxs]).items()}
            self.params, self.batch_stats, self.opt_state, loss = self._train_step(
                self.params, self.batch_stats, self.opt_state, batch
            )
            losses.append(float(loss))
        return float(np.mean(losses))

    def validate(self, ds, collate) -> float:
        epes = []
        for i in range(0, len(ds) - self.bs + 1, self.bs):
            batch = {
                k: jnp.asarray(v)
                for k, v in collate([ds[j] for j in range(i, i + self.bs)]).items()
            }
            _, epe = self._val_step(self.params, self.batch_stats, batch)
            epes.append(float(epe))
        return float(np.mean(epes)) if epes else float("nan")

    def get_preds(self, ds, collate) -> np.ndarray:
        preds = []
        for i in range(0, len(ds) - self.bs + 1, self.bs):
            batch = {
                k: jnp.asarray(v)
                for k, v in collate([ds[j] for j in range(i, i + self.bs)]).items()
            }
            pred, _ = self._val_step(self.params, self.batch_stats, batch)
            preds.append(np.asarray(pred))
        return np.concatenate(preds) if preds else np.zeros((0,))
