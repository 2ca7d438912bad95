"""Optimizer construction (reference solver/build.py:10-57), optax-native.

Per-parameter groups become optax masks:
- bias params: lr x BIAS_LR_FACTOR, weight decay WEIGHT_DECAY_BIAS,
- everything else: BASE_LR + WEIGHT_DECAY,
- frozen subtrees (SOLVER.FIX_* / freeze_at): zero updates via optax.masked.
Learned uncertainty loss weights (UNCERT_LOSS_WEIGHT) are a separate
parameter vector handled by the engine.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def _is_bias(path) -> bool:
    last = path[-1]
    name = getattr(last, "key", None) or getattr(last, "name", "")
    return name == "bias"


FIX_FLAG_PREFIXES = {
    "FIX_BACKBONE": ("backbone",),
    "FIX_RPN": ("rpn_head",),
    "FIX_BOX_HEAD": ("box_extractor", "box_predictor"),
    "FIX_MASK_HEAD": ("mask_head",),
    "FIX_SHAPE_HEAD": ("shape_head",),
    "FIX_DISPARITY": ("idispnet",),
    "FIX_POINTRCNN_RPN": ("pointrcnn.rpn",),
    "FIX_POINTCLOUD": ("pointrcnn",),
}


def frozen_path_prefixes(cfg) -> tuple[str, ...]:
    """Dotted top-level module prefixes to freeze, from SOLVER.FIX_* flags
    (reference utils/fix_model.py:6-40)."""
    out = []
    for flag, prefixes in FIX_FLAG_PREFIXES.items():
        if getattr(cfg.SOLVER, flag, False):
            out.extend(prefixes)
    return tuple(out)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", None) or getattr(p, "name", p)))
    return ".".join(parts)


def make_optimizer(
    cfg,
    params,
    schedule: Callable,
    frozen_prefixes: tuple[str, ...] = (),
    momentum_schedule: Optional[Callable] = None,
):
    """-> optax.GradientTransformation implementing the reference's groups.

    `momentum_schedule` cycles SGD momentum inversely to the OneCycle LR
    (reference lr_scheduler.py:218-227, cycle_momentum=True for every shipped
    config); pass schedules.make_momentum_schedule(cfg).
    """
    s = cfg.SOLVER
    bias_mask = jax.tree_util.tree_map_with_path(lambda p, _: _is_bias(p), params)
    nonbias_mask = jax.tree_util.tree_map(lambda b: not b, bias_mask)

    def wd(amount, mask):
        if amount == 0:
            return optax.identity()
        return optax.masked(optax.add_decayed_weights(amount), mask)

    if s.OPTIMIZER == "SGD":
        if momentum_schedule is not None:
            core = optax.inject_hyperparams(optax.trace)(decay=momentum_schedule)
        else:
            core = optax.trace(decay=s.MOMENTUM)
    elif s.OPTIMIZER == "Adam":
        if momentum_schedule is not None:
            core = optax.inject_hyperparams(optax.scale_by_adam)(b1=momentum_schedule)
        else:
            core = optax.scale_by_adam()
    else:
        raise NotImplementedError(s.OPTIMIZER)

    bias_factor = float(s.BIAS_LR_FACTOR)

    tx = optax.chain(
        wd(s.WEIGHT_DECAY, nonbias_mask),
        wd(s.WEIGHT_DECAY_BIAS, bias_mask),
        core,
        optax.scale_by_learning_rate(schedule),
        # per-group lr factor for biases
        optax.multi_transform(
            {
                "bias": optax.scale(bias_factor),
                "base": optax.identity(),
            },
            param_labels=jax.tree_util.tree_map(
                lambda b: "bias" if b else "base", bias_mask
            ),
        ),
    )
    if frozen_prefixes:
        train_mask = jax.tree_util.tree_map_with_path(
            lambda p, _: not any(
                _path_str(p).startswith(pref) for pref in frozen_prefixes
            ),
            params,
        )
        tx = optax.chain(
            optax.masked(tx, train_mask),
            optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda m: not m, train_mask)),
        )
    return tx
