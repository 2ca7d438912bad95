"""LR schedules as optax-compatible scalar functions of the step.

Reference: solver/lr_scheduler.py:65-239.
- WarmupMultiStepLR: linear (or constant) warmup over WARMUP_ITERS, then
  gamma^k decay at the milestone steps.
- OneCycleScheduler (fastai-style, used by every shipped config): cosine
  anneal lr/25 -> lr over the first 30% of steps, then lr -> lr/(25*1e4).
- ConstantScheduler.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def annealing_cos(start: float, end: float, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def warmup_multistep(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    milestones = jnp.asarray(sorted(steps))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear":
            alpha = step / max(warmup_iters, 1)
            wf = jnp.where(step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        else:  # constant
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        decay = gamma ** jnp.sum(step >= milestones)
        return base_lr * wf * decay

    return schedule


def one_cycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float | None = None,
):
    start_lr = max_lr / div_factor
    if final_div_factor is None:
        final_div_factor = div_factor * 1e4
    end_lr = max_lr / final_div_factor
    step_up = float(total_steps * pct_start)
    step_down = float(total_steps - step_up)

    def schedule(step):
        it = jnp.asarray(step, jnp.float32) + 1.0
        up = annealing_cos(start_lr, max_lr, it / step_up)
        down = annealing_cos(max_lr, end_lr, (it - step_up) / step_down)
        return jnp.where(it / total_steps <= pct_start, up, down)

    return schedule


def one_cycle_momentum(
    total_steps: int,
    pct_start: float = 0.3,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
):
    """Momentum cycled inversely to the OneCycle LR (lr_scheduler.py:125-132,
    218-227): max -> base over the ramp-up, base -> max over the anneal."""
    step_up = float(total_steps * pct_start)
    step_down = float(total_steps - step_up)

    def schedule(step):
        it = jnp.asarray(step, jnp.float32) + 1.0
        up = annealing_cos(max_momentum, base_momentum, it / step_up)
        down = annealing_cos(base_momentum, max_momentum, (it - step_up) / step_down)
        return jnp.where(it / total_steps <= pct_start, up, down)

    return schedule


def constant(base_lr: float):
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def make_schedule(cfg):
    s = cfg.SOLVER
    if s.SCHEDULER == "WarmupMultiStepLR":
        return warmup_multistep(
            s.BASE_LR, s.STEPS, s.GAMMA, s.WARMUP_FACTOR, s.WARMUP_ITERS, s.WARMUP_METHOD
        )
    if s.SCHEDULER == "OneCycleScheduler":
        return one_cycle(s.BASE_LR, s.MAX_ITER)
    if s.SCHEDULER == "ConstantScheduler":
        return constant(s.BASE_LR)
    raise NotImplementedError(s.SCHEDULER)


def make_momentum_schedule(cfg):
    """None unless OneCycle (which cycles momentum by default in the
    reference, cycle_momentum=True at lr_scheduler.py:131)."""
    s = cfg.SOLVER
    if s.SCHEDULER == "OneCycleScheduler":
        return one_cycle_momentum(s.MAX_ITER)
    return None
