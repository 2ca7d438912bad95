"""Training engine: functional train state + jitted SPMD train step.

Reference: engine/trainer.py:54-200. The per-iteration loop (loss sum or
learned-uncertainty weighting, grad clip, scheduler step, loss-dict reduce)
becomes one jitted function over the device mesh; gradient all-reduce is
inserted by XLA (batch sharded on 'data', params replicated). The reference's
exception-swallowing ALLOW_EXCEPTION has no analogue — fixed shapes make the
empty-ROI EOFError path structurally impossible; invalid instances are masked.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..solver.build import _path_str


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    frozen: Any  # FrozenBatchNorm constants (never updated)
    batch_stats: Any  # trainable-BN running stats
    opt_state: Any
    uncert: Optional[jnp.ndarray] = None  # learned uncertainty loss weights
    uncert_opt_state: Any = None  # optimizer state for the uncert vector


def total_loss(losses: Dict[str, jnp.ndarray], uncert: Optional[jnp.ndarray]):
    """Sum, or uncertainty weighting: sum(u) + sum(l_i * exp(-u_i))
    (reference trainer.py:44-51)."""
    vals = [v for k, v in sorted(losses.items())]
    if uncert is None:
        return sum(vals)
    stacked = jnp.stack(vals)
    return jnp.sum(uncert) + jnp.sum(stacked * jnp.exp(-uncert[: len(vals)]))


def stop_grad_by_prefix(params, prefixes: tuple):
    """stop_gradient every param whose dotted path starts with a frozen
    prefix (SOLVER.FIX_*). optax.masked already zeroes their *updates*; this
    additionally keeps their *tangents* symbolically zero so autodiff never
    traces a backward pass through the frozen branch — the reference gets
    this for free from requires_grad_(False) (utils/fix_model.py:6-40), and
    without it jax.grad would (a) waste FLOPs and (b) hit Pallas primitives
    that have no JVP rule (e.g. the fused cost-volume conv under TRAIN_PC)."""
    if not prefixes:
        return params

    def f(path, leaf):
        p = _path_str(path)
        frozen = any(p == pre or p.startswith(pre + ".") for pre in prefixes)
        return jax.lax.stop_gradient(leaf) if frozen else leaf

    return jax.tree_util.tree_map_with_path(f, params)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    do_grad_clip: bool = False,
    grad_clip: float = 1.0,
    apply_kwargs: Optional[dict] = None,
    uncert_tx: Optional[optax.GradientTransformation] = None,
    stop_grad_prefixes: tuple = (),
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    `batch` is a dict of model kwargs (images + padded GT). The model must
    return a dict whose 'loss*' entries are the training losses.
    """
    static_kwargs = dict(apply_kwargs or {})

    def step(state: TrainState, batch: dict, rng: jax.Array):
        r1, r2 = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params, uncert):
            params = stop_grad_by_prefix(params, stop_grad_prefixes)
            variables = {"params": params, "frozen": state.frozen}
            has_bn = bool(state.batch_stats)
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables,
                train=True,
                rngs={"sampling": r1, "dropout": r2},
                mutable=["batch_stats"] if has_bn else [],
                **batch,
                **static_kwargs,
            )
            out, new_vars = out if isinstance(out, tuple) else (out, {})
            losses = {k: v for k, v in out.items() if k.startswith("loss")}
            return total_loss(losses, uncert), (losses, new_vars.get("batch_stats"))

        if state.uncert is not None:
            (loss, (losses, new_bn)), (gparams, guncert) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.uncert)
        else:
            (loss, (losses, new_bn)), gparams = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, None)
            guncert = None

        # Per-step non-finite guard (reference ALLOW_EXCEPTION skips the
        # whole iteration, engine/trainer.py:116-123): if the loss or any
        # gradient is non-finite, apply NOTHING — params, optimizer state,
        # BN stats and uncert all keep their previous values; only `step`
        # advances. The skip is surfaced in metrics['skipped_nonfinite'].
        finite = jnp.isfinite(loss)
        for g in jax.tree.leaves(gparams):
            finite = finite & jnp.all(jnp.isfinite(g))
        if guncert is not None:
            finite = finite & jnp.all(jnp.isfinite(guncert))

        if do_grad_clip:
            gnorm = optax.global_norm(gparams)
            scale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-6))
            gparams = jax.tree.map(lambda g: g * scale, gparams)
        # zero the grads when skipping so tx.update math stays NaN-free
        # (where() alone would still let inf*0 poison momentum buffers)
        gparams = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), gparams
        )

        updates, new_opt = tx.update(gparams, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_uncert, new_uopt = state.uncert, state.uncert_opt_state
        if guncert is not None:
            # uncert weights are ordinary parameters in the reference's
            # optimizer param groups (solver/build.py:10-35): same optimizer,
            # same LR/momentum schedule
            utx = uncert_tx if uncert_tx is not None else optax.sgd(1e-3)
            guncert = jnp.where(finite, guncert, jnp.zeros_like(guncert))
            uupd, new_uopt = utx.update(guncert, state.uncert_opt_state, state.uncert)
            new_uncert = optax.apply_updates(state.uncert, uupd)

        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_state = state.replace(
            step=state.step + 1,
            params=keep(new_params, state.params),
            # guard: an empty mutated collection (e.g. BN in eval mode under
            # mutable=['batch_stats']) must not clobber the real stats
            batch_stats=keep(new_bn, state.batch_stats) if new_bn else state.batch_stats,
            opt_state=keep(new_opt, state.opt_state),
            uncert=keep(new_uncert, state.uncert) if new_uncert is not None else None,
            uncert_opt_state=keep(new_uopt, state.uncert_opt_state)
            if new_uopt is not None else None,
        )
        metrics = {
            "loss_total": loss,
            **losses,
            "skipped_nonfinite": (~finite).astype(jnp.float32),
        }
        return new_state, metrics

    return step


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    variables: dict,
    uncert_count: int = 0,
    uncert_tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    params = variables["params"]
    uncert = jnp.full((uncert_count,), -1.0) if uncert_count else None
    if uncert is not None:
        utx = uncert_tx if uncert_tx is not None else optax.sgd(1e-3)
        uncert_opt_state = utx.init(uncert)
    else:
        uncert_opt_state = None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        uncert=uncert,
        uncert_opt_state=uncert_opt_state,
    )
