"""Training entry point (reference tools/train_net.py:23-128).

Usage: python tools/train_net.py --config-file configs/kitti/car/vob/mask.yaml
       [KEY VALUE ...]

Dispatches on MODEL.META_ARCHITECTURE: DispRCNN (2D stage) batches are
(images + padded GT); DispRCNN3D (stage 2/3) batches additionally carry the
offline 2D predictions, calibration and 3D GT (engine/batching.py). DDP/NCCL
init becomes mesh construction; the per-iteration loop is one jitted SPMD
step; checkpoints are orbax.
"""
from __future__ import annotations

import argparse
import datetime
import sys
import time

sys.path.insert(0, ".")


def parse_args():
    p = argparse.ArgumentParser(description="disprcnn_tpu training")
    p.add_argument("--config-file", required=True)
    p.add_argument("--max-iter", type=int, default=None, help="override for smoke runs")
    p.add_argument("--dataset", default=None, help="override train dataset name")
    p.add_argument("--static-hw", default="384,1248")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu for smoke runs)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.data.catalog import resolve_many
    from disprcnn_tpu.data.loader import StereoBatchLoader
    from disprcnn_tpu.data.transforms import build_transforms
    from disprcnn_tpu.engine.batching import make_batch_converter
    from disprcnn_tpu.engine.trainer import create_train_state, make_train_step
    from disprcnn_tpu.models.build import build_detection_model
    from disprcnn_tpu.parallel.mesh import make_mesh
    from disprcnn_tpu.solver.build import frozen_path_prefixes, make_optimizer
    from disprcnn_tpu.solver.schedules import make_momentum_schedule, make_schedule
    from disprcnn_tpu.parallel.multihost import is_main_process
    from disprcnn_tpu.utils.checkpoint import Checkpointer, load_stage_weights
    from disprcnn_tpu.utils.logging import MetricLogger, setup_logger
    from disprcnn_tpu.utils.tb import SummaryWriter

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.max_iter is not None:
        cfg.SOLVER.MAX_ITER = args.max_iter
    cfg.freeze()

    logger = setup_logger("disprcnn_tpu", cfg.OUTPUT_DIR)
    logger.info(f"config: {args.config_file}")

    mesh = make_mesh(tuple(cfg.TPU.MESH_AXES), tuple(cfg.TPU.MESH_SHAPE))
    n_dev = int(np.prod(mesh.devices.shape))
    per_host_bs = max(cfg.SOLVER.IMS_PER_BATCH, n_dev)
    logger.info(f"mesh: {mesh}, global batch {per_host_bs}")

    hw = tuple(int(v) for v in args.static_hw.split(","))
    names = [args.dataset] if args.dataset else (
        list(cfg.DATASETS.TRAIN) or ["synthetic_64"]
    )
    transforms = build_transforms(cfg, is_train=True)
    ds = resolve_many(names, cfg, training=True, transforms=transforms)
    loader = StereoBatchLoader(
        ds, per_host_bs, hw, shuffle=cfg.INPUT.SHUFFLE,
        size_divisibility=max(cfg.DATALOADER.SIZE_DIVISIBILITY, 32),
        max_iter=cfg.SOLVER.MAX_ITER,
        group_by_aspect=cfg.DATALOADER.ASPECT_RATIO_GROUPING,
    )

    model = build_detection_model(cfg)
    convert, static_kwargs = make_batch_converter(cfg)
    rng = jax.random.PRNGKey(0)
    sample_batch = next(iter(loader))
    init_kwargs = convert(sample_batch, train=True)

    def init_fn(rngs, kw):
        return model.init(rngs, train=True, **static_kwargs, **kw)

    variables = jax.jit(init_fn)({"params": rng, "sampling": rng}, init_kwargs)
    variables = jax.tree.map(np.asarray, variables)  # host copy for surgery
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    logger.info(f"model: {cfg.MODEL.META_ARCHITECTURE}, {n_params / 1e6:.1f}M params")

    if cfg.MODEL.WEIGHT:
        variables = load_stage_weights(variables, cfg.MODEL.WEIGHT)
        logger.info(f"initialized from {cfg.MODEL.WEIGHT}")

    schedule = make_schedule(cfg)
    tx = make_optimizer(
        cfg, variables["params"], schedule, frozen_path_prefixes(cfg),
        momentum_schedule=make_momentum_schedule(cfg),
    )
    # learned uncertainty weights are ordinary optimizer parameters
    # (reference solver/build.py:10-35)
    uncert_tx = optax.chain(
        optax.trace(decay=cfg.SOLVER.MOMENTUM),
        optax.scale_by_learning_rate(schedule),
    )
    state = create_train_state(
        model, tx, variables, uncert_count=cfg.SOLVER.UNCERT_LOSS_WEIGHT,
        uncert_tx=uncert_tx,
    )
    ckpt = Checkpointer(f"{cfg.OUTPUT_DIR}/ckpt")
    state, start_iter = ckpt.load(state, load_optimizer=cfg.SOLVER.LOAD_OPTIMIZER)

    step_fn = make_train_step(
        model, tx, cfg.SOLVER.DO_GRAD_CLIP, cfg.SOLVER.GRAD_CLIP,
        apply_kwargs=static_kwargs, uncert_tx=uncert_tx,
        stop_grad_prefixes=frozen_path_prefixes(cfg),
    )
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    jitted = jax.jit(step_fn)

    def to_device(batch):
        return jax.device_put(convert(batch, train=True), data_sh)

    meters = MetricLogger()
    # scalar observability parity with the reference's tensorboardX writer
    # (engine/trainer.py:66-67,132-144): losses + lr + batch_time + uncert
    tb = SummaryWriter(f"{cfg.OUTPUT_DIR}/tb") if is_main_process() else None
    t0 = time.perf_counter()
    t_last = t0
    it = start_iter
    for it, batch in enumerate(loader, start=start_iter):
        state, metrics = jitted(state, to_device(batch), rng)
        if it % cfg.SOLVER.PRINT_INTERVAL == 0:
            metrics = {k: float(v) for k, v in metrics.items()}
            if tb is not None:
                now = time.perf_counter()
                scalars = dict(metrics)
                scalars["lr"] = float(schedule(it))
                scalars["batch_time"] = (now - t_last) / max(
                    cfg.SOLVER.PRINT_INTERVAL, 1
                )
                t_last = now
                if cfg.SOLVER.UNCERT_LOSS_WEIGHT:
                    for i, u in enumerate(np.asarray(state.uncert)):
                        scalars[f"uncert{i}"] = float(u)
                tb.add_scalars(scalars, it)
            # NaN sentinel (reference keeps torch.autograd.set_detect_anomaly
            # permanently on, train_net.py:24; here a host-side loss check at
            # log cadence keeps the jitted step clean — set
            # JAX_DEBUG_NANS=1 for the op-level equivalent)
            bad = [k for k, v in metrics.items() if not np.isfinite(v)]
            if bad:
                msg = f"non-finite losses at iter {it}: {bad}"
                if cfg.SOLVER.ALLOW_EXCEPTION:
                    logger.warning(msg + " (ALLOW_EXCEPTION: continuing)")
                else:
                    raise FloatingPointError(msg)
            meters.update(**metrics)
            eta = (time.perf_counter() - t0) / max(it - start_iter + 1, 1) * (
                cfg.SOLVER.MAX_ITER - it
            )
            logger.info(
                f"iter {it}/{cfg.SOLVER.MAX_ITER} {meters} "
                f"eta {datetime.timedelta(seconds=int(eta))}"
            )
        if it > start_iter and it % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
            ckpt.save(it, jax.device_get(state))
    ckpt.save(max(cfg.SOLVER.MAX_ITER, it + 1), jax.device_get(state))
    if tb is not None:
        tb.close()
    logger.info("training done")


if __name__ == "__main__":
    main()
