"""Training-step throughput per stage on one TPU chip -> BENCH_TRAIN.json.

The reference's headline costs are stage TRAINING times
(docs/TRAIN_VAL.md:55-94). Aggregate reference throughputs from its shipped
recipes:

- 2D SMRCNN: 4140 iters x bs 4 in ~1.5 h on 4 GPUs  -> 3.07 imgs/s
- 3D RPN:   27600 iters x bs 3 in ~5 h on 8 GPUs    -> 4.60 imgs/s
- 3D RCNN:  62100 iters x bs 1 in ~13 h on 8 GPUs   -> 1.33 imgs/s
- iDispNet: 100 epochs in ~8 h on 8 GPUs (ROI count is dataset-derived,
  so no per-img baseline is computed; ms/step is still reported)

This measures our jitted SPMD train step (fwd+bwd+optimizer) per stage on a
single chip at the reference per-step shapes and writes one JSON with
ms/step, imgs/s/chip, and vs the reference AGGREGATE (all its GPUs vs our
one chip — the honest cross-hardware comparison for wall-clock training).

Usage: python tools/bench_train.py [--stages 2d,psm,pc] [--bs 4]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

REF_AGG_IMGS_PER_SEC = {"2d": 4140 * 4 / 5400.0, "pc": 62100 * 1 / 46800.0}
# iDispNet baseline is in CROPS/s: the stage trains on 224^2 ROI crops
# (100 epochs in ~8 h on 8 GPUs, docs/TRAIN_VAL.md:83). The crop count is
# dataset-derived (generate_psmnet_input writes one crop per kept train-
# split detection); no figure is published, so estimate HIGH to be
# conservative about our ratio: 3712 train images x ~6 kept car
# detections = ~22.3k crops -> 100 * 22272 / 28800 s = 77.3 crops/s
# aggregate across the reference's 8 GPUs.
REF_AGG_CROPS_PER_SEC = {"psm": 100 * 22272 / 28800.0}


def _fill_variables(model_init_shapes, nprng):
    def fill(path, s):
        a = (0.05 * nprng.standard_normal(s.shape)).astype(s.dtype)
        if any("var" in str(getattr(p, "key", "")) for p in path):
            a = np.abs(a) + np.asarray(0.9, s.dtype)
        return a

    import jax

    return jax.tree_util.tree_map_with_path(fill, model_init_shapes)


def bench_2d(bs: int, hw: str):
    import jax
    import jax.numpy as jnp
    import optax

    from disprcnn_tpu.engine.trainer import create_train_state, make_train_step
    from disprcnn_tpu.models.detector.disprcnn import DispRCNN
    from disprcnn_tpu.solver.schedules import one_cycle
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    h, w = (int(v) for v in hw.split(","))
    b, m = bs, 8
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

    print("2d: init (eval_shape + numpy fill)...", flush=True)
    shapes = jax.eval_shape(
        lambda k, bb: model.init({"params": k, "sampling": k}, train=True, **bb),
        rng, batch,
    )
    variables = _fill_variables(shapes, nprng)
    tx = optax.chain(optax.trace(decay=0.9),
                     optax.scale_by_learning_rate(one_cycle(0.01, 1000)))
    state = create_train_state(model, tx, variables)
    step = jax.jit(make_train_step(model, tx, do_grad_clip=True, grad_clip=10.0))

    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    rng = jax.device_put(rng, dev)
    print("2d: compile + warm...", flush=True)
    ms = device_timeit(lambda st: step(st, batch, rng)[1]["loss_total"], state, n=10)
    return {"ms_per_step": round(ms, 2), "imgs_per_step": b,
            "imgs_per_sec_chip": round(b / (ms / 1e3), 2)}


def bench_3d(bs: int, train_psm: bool, train_pc: bool, max_det: int = 16):
    """One DispRCNN3D train step at the production geometry: `train_psm`
    measures the iDispNet stage (PSMNet fwd+bwd on bs*max_det 224^2 crops),
    `train_pc` the PointRCNN stage (RPN3D + RCNN losses; TRAIN budgets from
    configs/kitti/car/vob/rcnn.yaml)."""
    import jax
    import jax.numpy as jnp
    import optax

    from disprcnn_tpu.engine.trainer import create_train_state, make_train_step
    from disprcnn_tpu.models.detector.disprcnn3d import DispRCNN3D
    from disprcnn_tpu.solver.schedules import one_cycle
    from disprcnn_tpu.structures.stereo import StereoBoxes
    from disprcnn_tpu.utils.benchmarking import device_timeit

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    b, d, h, w = bs, max_det, 384, 1248
    model = DispRCNN3D(
        max_det=d, roi_size=224, maxdisp=48, mindisp=-48, npoints=768,
        lift_grid=112, proposals_per_roi=100, rpn_pre_nms_per_roi=768,
        proposals_per_roi_train=512, rpn_pre_nms_per_roi_train=768,
        rcnn_rois_per_instance=16, det3d_on=train_pc,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)

    with jax.default_device(cpu):
        lbox = jnp.tile(jnp.asarray([[[100.0, 150, 400, 350]]]), (b, d, 1))
        dets = StereoBoxes(
            left=lbox, right=lbox - jnp.asarray([20.0, 0, 20, 0]),
            score=jnp.ones((b, d)), valid=jnp.ones((b, d), bool),
            fields={"mask": jnp.full((b, d, 28, 28), 0.9)},
        )
        calib = {
            "fu": jnp.full((b,), 721.5), "fv": jnp.full((b,), 721.5),
            "cu": jnp.full((b,), w / 2.0), "cv": jnp.full((b,), h / 2.0),
            "tx": jnp.zeros((b,)), "ty": jnp.zeros((b,)),
            "fuxb": jnp.full((b,), 389.6),
        }
        img = jnp.asarray(nprng.uniform(0, 1, (b, h, w, 3)), jnp.float32)
        batch = dict(
            left_img=img, right_img=img, dets=dets, calib=calib,
            gt_disp=jnp.full((b, h, w), 20.0, jnp.float32),
            gt_left=lbox[:, :2],
            gt_boxes3d=jnp.tile(
                jnp.asarray([[[0.0, 1.7, 19.0, 1.6, 1.7, 4.0, 0.2],
                              [2.0, 1.7, 20.0, 1.6, 1.7, 4.0, -0.2]]]), (b, 1, 1)),
            gt_valid=jnp.ones((b, 2), bool),
        )
        print("3d: init (eval_shape + numpy fill)...", flush=True)
        shapes = jax.eval_shape(
            lambda k: model.init(
                {"params": k, "sampling": k},
                img[:1], img[:1], jax.tree.map(lambda x: x[:1], dets),
                {k2: v[:1] for k2, v in calib.items()}, train=False),
            rng,
        )
    variables = _fill_variables(shapes, nprng)
    tx = optax.chain(optax.trace(decay=0.9),
                     optax.scale_by_learning_rate(one_cycle(0.01, 1000)))
    state = create_train_state(model, tx, variables)
    # mirror the stage configs' freeze flags (rcnn.yaml: FIX_DISPARITY +
    # FIX_POINTRCNN_RPN; rpn.yaml: FIX_DISPARITY) so frozen branches carry
    # zero tangents — required for the Pallas cost-volume path under grad
    frozen = () if train_psm else ("idispnet", "pointrcnn.rpn")
    step = jax.jit(make_train_step(
        model, tx, do_grad_clip=True, grad_clip=10.0,
        apply_kwargs=dict(train_psm=train_psm, train_pc=train_pc),
        stop_grad_prefixes=frozen))

    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)
    rng = jax.device_put(rng, dev)
    print("3d: compile + warm...", flush=True)
    ms = device_timeit(lambda st: step(st, batch, rng)[1]["loss_total"], state, n=10)
    return {"ms_per_step": round(ms, 2), "imgs_per_step": b,
            "rois_per_step": b * d,
            "imgs_per_sec_chip": round(b / (ms / 1e3), 2),
            "rois_per_sec_chip": round(b * d / (ms / 1e3), 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--hw", default="384,1248")
    ap.add_argument("--stages", default="2d,psm,pc",
                    help="comma list: 2d (SMRCNN), psm (iDispNet), pc (PointRCNN)")
    ap.add_argument("--out", default="BENCH_TRAIN.json")
    ap.add_argument("--sweep", default="",
                    help="comma list of per-stage batch sizes to sweep "
                         "(e.g. '1,2,4'); best imgs/s per stage is kept "
                         "with the full table in the JSON")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def run_stage(stage, bs):
        if stage == "2d":
            return bench_2d(bs, args.hw)
        if stage == "psm":
            # iDispNet stage trains on ROI crops; bs images x 16 ROIs (the
            # reference's fast.ai recipe is 12 crops per GPU)
            return bench_3d(bs, train_psm=True, train_pc=False)
        if stage == "pc":
            return bench_3d(bs, train_psm=False, train_pc=True)  # rcnn.yaml bs 1
        raise SystemExit(f"unknown stage {stage}")

    out = {"device": getattr(jax.devices()[0], "device_kind", "unknown"),
           "stages": {}}
    sweep = [int(s) for s in args.sweep.split(",") if s.strip()]
    for stage in args.stages.split(","):
        print(f"===== train stage {stage} =====", flush=True)
        if sweep:
            table = {}
            for bs in sweep:
                try:
                    table[bs] = run_stage(stage, bs)
                except Exception as e:  # noqa: BLE001 — OOM at big bs is data
                    table[bs] = {"error": f"{type(e).__name__}"}
                print(f"  bs={bs}: {json.dumps(table[bs])}", flush=True)
            ok = {b_: r_ for b_, r_ in table.items() if "error" not in r_}
            if not ok:
                out["stages"][stage] = {"error": "all sweep points failed"}
                continue
            best = max(ok, key=lambda b_: ok[b_]["imgs_per_sec_chip"])
            r = dict(ok[best])
            r["batch_sweep"] = {str(b_): t_.get("imgs_per_sec_chip",
                                                t_.get("error"))
                                for b_, t_ in table.items()}
            r["best_bs"] = best
        else:
            r = run_stage(stage, args.bs if stage == "2d" else 1)
        # psm's reference baseline is CROPS/s (the ROI dataset); 2d/pc are
        # whole-image recipes
        if stage in REF_AGG_CROPS_PER_SEC:
            r["vs_reference_aggregate"] = round(
                r["rois_per_sec_chip"] / REF_AGG_CROPS_PER_SEC[stage], 2)
        elif stage in REF_AGG_IMGS_PER_SEC:
            r["vs_reference_aggregate"] = round(
                r["imgs_per_sec_chip"] / REF_AGG_IMGS_PER_SEC[stage], 2)
        out["stages"][stage] = r
        print(stage, json.dumps(r), flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
