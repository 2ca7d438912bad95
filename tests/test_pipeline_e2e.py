"""End-to-end staged pipeline on a synthetic mini-KITTI (slow).

Drives the reference's 4-stage recipe (SURVEY.md §3.3,
scripts/car/vob/*.sh) through the real CLI tools on a KITTI-format dump:
  1. stage-1 2D training + inference -> offline predictions,
  2. stage-2 iDispNet training (DispRCNN3D + TRAIN_PSM) consuming them,
  3. stage-3 3D RPN training seeded from the stage-2 checkpoint,
  4. stage-4 3D RCNN training + full-pipeline eval emitting KITTI 3D txt.

Everything runs subprocess-level so argument parsing, config merging, stage
handoff and prediction caching are all exercised. XLA compiles are shared
via the repo compile cache, so reruns are much faster than first runs.
"""
import os
import pickle
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "INPUT.DO_RESIZE", "False",
    "SOLVER.IMS_PER_BATCH", "1",
    "TPU.MAX_GT", "8",
    "TPU.MAX_DETECTIONS", "8",
    "TPU.ROI_CROP_SIZE", "64",
    "SOLVER.CHECKPOINT_PERIOD", "1000",
    "TPU.MESH_SHAPE", "(1,)",
]


def run(args, data_root):
    env = dict(os.environ)
    env["DISPRCNN_DATA_DIR"] = data_root
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_kitti"))
    run(["tools/make_mini_kitti.py", "--root", root,
         "--n-train", "4", "--n-val", "2", "--image-hw", "128,320"], root)
    return root


def test_four_stage_recipe(mini_kitti, tmp_path):
    out = str(tmp_path)
    mask_dir = f"{out}/mask"
    mask_tiny = TINY + [
        "MODEL.WEIGHT", "", "MODEL.BACKBONE.CONV_BODY", "FBNet-FPN",
        "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "128",
        "MODEL.RPN.POST_NMS_TOP_N_TRAIN", "64",
        "MODEL.RPN.PRE_NMS_TOP_N_TEST", "256",
        "MODEL.RPN.POST_NMS_TOP_N_TEST", "64",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "16",
        "OUTPUT_DIR", mask_dir,
    ]
    # stage 1: 2D train + inference on train/val
    run(["tools/train_net.py", "--config-file", "configs/kitti/car/vob/mask.yaml",
         "--max-iter", "2", "--static-hw", "128,320", "--platform", "cpu"]
        + mask_tiny, mini_kitti)
    for split in ("train", "val"):
        run(["tools/test_net.py", "--config-file", "configs/kitti/car/vob/mask.yaml",
             "--dataset", f"kitti_{split}_vob_car", "--static-hw", "128,320",
             "--platform", "cpu"] + mask_tiny, mini_kitti)
    preds = f"{mask_dir}/inference/kitti_train_vob_car/predictions.pkl"
    assert os.path.exists(preds)
    with open(preds, "rb") as f:
        p = pickle.load(f)
    assert len(p) == 4 and {"left_boxes", "masks", "scores"} <= set(next(iter(p.values())))

    # stage 2: iDispNet training consumes the offline predictions
    o2d = f"{mask_dir}/inference/kitti_%s_vob_car/predictions"
    idisp_dir = f"{out}/idispnet"
    stage23 = TINY + [
        "SOLVER.OFFLINE_2D_PREDICTIONS", o2d,
        "MODEL.DISPNET.MAX_ROI_FOR_TRAINING", "4",
        "MODEL.PCNET.MAX_ROI_FOR_TRAINING", "4",
        "MODEL.POINTRCNN.RCNN.ROI_PER_IMAGE", "8",
    ]
    run(["tools/train_net.py", "--config-file", "configs/kitti/car/vob/idispnet.yaml",
         "--max-iter", "2", "--static-hw", "128,320", "--platform", "cpu"]
        + stage23 + ["OUTPUT_DIR", idisp_dir], mini_kitti)
    assert os.path.exists(f"{idisp_dir}/ckpt/last_checkpoint")

    # stage 3: 3D RPN seeded from the idispnet checkpoint
    rpn_dir = f"{out}/rpn"
    run(["tools/train_net.py", "--config-file", "configs/kitti/car/vob/rpn.yaml",
         "--max-iter", "2", "--static-hw", "128,320", "--platform", "cpu"]
        + stage23 + ["MODEL.WEIGHT", f"{idisp_dir}/ckpt", "OUTPUT_DIR", rpn_dir],
        mini_kitti)
    assert os.path.exists(f"{rpn_dir}/ckpt/last_checkpoint")

    # stage 4: 3D RCNN + full-pipeline eval with 3D txt
    rcnn_dir = f"{out}/rcnn"
    run(["tools/train_net.py", "--config-file", "configs/kitti/car/vob/rcnn.yaml",
         "--max-iter", "2", "--static-hw", "128,320", "--platform", "cpu"]
        + stage23 + ["MODEL.WEIGHT", f"{rpn_dir}/ckpt", "OUTPUT_DIR", rcnn_dir],
        mini_kitti)
    run(["tools/test_net.py", "--config-file", "configs/kitti/car/vob/rcnn.yaml",
         "--dataset", "kitti_val_vob_car", "--static-hw", "128,320",
         "--platform", "cpu", "--evaluate",
         "--gt-dir", f"{mini_kitti}/object/training/label_2"]
        + stage23 + ["OUTPUT_DIR", rcnn_dir], mini_kitti)
    txt_dir = f"{rcnn_dir}/inference/kitti_val_vob_car/txt"
    assert sorted(os.listdir(txt_dir)) == ["000004.txt", "000005.txt"]
    # 3D predictions cached with box3d/score3d fields
    with open(f"{rcnn_dir}/inference/kitti_val_vob_car/predictions.pkl", "rb") as f:
        p3 = pickle.load(f)
    first = next(iter(p3.values()))
    assert "box3d" in first and first["box3d"].shape[-1] == 7
    assert "score3d" in first


def test_standalone_idispnet_recipe(mini_kitti, tmp_path):
    import shutil
    """Stage-2 STANDALONE recipe (reference scripts/car/vob/train_idispnet.sh:
    predictions -> split_predictions -> generate_psmnet_input -> ROI dataset
    -> train_idispnet): fabricated 2D predictions (jittered GT) feed the
    generator; the trained-from-scratch iDispNet runs one epoch on the
    generated ROI dataset. Also guards the raw-crop contract (the ROI loader
    ImageNet-normalizes at load: generator output must be raw)."""
    import numpy as np

    out = str(tmp_path)
    # fabricate stage-1 predictions from GT labels of the mini-KITTI train set
    sys.path.insert(0, REPO)
    os.environ["DISPRCNN_DATA_DIR"] = mini_kitti
    from disprcnn_tpu.config import get_default_cfg
    from disprcnn_tpu.data.catalog import resolve

    cfg = get_default_cfg()
    ds = resolve("kitti_train_vob_car", cfg, training=False, transforms=None)
    rng = np.random.default_rng(0)
    preds = {}
    for i in range(len(ds)):
        s = ds[i]
        gl, gv = s["gt_left"], s["gt_valid"]
        n = int(gv.sum())
        if n == 0:
            continue
        jit = rng.uniform(-2, 2, (n, 4)).astype(np.float32)
        lb = gl[:n] + jit
        rb = lb - np.asarray([8.0, 0, 8, 0], np.float32)
        preds[s["imgid"]] = {
            "left_boxes": lb, "right_boxes": rb,
            "scores": np.full((n,), 0.9, np.float32),
            "valid": np.ones((n,), bool),
            "labels": np.ones((n,), np.int32),
            "masks": np.full((n, 28, 28), 0.9, np.float32),
        }
    import pickle

    with open(f"{out}/predictions.pkl", "wb") as f:
        pickle.dump(preds, f)

    run(["tools/split_predictions.py", "--predictions", f"{out}/predictions.pkl",
         "--out", f"{out}/split"], mini_kitti)
    assert len(os.listdir(f"{out}/split")) == len(preds)

    run(["tools/generate_psmnet_input.py", "--predictions",
         f"{out}/predictions.pkl", "--dataset", "kitti_train_vob_car",
         "--out", f"{out}/roi/train", "--roi-size", "32"], mini_kitti)
    files = sorted(os.listdir(f"{out}/roi/train"))
    assert files and files[0].endswith(".npz")
    rec = dict(np.load(f"{out}/roi/train/{files[0]}"))
    assert rec["left"].shape == (32, 32, 3)
    # raw [0, 1] crops, NOT ImageNet-normalized (loader normalizes)
    assert rec["left"].min() >= -0.01 and rec["left"].max() <= 1.01
    os.makedirs(f"{out}/roi/val", exist_ok=True)
    for f2 in files[:1]:
        shutil.copy(f"{out}/roi/train/{f2}", f"{out}/roi/val/{f2}")

    run(["tools/train_idispnet.py", "--data-dir", f"{out}/roi", "--epochs", "1",
         "--bs", "2", "--roi-size", "32", "--maxdisp", "16", "--mindisp", "-16",
         "--cpu", "--output", f"{out}/idispnet_sa"], mini_kitti)



def test_pedestrian_recipe_smoke(tmp_path):
    """Non-car recipe smoke (VERDICT r1 item 9): pedestrian/vob mini-KITTI
    (reference pseudo-GT layout: <base>/disparity_2 + <base>/mask_2/*.zarr
    through the in-repo zarr reader), stage-1 2D train + inference and the
    stage-2 iDispNet handoff, all through the pedestrian configs."""
    root = str(tmp_path / "mini_kitti_ped")
    out = str(tmp_path / "out")
    run(["tools/make_mini_kitti.py", "--root", root, "--cls", "Pedestrian",
         "--base", "vob", "--n-train", "2", "--n-val", "1",
         "--image-hw", "128,320"], root)
    assert os.path.isdir(f"{root}/object/training/vob/mask_2/000000.zarr")

    mask_dir = f"{out}/mask"
    tiny = TINY + [
        "MODEL.WEIGHT", "", "MODEL.BACKBONE.CONV_BODY", "FBNet-FPN",
        "MODEL.RPN.PRE_NMS_TOP_N_TRAIN", "128",
        "MODEL.RPN.POST_NMS_TOP_N_TRAIN", "64",
        "MODEL.RPN.PRE_NMS_TOP_N_TEST", "256",
        "MODEL.RPN.POST_NMS_TOP_N_TEST", "64",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "16",
        "OUTPUT_DIR", mask_dir,
    ]
    run(["tools/train_net.py", "--config-file",
         "configs/kitti/pedestrian/vob/mask.yaml",
         "--max-iter", "2", "--static-hw", "128,320", "--platform", "cpu"]
        + tiny, root)
    run(["tools/test_net.py", "--config-file",
         "configs/kitti/pedestrian/vob/mask.yaml",
         "--dataset", "kitti_train_vob_pedestrian", "--static-hw", "128,320",
         "--platform", "cpu"] + tiny, root)
    preds = f"{mask_dir}/inference/kitti_train_vob_pedestrian/predictions.pkl"
    assert os.path.exists(preds)

    idisp_dir = f"{out}/idispnet"
    run(["tools/train_net.py", "--config-file",
         "configs/kitti/pedestrian/vob/idispnet.yaml",
         "--max-iter", "2", "--static-hw", "128,320", "--platform", "cpu"]
        + TINY + [
            "SOLVER.OFFLINE_2D_PREDICTIONS",
            f"{mask_dir}/inference/kitti_%s_vob_pedestrian/predictions",
            "MODEL.DISPNET.MAX_ROI_FOR_TRAINING", "4",
            "OUTPUT_DIR", idisp_dir,
        ], root)
    assert os.path.exists(f"{idisp_dir}/ckpt/last_checkpoint")
