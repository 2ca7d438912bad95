"""Differential validation of the KITTI AP evaluators against the reference's
SHIPPED official binaries (tools/kitti_object/kitti_evaluation_lib/
evaluate_object_0.{5,7}, invoked by kitti_eval.py:48-52).

Binary contract (established by probing — it ships without source):
  evaluate_object_<thr> <result_dir> <gt_dir>
reads detections from <result_dir>/%06d.txt, GT from <gt_dir>/%06d.txt, and
writes stats_car_detection{,_ground,_3d}.txt (3 x 41 precision curves) into
<result_dir>. Both the C++ rebuild (csrc/kitti_ap) and the Python
implementation (evaluation/ap.py) must reproduce those curves to the
binary's print precision (1e-6) on a randomized scene set with DontCare
regions, occlusion/truncation gating and score-varied detections.
"""
import os
import shutil
import stat
import subprocess

import numpy as np
import pytest

BINARY_DIR = "/root/reference/tools/kitti_object/kitti_evaluation_lib"
NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "csrc", "build", "kitti_ap")

KINDS = ("detection", "detection_ground", "detection_3d")


def _gen_scenes(gt_dir, det_dir, n=20, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        gt_lines, det_lines = [], []
        for _ in range(int(rng.integers(1, 6))):
            x1, y1 = rng.uniform(50, 900), rng.uniform(120, 200)
            w, h = rng.uniform(40, 150), rng.uniform(45, 90)
            x, yy, z = rng.uniform(-20, 20), rng.uniform(1, 2), rng.uniform(6, 60)
            ry = rng.uniform(-np.pi, np.pi)
            hh, ww, ll = 1.5 + rng.uniform(-.1, .1), 1.6 + rng.uniform(-.1, .1), 3.9 + rng.uniform(-.3, .3)
            occ = int(rng.integers(0, 3))
            trunc = float(rng.uniform(0, 0.4))
            alpha = ry + np.arctan2(-x, z)
            gt_lines.append(
                f"Car {trunc:.2f} {occ} {alpha:.2f} {x1:.2f} {y1:.2f} "
                f"{x1+w:.2f} {y1+h:.2f} {hh:.2f} {ww:.2f} {ll:.2f} "
                f"{x:.2f} {yy:.2f} {z:.2f} {ry:.2f}")
            if rng.random() < 0.85:
                jx = rng.uniform(-8, 8)
                jw = rng.uniform(0.85, 1.15)
                dx, dz = x + rng.uniform(-.5, .5), z + rng.uniform(-1.5, 1.5)
                dry = ry + rng.uniform(-.3, .3)
                s = rng.uniform(0.3, 1.0)
                dalpha = dry + np.arctan2(-dx, dz)
                det_lines.append(
                    f"Car -1 -1 {dalpha:.2f} {x1+jx:.2f} {y1:.2f} "
                    f"{x1+jx+w*jw:.2f} {y1+h:.2f} {hh:.2f} {ww:.2f} {ll:.2f} "
                    f"{dx:.2f} {yy:.2f} {dz:.2f} {dry:.2f} {s:.4f}")
        if rng.random() < 0.5:
            x1, y1 = rng.uniform(100, 800), rng.uniform(150, 250)
            gt_lines.append(
                f"DontCare -1 -1 -10 {x1:.2f} {y1:.2f} {x1+60:.2f} {y1+25:.2f} "
                f"-1 -1 -1 -1000 -1000 -1000 -10")
            if rng.random() < 0.7:
                det_lines.append(
                    f"Car -1 -1 -10 {x1+5:.2f} {y1+2:.2f} {x1+55:.2f} {y1+23:.2f} "
                    f"1.5 1.6 3.9 0 1 30 0 {rng.uniform(.3, .9):.4f}")
        for _ in range(int(rng.integers(0, 3))):
            x1, y1 = rng.uniform(50, 900), rng.uniform(120, 220)
            det_lines.append(
                f"Car -1 -1 0.5 {x1:.2f} {y1:.2f} {x1+70:.2f} {y1+50:.2f} "
                f"1.5 1.6 3.9 {rng.uniform(-15, 15):.2f} 1.2 "
                f"{rng.uniform(8, 50):.2f} 0.3 {rng.uniform(.05, .95):.4f}")
        with open(os.path.join(gt_dir, f"{i:06d}.txt"), "w") as f:
            f.write("\n".join(gt_lines) + "\n")
        with open(os.path.join(det_dir, f"{i:06d}.txt"), "w") as f:
            f.write("\n".join(det_lines) + "\n")


@pytest.fixture(scope="module", params=[0.7, 0.5])
def golden(request, tmp_path_factory):
    """Run the shipped binary on a generated scene set -> (thr, gt, det, stats)."""
    thr = request.param
    src = os.path.join(BINARY_DIR, f"evaluate_object_{thr}")
    if not os.path.exists(src):
        pytest.skip("official KITTI evaluation binaries not available")
    base = tmp_path_factory.mktemp(f"ap_{thr}")
    gt, out = str(base / "gt"), str(base / "out")
    os.makedirs(gt)
    os.makedirs(out)
    _gen_scenes(gt, out)
    binary = str(base / "evaluate_object")
    shutil.copy(src, binary)
    os.chmod(binary, os.stat(binary).st_mode | stat.S_IXUSR)
    r = subprocess.run([binary, out, gt], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    stats = {k: np.loadtxt(os.path.join(out, f"stats_car_{k}.txt")) for k in KINDS}
    assert all(s.shape == (3, 41) for s in stats.values())
    return thr, gt, out, stats


def test_cpp_evaluator_matches_official_binary(golden, tmp_path):
    thr, gt, det, stats = golden
    if not os.path.exists(NATIVE):
        pytest.skip("csrc/build/kitti_ap not built")
    out = str(tmp_path / "native")
    os.makedirs(out)
    subprocess.run([NATIVE, gt, det, out, "Car", str(thr)], check=True, timeout=300)
    for kind in KINDS:
        mine = np.loadtxt(os.path.join(out, f"stats_car_{kind}.txt"))
        np.testing.assert_allclose(
            mine, stats[kind], atol=1e-6,
            err_msg=f"{kind} curve differs from the official binary @{thr}")


def test_python_evaluator_matches_official_binary(golden, tmp_path):
    thr, gt, det, stats = golden
    from disprcnn_tpu.evaluation.ap import evaluate_ap

    out = str(tmp_path / "py")
    evaluate_ap(gt, det, out, "Car", thr)
    for kind in KINDS:
        suffix = {"detection": "detection", "detection_ground": "detection_ground",
                  "detection_3d": "detection_3d"}[kind]
        mine = np.loadtxt(os.path.join(out, f"stats_car_{suffix}.txt"))
        np.testing.assert_allclose(
            mine, stats[kind], atol=1e-6,
            err_msg=f"{kind} curve differs from the official binary @{thr}")
