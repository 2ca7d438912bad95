import os
import subprocess

import numpy as np
import pytest

from disprcnn_tpu.evaluation.ap import evaluate_ap

NATIVE = os.path.join(os.path.dirname(__file__), "..", "csrc", "build", "kitti_ap")


def _gt_line(cls, box, xyz, hwl, ry, occ=0, trunc=0.0, alpha=-10.0):
    return (
        f"{cls} {trunc} {occ} {alpha} {box[0]:.2f} {box[1]:.2f} {box[2]:.2f} {box[3]:.2f} "
        f"{hwl[0]} {hwl[1]} {hwl[2]} {xyz[0]:.2f} {xyz[1]:.2f} {xyz[2]:.2f} {ry:.3f}"
    )


def _write_scene(gt_dir, pred_dir, rng, n_images=20, det_prob=0.8, jitter=3.0):
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(pred_dir, exist_ok=True)
    for i in range(n_images):
        gts, dets = [], []
        for _ in range(int(rng.integers(1, 5))):
            x1, y1 = rng.uniform(0, 900), rng.uniform(100, 250)
            w, h = rng.uniform(60, 200), rng.uniform(45, 120)
            box = np.asarray([x1, y1, x1 + w, y1 + h])
            xyz = [rng.uniform(-15, 15), rng.uniform(1, 2), rng.uniform(5, 50)]
            hwl = [1.5, 1.6, 3.9]
            ry = rng.uniform(-np.pi, np.pi)
            gts.append(_gt_line("Car", box, xyz, hwl, ry, occ=int(rng.integers(0, 3)),
                                trunc=float(rng.uniform(0, 0.4))))
            if rng.random() < det_prob:
                jb = box + rng.normal(0, jitter, 4)
                jxyz = np.asarray(xyz) + rng.normal(0, 0.1, 3)
                dets.append(
                    _gt_line("Car", jb, jxyz, hwl, ry) + f" {rng.uniform(0.3, 1):.4f}"
                )
        with open(f"{gt_dir}/{i:06d}.txt", "w") as f:
            f.write("\n".join(gts))
        with open(f"{pred_dir}/{i:06d}.txt", "w") as f:
            f.write("\n".join(dets))


def test_perfect_detections_score_high(tmp_path, rng):
    gt_dir, pred_dir = str(tmp_path / "gt"), str(tmp_path / "pred")
    os.makedirs(gt_dir)
    os.makedirs(pred_dir)
    # need >= 41 GT instances to fill every recall sample of the 41-point
    # curve (devkit artifact: fewer GT leaves zero tail slots even for a
    # perfect detector)
    for i in range(20):
        lines = []
        for _ in range(4):
            x1, y1 = rng.uniform(0, 800), rng.uniform(100, 200)
            box = [x1, y1, x1 + 120, y1 + 80]
            lines.append(_gt_line("Car", box, [2, 1.5, 20], [1.5, 1.6, 3.9], 0.3))
        with open(f"{gt_dir}/{i:06d}.txt", "w") as f:
            f.write("\n".join(lines))
        with open(f"{pred_dir}/{i:06d}.txt", "w") as f:
            f.write("\n".join(f"{l} {rng.uniform(0.5, 1):.4f}" for l in lines))
    res = evaluate_ap(gt_dir, pred_dir, str(tmp_path / "out"), "Car", 0.7)
    for metric in ("image", "ground", "3d"):
        assert all(v > 95.0 for v in res[metric]), (metric, res)


def test_missed_detections_lower_ap(tmp_path, rng):
    gt_dir, pred_dir = str(tmp_path / "gt"), str(tmp_path / "pred")
    _write_scene(gt_dir, pred_dir, rng, det_prob=0.5, jitter=0.0)
    res = evaluate_ap(gt_dir, pred_dir, str(tmp_path / "out"), "Car", 0.7,
                      metrics=("image",))
    # recall is capped at ~det_prob, so AP must be well below a perfect score
    assert all(v < 90.0 for v in res["image"])
    assert any(v > 5.0 for v in res["image"])


@pytest.mark.skipif(not os.path.exists(NATIVE), reason="native evaluator not built")
def test_native_matches_python(tmp_path, rng):
    gt_dir, pred_dir = str(tmp_path / "gt"), str(tmp_path / "pred")
    _write_scene(gt_dir, pred_dir, rng)
    out_cpp = str(tmp_path / "cpp")
    out_py = str(tmp_path / "py")
    os.makedirs(out_cpp)
    subprocess.run([NATIVE, gt_dir, pred_dir, out_cpp, "Car", "0.7"], check=True)
    evaluate_ap(gt_dir, pred_dir, out_py, "Car", 0.7)
    for fname in (
        "stats_car_detection.txt",
        "stats_car_detection_ground.txt",
        "stats_car_detection_3d.txt",
        "stats_car_orientation.txt",
    ):
        c = np.loadtxt(os.path.join(out_cpp, fname))
        p = np.loadtxt(os.path.join(out_py, fname))
        np.testing.assert_allclose(c, p, atol=1e-5, err_msg=fname)
