#!/bin/bash
# Evaluate the RELEASED checkpoints (reference scripts/cyclist/eval_with_trained_model.sh):
# place the downloaded artifacts under models/kitti/cyclist/ (no network
# egress here) — the importer sniffs each torch layout automatically.
set -e
cd "$(dirname "$0")/../.."
python tools/test_net.py --config-file configs/kitti/cyclist/mask.yaml \
    --ckpt models/kitti/cyclist/mask/smrcnn.pth --dataset kitti_val_cyclist "$@"
python tools/test_net.py --config-file configs/kitti/cyclist/idispnet.yaml \
    --dataset kitti_val_cyclist "$@"
python tools/test_net.py --config-file configs/kitti/cyclist/rcnn.yaml \
    --ckpt models/kitti/cyclist/rcnn/pointrcnn.pth --dataset kitti_val_cyclist "$@"
