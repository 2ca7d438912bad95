#!/bin/bash
# Evaluate the RELEASED checkpoints (reference scripts/car/vob/eval_with_trained_model.sh):
# place the downloaded artifacts under models/kitti/car/vob/ (no network
# egress here) — the importer sniffs each torch layout automatically.
set -e
cd "$(dirname "$0")/../../.."
python tools/test_net.py --config-file configs/kitti/car/vob/mask.yaml \
    --ckpt models/kitti/car/vob/mask/smrcnn.pth --dataset kitti_val_vob_car "$@"
python tools/test_net.py --config-file configs/kitti/car/vob/idispnet.yaml \
    --dataset kitti_val_vob_car "$@"
python tools/test_net.py --config-file configs/kitti/car/vob/rcnn.yaml \
    --ckpt models/kitti/car/vob/rcnn/pointrcnn.pth --dataset kitti_val_vob_car "$@"
