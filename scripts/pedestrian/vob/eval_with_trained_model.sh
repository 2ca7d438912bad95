#!/bin/bash
# Evaluate the RELEASED checkpoints (reference scripts/pedestrian/vob/eval_with_trained_model.sh):
# place the downloaded artifacts under models/kitti/pedestrian/vob/ (no network
# egress here) — the importer sniffs each torch layout automatically.
set -e
cd "$(dirname "$0")/../../.."
python tools/test_net.py --config-file configs/kitti/pedestrian/vob/mask.yaml \
    --ckpt models/kitti/pedestrian/vob/mask/smrcnn.pth --dataset kitti_val_vob_pedestrian "$@"
python tools/test_net.py --config-file configs/kitti/pedestrian/vob/idispnet.yaml \
    --dataset kitti_val_vob_pedestrian "$@"
python tools/test_net.py --config-file configs/kitti/pedestrian/vob/rcnn.yaml \
    --ckpt models/kitti/pedestrian/vob/rcnn/pointrcnn.pth --dataset kitti_val_vob_pedestrian "$@"
