#!/bin/bash
# Evaluate the RELEASED checkpoints (reference scripts/pedestrian/pob/eval_with_trained_model.sh):
# place the downloaded artifacts under models/kitti/pedestrian/pob/ (no network
# egress here) — the importer sniffs each torch layout automatically.
set -e
cd "$(dirname "$0")/../../.."
python tools/test_net.py --config-file configs/kitti/pedestrian/pob/mask.yaml \
    --ckpt models/kitti/pedestrian/pob/mask/smrcnn.pth --dataset kitti_val_pob_pedestrian "$@"
python tools/test_net.py --config-file configs/kitti/pedestrian/pob/idispnet.yaml \
    --dataset kitti_val_pob_pedestrian "$@"
python tools/test_net.py --config-file configs/kitti/pedestrian/pob/rcnn.yaml \
    --ckpt models/kitti/pedestrian/pob/rcnn/pointrcnn.pth --dataset kitti_val_pob_pedestrian "$@"
