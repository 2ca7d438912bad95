#!/bin/bash
# Stage 2: iDispNet training (reference scripts/pedestrian/vob/train_idispnet.sh):
# 1) run 2D inference on train+val to produce the offline predictions,
# 2) train the in-framework iDispNet (DispRCNN3D + SOLVER.TRAIN_PSM).
# Pass MASK_ARGS / TRAIN_ARGS env vars for smoke overrides.
set -e
cd "$(dirname "$0")/../../.."
python tools/test_net.py --config-file configs/kitti/pedestrian/vob/mask.yaml \
    --dataset kitti_train_vob_pedestrian $MASK_ARGS
python tools/test_net.py --config-file configs/kitti/pedestrian/vob/mask.yaml \
    --dataset kitti_val_vob_pedestrian $MASK_ARGS
python tools/train_net.py --config-file configs/kitti/pedestrian/vob/idispnet.yaml "$@"
