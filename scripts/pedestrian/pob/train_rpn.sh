#!/bin/bash
# Stage 3: PointRCNN 3D RPN training (reference scripts/pedestrian/pob/train_rpn.sh):
# refresh the offline predictions from the idispnet stage, then train the
# 3D RPN initialized from the idispnet checkpoint.
set -e
cd "$(dirname "$0")/../../.."
python tools/test_net.py --config-file configs/kitti/pedestrian/pob/idispnet.yaml \
    --dataset kitti_train_pob_pedestrian $IDISP_ARGS
python tools/test_net.py --config-file configs/kitti/pedestrian/pob/idispnet.yaml \
    --dataset kitti_val_pob_pedestrian $IDISP_ARGS
python tools/train_net.py --config-file configs/kitti/pedestrian/pob/rpn.yaml \
    "$@" MODEL.WEIGHT models/kitti/pedestrian/pob/idispnet/ckpt
