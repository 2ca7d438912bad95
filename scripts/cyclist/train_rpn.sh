#!/bin/bash
# Stage 3: PointRCNN 3D RPN training (reference scripts/cyclist/train_rpn.sh):
# refresh the offline predictions from the idispnet stage, then train the
# 3D RPN initialized from the idispnet checkpoint.
set -e
cd "$(dirname "$0")/../.."
python tools/test_net.py --config-file configs/kitti/cyclist/idispnet.yaml \
    --dataset kitti_train_cyclist $IDISP_ARGS
python tools/test_net.py --config-file configs/kitti/cyclist/idispnet.yaml \
    --dataset kitti_val_cyclist $IDISP_ARGS
python tools/train_net.py --config-file configs/kitti/cyclist/rpn.yaml \
    "$@" MODEL.WEIGHT models/kitti/cyclist/idispnet/ckpt
