#!/bin/bash
# Stage 4: PointRCNN 3D RCNN training (reference scripts/car/pob/train_rcnn.sh):
# the RPN stage's weights seed the RCNN stage (iteration reset = fresh
# optimizer, MODEL.WEIGHT instead of the reference's ckpt file copy).
set -e
cd "$(dirname "$0")/../../.."
python tools/train_net.py --config-file configs/kitti/car/pob/rcnn.yaml \
    "$@" MODEL.WEIGHT models/kitti/car/pob/rpn/ckpt
