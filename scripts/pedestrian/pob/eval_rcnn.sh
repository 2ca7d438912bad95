#!/bin/bash
# Full-pipeline evaluation (reference scripts/pedestrian/pob/eval_rcnn.sh):
# offline 2D preds -> iDispNet -> PointRCNN -> KITTI txt (+ AP if --evaluate).
set -e
cd "$(dirname "$0")/../../.."
python tools/test_net.py --config-file configs/kitti/pedestrian/pob/rcnn.yaml "$@"
