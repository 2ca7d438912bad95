#!/bin/bash
# Stage 1: stereo Mask R-CNN 2D training (reference scripts/pedestrian/vob/train_smrcnn.sh).
# Extra args are forwarded (e.g. --max-iter 2 for smoke runs, KEY VALUE overrides).
set -e
cd "$(dirname "$0")/../../.."
python tools/train_net.py --config-file configs/kitti/pedestrian/vob/mask.yaml "$@"
