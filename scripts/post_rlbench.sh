#!/usr/bin/env bash
# Stage 3 — post-training with future multisensory generation heads
# (reference scripts/post_rlbench.sh): gen_image + ROI + gen_pointcloud.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data/rlds}
python scripts/train.py \
  --vla.type prism-dinosiglip-224px+oxe+diffusion \
  --data_root_dir "$DATA_ROOT" \
  --data_mix rlbench --camera_name rlbench_front \
  --freeze_vision_tower true \
  --use_diff true --use_pointcloud true --use_contrastive true \
  --use_generation true --gen_image true --use_roi true --gen_pointcloud true \
  --learning_rate 2e-5 --global_batch_size 64 --per_device_batch_size 8 \
  "$@"
