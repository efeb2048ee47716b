#!/usr/bin/env bash
# Franka post-training with all three generation heads incl. tactile
# (reference scripts/post_franka.sh).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data/rlds}
python scripts/train.py \
  --vla.type prism-dinosiglip-224px+oxe+diffusion \
  --data_root_dir "$DATA_ROOT" \
  --data_mix franka --camera_name franka_front \
  --freeze_vision_tower true \
  --use_diff true --use_pointcloud true --use_contrastive true --use_tactile true \
  --num_extra_views 1 \
  --use_generation true --gen_image true --use_roi true --gen_pointcloud true --gen_tactile true \
  --learning_rate 2e-5 --global_batch_size 64 --per_device_batch_size 8 \
  "$@"
