#!/usr/bin/env bash
# Stage 1 — multimodal pretraining (reference scripts/pretrain.sh flag matrix):
# all towers trainable, contrastive alignment on, diffusion head on.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data/rlds}
python scripts/train.py \
  --vla.type prism-dinosiglip-224px+oxe+diffusion \
  --data_root_dir "$DATA_ROOT" \
  --use_diff true --use_pointcloud true --use_contrastive true \
  --use_generation false \
  --learning_rate 2e-5 --global_batch_size 64 --per_device_batch_size 8 \
  "$@"
