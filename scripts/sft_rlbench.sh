#!/usr/bin/env bash
# Stage 2 — RLBench SFT (reference scripts/sft_rlbench.sh):
# vision towers frozen, LLM + projectors + diffusion head finetuned.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data/rlds}
python scripts/train.py \
  --vla.type prism-dinosiglip-224px+oxe+diffusion \
  --data_root_dir "$DATA_ROOT" \
  --data_mix rlbench --camera_name rlbench_front \
  --freeze_vision_tower true \
  --use_diff true --use_pointcloud true --use_contrastive true \
  --learning_rate 2e-5 --global_batch_size 64 --per_device_batch_size 8 \
  --epochs 300 \
  "$@"
