#!/usr/bin/env bash
# Train the learned planner (mirrors scripts/train_planner.sh).
set -euo pipefail
DATA=${1:-data/forest}
OUT=${2:-runs/exp1}
python -m dgpmp2_tpu.learn.train_planner \
  --dataset_folders "$DATA" --out_folder "$OUT" \
  --plan_param_file dgpmp2_tpu/configs/gpmp2_2d_params.yaml \
  --robot_param_file dgpmp2_tpu/configs/robot_2d.yaml \
  --env_param_file dgpmp2_tpu/configs/env_2d_params.yaml \
  --learn_param_file dgpmp2_tpu/configs/learn_params.yaml
