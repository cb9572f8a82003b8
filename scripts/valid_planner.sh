#!/usr/bin/env bash
# Evaluate a trained planner on the validation split (mirrors scripts/valid_planner.sh).
set -euo pipefail
DATA=${1:-data/forest}
MODEL=${2:-runs/exp1}
python -m dgpmp2_tpu.learn.test_planner \
  --dataset_folders "$DATA" --model_folder "$MODEL" \
  --out_file "$MODEL/results.yaml" \
  --plan_param_file dgpmp2_tpu/configs/gpmp2_2d_params.yaml \
  --robot_param_file dgpmp2_tpu/configs/robot_2d.yaml \
  --env_param_file dgpmp2_tpu/configs/env_2d_params.yaml \
  --learn_param_file dgpmp2_tpu/configs/learn_params.yaml
