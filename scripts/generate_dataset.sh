#!/usr/bin/env bash
# Generate a forest-family training dataset with GPMP2-expert trajectories
# (mirrors the reference's dataset generation workflow).
set -euo pipefail
OUT=${1:-data/forest}
python -m dgpmp2_tpu.data.generate --out_folder "$OUT" --dataset_type forest \
  --num_train 100 --num_test 20 --probs_per_env 2 --im_size 128 --seed_val 0
