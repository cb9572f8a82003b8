#!/usr/bin/env bash
# Train the trajectory-initializer network (mirrors scripts/train_init_network.sh).
set -euo pipefail
DATA=${1:-data/forest}
OUT=${2:-runs/init}
python -m dgpmp2_tpu.learn.train_initializer \
  --dataset_folders "$DATA" --out_folder "$OUT" --epochs 20
