#!/bin/bash
# Training launcher (reference scripts/train.sh interface).
# Usage: scripts/train.sh <exp_name> <cfg_path> [n_devices]
set -euo pipefail
now=$(date +"%Y%m%d_%H%M%S")
jobname="train-$1-$now"
echo "job name is $jobname"

mkdir -p log
python -m neuralrecon_w_tpu.tools.train_cli \
  --cfg_path "$2" \
  --n_devices "${3:--1}" \
  --num_epochs 20 \
  --batch_size 2048 \
  --test_batch_size 512 \
  --exp_name "$1" 2>&1 | tee "log/${jobname}.log"
