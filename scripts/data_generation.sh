#!/bin/bash
# Split + ray-cache generation (reference scripts/data_generation.sh).
# Usage: scripts/data_generation.sh <root_dir>
set -euo pipefail
DATASET_PATH=$1

python -m neuralrecon_w_tpu.tools.prepare_data.prepare_data_split \
  --root_dir "$DATASET_PATH" \
  --num_test 10 \
  --min_observation -1 --roi_threshold 0 --static_threshold 0.6

python -m neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache \
  --root_dir "$DATASET_PATH" \
  --img_downscale 1 --semantic_map_path semantic_maps \
  --split_to_chunks 64
