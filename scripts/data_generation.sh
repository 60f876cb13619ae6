#!/bin/bash
# Split + ray-cache generation (reference scripts/data_generation.sh).
# Usage: scripts/data_generation.sh <root_dir>
set -euo pipefail
DATASET_PATH=$1

# the reference only builds the split when no tsv exists yet
# (reference scripts/data_generation.sh:17-22), passing
# static_threshold 0 (the transient filter stays off for the headline
# scenes; the 0.6 default is the tool's, not the pipeline's)
if ! ls "$DATASET_PATH"/*.tsv >/dev/null 2>&1; then
  python -m neuralrecon_w_tpu.tools.prepare_data.prepare_data_split \
    --root_dir "$DATASET_PATH" \
    --num_test 10 \
    --min_observation -1 --roi_threshold 0 --static_threshold 0
fi

python -m neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache \
  --root_dir "$DATASET_PATH" \
  --img_downscale 1 --semantic_map_path semantic_maps \
  --split_to_chunks 64
