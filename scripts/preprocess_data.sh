#!/bin/bash
# COLMAP output -> training workspace, end to end
# (reference scripts/preprocess_data.sh): convert + semantic maps +
# split + ray cache.
# Usage: scripts/preprocess_data.sh <colmap_src> <dest_root> [semantic_backend]
set -euo pipefail
SRC=$1
DEST=$2
BACKEND=${3:-constant}
NUM_TEST=${4:-10}

python -m neuralrecon_w_tpu.tools.pre_process --src "$SRC" --dest "$DEST"
SCENE_DIR=$(ls -d "$DEST"/*/ | head -1)

python -m neuralrecon_w_tpu.tools.prepare_data.prepare_semantic_maps \
  --root_dir "$SCENE_DIR" --backend "$BACKEND"

python -m neuralrecon_w_tpu.tools.prepare_data.prepare_data_split \
  --root_dir "$SCENE_DIR" --num_test "$NUM_TEST" --roi_threshold 0 --static_threshold 0.6

python -m neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache \
  --root_dir "$SCENE_DIR" --split_to_chunks 64
