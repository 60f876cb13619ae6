#!/bin/bash
# Fetch ADE20K semantic-segmentation weights for semantic-map prep
# (reference scripts/download_sem_model.sh, which wgets the
# mmsegmentation DeepLabV3-R101 checkpoint).
#
# This build's backend (tools/prepare_data/prepare_semantic_maps.py
# --backend segformer) consumes any HuggingFace `transformers`
# SegFormer ADE20K checkpoint directory saved with save_pretrained().
# Run this on a machine WITH network access; in a zero-egress sandbox
# it exits with instructions (the prep tool falls back to
# --backend constant so the .npz pipeline still runs end-to-end).
#
# Usage: scripts/download_sem_model.sh [out_dir] [model_id]
set -e

OUT_DIR=${1:-weights/segformer-ade}
MODEL_ID=${2:-nvidia/segformer-b4-finetuned-ade-512-512}

python - "$OUT_DIR" "$MODEL_ID" <<'EOF'
import sys

out_dir, model_id = sys.argv[1], sys.argv[2]
try:
    from transformers import (
        SegformerForSemanticSegmentation, SegformerImageProcessor,
    )

    model = SegformerForSemanticSegmentation.from_pretrained(model_id)
    proc = SegformerImageProcessor.from_pretrained(model_id)
    model.save_pretrained(out_dir)
    proc.save_pretrained(out_dir)
    print(f"saved {model_id} to {out_dir}")
    print(f"use: prepare_semantic_maps.py --backend segformer "
          f"--weights {out_dir}")
except Exception as e:  # zero-egress sandbox / no network
    print(f"could not fetch {model_id}: {e}", file=sys.stderr)
    print("This environment has no network egress. On a connected "
          "machine, run this script and copy the directory here; "
          "then pass it via --weights. Without weights, "
          "prepare_semantic_maps.py --backend constant keeps the "
          ".npz pipeline runnable.", file=sys.stderr)
    sys.exit(1)
EOF
