#!/bin/bash
# Mesh extraction launcher (reference scripts/sdf_extract.sh interface).
# Usage: scripts/sdf_extract.sh <exp_name> <cfg_path> <ckpt_path> <eval_level>
# The SDF sweep shards over every visible device automatically (the
# reference needed torch.distributed.launch --nproc_per_node=4).
set -euo pipefail
now=$(date +"%Y%m%d_%H%M%S")
jobname="sdf-extract-$1-$now"
echo "job name is $jobname"

mkdir -p log
python -m neuralrecon_w_tpu.tools.extract_mesh_cli \
  --cfg_path "$2" \
  --ckpt_path "$3" \
  --eval_level "$4" \
  --mesh_size 1024 \
  --chunk 102144 \
  --vertex_color 2>&1 | tee "log/${jobname}.log"
