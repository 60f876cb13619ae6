#!/bin/bash
# Full geometry evaluation (reference scripts/eval_pipeline.sh):
# reprojection-filter the mesh, then sweep P/R/F thresholds vs GT.
# Usage: scripts/eval_pipeline.sh <scene_name> <mesh_path> <root_dir> <gt_ply>
set -euo pipefail
SCENE=$1
MESH=$2
ROOT=$3
GT=$4

# per-scene eval params (reference scripts/eval_pipeline.sh:22-48)
case $SCENE in
  brandenburg_gate)
    T_START=0.01; T_END=1.0; T_INT=0.01; TL=14; ERR=2; VOX=2 ;;
  lincoln_memorial)
    T_START=0.005; T_END=0.3; T_INT=0.005; TL=12; ERR=1.6; VOX=0.04 ;;
  palacio_de_bellas_artes)
    T_START=0.01; T_END=1.0; T_INT=0.01; TL=12; ERR=1.5; VOX=2 ;;
  pantheon_exterior)
    T_START=0.01; T_END=1.0; T_INT=0.01; TL=12; ERR=1.4; VOX=0.1 ;;
  *)
    T_START=0.01; T_END=1.0; T_INT=0.01; TL=12; ERR=1.5; VOX=0.1 ;;
esac

python -m neuralrecon_w_tpu.tools.reproj_filter_cli \
  --src_file "$MESH" --root_dir "$ROOT"

python -m neuralrecon_w_tpu.tools.eval_mesh_cli \
  --file_pred "$(dirname "$MESH")/reprojected.ply" \
  --file_trgt "$GT" \
  --scene_config "$ROOT/config.yaml" \
  --threshold_start $T_START --threshold_end $T_END --threshold_interval $T_INT \
  --sfm_path "$ROOT/dense/sparse" \
  --track_length $TL --error $ERR --voxel_size $VOX \
  --save_name "$SCENE"
