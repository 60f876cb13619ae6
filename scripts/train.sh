#!/bin/bash
# Training launcher (reference scripts/train.sh interface).
# Usage: scripts/train.sh <exp_name> <cfg_path> [n_devices]
#
# On a TPU backend this prefers the sibling <cfg>_tpu.yaml operating-point
# config (bfloat16 activations + quality-ablated BG/boundary budgets —
# the same artifact bench.py measures) when one exists. Set
# NW_TPU_CONFIG=0 to force the parity config, NW_TPU_CONFIG=1 to force
# the _tpu variant without probing the backend.
set -euo pipefail
now=$(date +"%Y%m%d_%H%M%S")
jobname="train-$1-$now"
echo "job name is $jobname"

cfg="$2"
if [[ "$cfg" != *_tpu.yaml ]]; then
  tpu_cfg="${cfg%.yaml}_tpu.yaml"
  if [[ -f "$tpu_cfg" ]]; then
    mode="${NW_TPU_CONFIG:-auto}"
    if [[ "$mode" == auto ]]; then
      # bounded probe: backend init claims the (single-claim) device and
      # can wedge if another process holds it; never hang the launcher.
      # A failed/timed-out probe falls back to the parity config LOUDLY —
      # set NW_TPU_CONFIG=1 explicitly if the probe cannot run.
      backend=$(timeout 240 python -c "import jax; print(jax.default_backend())" 2>/dev/null || echo none)
      if [[ "$backend" == none ]]; then
        echo "WARNING: TPU backend probe failed or timed out; using the" \
             "parity config $cfg (NW_TPU_CONFIG=1 forces $tpu_cfg)" >&2
      fi
      [[ "$backend" == tpu || "$backend" == axon ]] && mode=1 || mode=0
    fi
    if [[ "$mode" == 1 ]]; then
      echo "TPU backend: using operating-point config $tpu_cfg (NW_TPU_CONFIG=0 overrides)"
      cfg="$tpu_cfg"
    fi
  fi
fi

mkdir -p log
python -m neuralrecon_w_tpu.tools.train_cli \
  --cfg_path "$cfg" \
  --n_devices "${3:--1}" \
  --num_epochs 20 \
  --batch_size 2048 \
  --test_batch_size 512 \
  --exp_name "$1" 2>&1 | tee "log/${jobname}.log"
