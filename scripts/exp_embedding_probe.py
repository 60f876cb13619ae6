"""Probe: do the learned appearance embeddings encode the injected
per-image photometric jitter?

The wild-ablation fixture (testing/synthetic.py, appearance_jitter>0)
perturbs each image with a per-channel color gain and an exposure
factor drawn from a per-image RNG. On a fixture where every train view
has a unique camera direction, train PSNR alone cannot separate
"embedding absorbed the jitter" from "view-dependent color head
memorized it" — so this probe checks the mechanism directly, the same
way NeRF-W appearance interpolation demos do: render the SAME surface
points with the SAME view direction under EACH image's embedding and
correlate the rendered color with that image's injected gain
(reference appearance table: lightning_modules/neuconw_system.py:74-78).

Usage (after scripts/exp_wild_ablation.py):
    python scripts/exp_embedding_probe.py \
        --ckpt /tmp/wild3/jitter_encode_a/checkpoints/step_N \
        --n_images 26 --n_test 2 --seed 0 --jitter 0.35

Prints one JSON line: per-channel Pearson r between log(rendered
color) and log(injected gain), across train images.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--cfg_path", type=str, default=None,
                    help="training YAML; defaults to flagship synthetic cfg")
    ap.add_argument("--n_images", type=int, default=26)
    ap.add_argument("--n_test", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jitter", type=float, default=0.35)
    ap.add_argument("--n_points", type=int, default=2048)
    args = ap.parse_args(argv)

    from neuralrecon_w_tpu.config import get_cfg_defaults
    from neuralrecon_w_tpu.models.neuconw import field_config_from_cfg
    from neuralrecon_w_tpu.parallel.mesh import make_mesh
    from neuralrecon_w_tpu.testing import embedding_gain_correlation
    from neuralrecon_w_tpu.training.checkpoint import load_params_subtree

    cfg = get_cfg_defaults()
    if args.cfg_path:
        cfg.merge_from_file(args.cfg_path)
    params = load_params_subtree(args.ckpt)
    fc = field_config_from_cfg(cfg)

    out = embedding_gain_correlation(
        params, fc, n_images=args.n_images, n_test=args.n_test,
        seed=args.seed, jitter=args.jitter, n_points=args.n_points,
        mesh=make_mesh(),
    )
    out = {k: (round(v, 3) if isinstance(v, float)
               else [round(x, 3) for x in v] if isinstance(v, list)
               else v)
           for k, v in out.items()}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
