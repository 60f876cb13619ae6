"""Quality ablation for TPU.BG_SAMPLES (coarse-subset background eval).

The reference evaluates the background NeRF at every sorted foreground
z (reference rendering/renderer.py:157-228) even though the fg/bg merge
masks its contribution to zero at inside-sphere samples — in the steady
surface-guided phase that is most of them. TPU.BG_SAMPLES=K evaluates
at K static coarse positions + the exact N_OUTSIDE tail and expands
piecewise-constant. This script runs the same convergence protocol the
bf16 lever got (exp_wild_ablation.py recipe: flagship nets, clean +
photometric-jitter scenes, 3000 steps) once per BG_SAMPLES setting and
prints the quality table that justifies (or vetoes) flipping the
default.

Run on the chip:
    python scripts/exp_bg_samples_ablation.py --steps 3000 \
        --out_dir /tmp/bg_ablation
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_wild_ablation import build_scene, run_one, write_cfg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out_dir", type=str, default=None)
    ap.add_argument("--jitter", type=float, default=0.35)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--bg_samples", type=str, default="-1,4",
                    help="comma list of TPU.BG_SAMPLES settings")
    ap.add_argument("--boundary_samples", type=str, default="10",
                    help="comma list of NEUCONW.BOUNDARY_SAMPLES settings "
                         "(reference budget is 10; reduced settings are the "
                         "steady-phase fg-sample lever)")
    args = ap.parse_args()

    base = args.out_dir or tempfile.mkdtemp(prefix="bg_ablation_")
    os.makedirs(base, exist_ok=True)
    print(f"workdir: {base}", file=sys.stderr)

    settings = [int(x) for x in args.bg_samples.split(",")]
    boundaries = [int(x) for x in args.boundary_samples.split(",")]
    results = []
    for scene_tag, scene_kw in (("clean", {}),
                                ("jitter", {"appearance_jitter": args.jitter})):
        root = os.path.join(base, f"scene_{scene_tag}")
        info = build_scene(root, seed=0, **scene_kw)
        for k in settings:
            for b in boundaries:
                tag = f"{scene_tag}_bg{k}" + ("" if b == 10 else f"_bd{b}")
                cfg = write_cfg(
                    os.path.join(base, f"cfg_{tag}.yaml"), root,
                    dtype="bfloat16", tpu={"BG_SAMPLES": k},
                    neuconw=None if b == 10 else {"BOUNDARY_SAMPLES": b})
                rec = run_one(tag, cfg, info, args.steps, base,
                              batch=args.batch)
                rec["bg_samples"] = k
                rec["boundary_samples"] = b
                rec["scene"] = scene_tag
                results.append(rec)

    print("\n| scene | BG_SAMPLES | BOUNDARY | psnr | F@0.05 | F@0.1 | d_pred2gt | d_gt2pred |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['scene']} | {r['bg_samples']} | {r['boundary_samples']} "
              f"| {r['psnr']} | {r.get('f05')} | {r.get('f10')} | "
              f"{r.get('dist_pred2gt')} | {r.get('dist_gt2pred')} |")
    with open(os.path.join(base, "summary.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
