"""Ablation: does the "W" machinery actually work end-to-end?

Trains the synthetic scene under in-the-wild corruptions and reports
what the NeRF-W components buy (VERDICT r01 "Prove the W in NeuS-W"):

  * appearance: per-image photometric jitter, ENCODE_A on vs off
    -> the embedding should absorb the variation (train PSNR delta)
  * transients: painted person-labeled occluders, RAY_MASK_LIST
    ['person'] vs None -> masking should protect geometry (F-score of
    the occluded+masked run ~ the clean run)

Run on the 8-virtual-CPU mesh:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/exp_wild_ablation.py --steps 500

Prints one JSON line per run plus a final summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def build_scene(root, **kw):
    from neuralrecon_w_tpu.testing import make_synthetic_scene
    from neuralrecon_w_tpu.tools.prepare_data.prepare_data_cache import main as cache_main

    # resumable: skip rebuilding if the ray cache already exists;
    # reconstruct the metadata run_one needs from the on-disk config
    if os.path.exists(
        os.path.join(root, "cache_sgs", "splits", "rays1_meta_info.json")
    ):
        import yaml

        with open(os.path.join(root, "config.yaml")) as fh:
            scene_config = yaml.safe_load(fh)
        return {"scene_config": scene_config, "sphere_radius": 1.0}
    os.makedirs(root, exist_ok=True)
    info = make_synthetic_scene(
        root, n_images=26, n_test=2, img_wh=(64, 48), n_points=600, **kw
    )
    cache_main(["--root_dir", root, "--split_to_chunks", "8"])
    return info


def write_cfg(path, root, encode_a=True, ray_mask=None, steps_update=500,
              dtype=None, tpu=None, neuconw=None, device_pool=True,
              scan_inner=20):
    import yaml

    # the proven synthetic-convergence recipe (exp_synth_convergence.py:
    # flagship 8x512 nets, F@0.05 0.9965 at 3000 steps) + the W axes
    cfg = {
        "NEUCONW": {
            "N_SAMPLES": 8, "N_IMPORTANCE": 16, "UP_SAMPLE_STEP": 2,
            "N_OUTSIDE": 4, "BOUNDARY_SAMPLES": 10, "S_VAL_BASE": 3,
            "SAMPLE_RANGE": 8, "N_VOCAB": 32, "ANNEAL_END": 2000,
            "UPDATE_FREQ": steps_update, "TRAIN_VOXEL_SIZE": 0.08,
            "SDF_THRESHOLD": 0.0, "NEAR_FAR_OVERRIDE": True,
            "ENCODE_A": bool(encode_a),
            "RAY_MASK_LIST": ray_mask,
            "MESH_MASK_LIST": ["sky"],
            "DEPTH_LOSS": True,
            # reference-style anchoring; igr 0.1 level-shifts the SDF
            # all-negative on this fixture (BENCHMARKS.md quality table)
            "LOSS": {"depth_weight": 1.0, "igr_weight": 0.001},
        },
        "DATASET": {
            "ROOT_DIR": root,
            "DATASET_NAME": "phototourism",
            "PHOTOTOURISM": {"IMG_DOWNSCALE": 1},
        },
        "TRAINER": {"SAVE_FREQ": 100000, "VAL_FREQ": 1e9,
                    "CANONICAL_LR": 5e-4, "CANONICAL_BS": 2048},
    }
    cfg["NEUCONW"].update(neuconw or {})
    # production TPU dispatch: HBM-resident pool + scan-fused steps.
    # Per-step host dispatch over the tunnel costs ~90 ms latency each,
    # turning a 3000-step run into 20+ min of wall clock; the scan loop
    # is what production training runs anyway. NOTE: scan dispatch was
    # adopted in round 3 — pre-round-3 published cells of this script
    # ran per-step dispatch (protocol difference for ablation
    # comparability). Pass device_pool=False to restore it.
    # SCAN_INNER x batch must fit the ~74k-ray synthetic pool; main()
    # computes scan_inner from --batch so large batches can't silently
    # overrun the pool.
    tpu_node = {"DEVICE_POOL": bool(device_pool), "SCAN_INNER": int(scan_inner)}
    tpu_node.update(tpu or {})
    if dtype:
        tpu_node["FIELD_DTYPE"] = dtype
    cfg["TPU"] = tpu_node
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run_one(tag, cfg_path, scene_info, steps, save_dir, batch=2048,
            test_batch=512):
    # resumable: a finished run leaves result.json behind
    res_path = os.path.join(save_dir, tag, "result.json")
    if os.path.exists(res_path):
        out = json.load(open(res_path))
        print(json.dumps(out), flush=True)
        return out

    from neuralrecon_w_tpu.tools.train_cli import main as train_main
    from neuralrecon_w_tpu.tools.extract_mesh_cli import main as extract_main
    from neuralrecon_w_tpu.evaluation import eval_mesh
    from neuralrecon_w_tpu.training import latest_checkpoint
    from neuralrecon_w_tpu.utils.ply import write_ply

    trainer = train_main([
        "--cfg_path", cfg_path, "--batch_size", str(batch),
        "--test_batch_size", str(test_batch), "--num_epochs", "1000",
        "--max_steps", str(steps), "--exp_name", tag, "--save_dir", save_dir,
    ])

    # mean train PSNR over the last quarter of logged steps
    log = os.path.join(save_dir, tag, "logs", "metrics.jsonl")
    rows = [json.loads(l) for l in open(log)]
    psnrs = [r["psnr"] for r in rows if "psnr" in r]
    tail = psnrs[-max(len(psnrs) // 4, 1):]
    psnr = float(np.mean(tail)) if tail else float("nan")

    ck = latest_checkpoint(os.path.join(save_dir, tag, "checkpoints"))
    mesh_path = os.path.join(save_dir, tag, "mesh.ply")
    extract_main([
        "--cfg_path", cfg_path, "--ckpt_path", ck,
        "--mesh_size", "128", "--chunk", "65536", "--out", mesh_path,
    ])
    if not os.path.exists(mesh_path):
        out = {"run": tag, "psnr": round(psnr, 2), "f05": 0.0, "f10": 0.0,
               "f20": 0.0, "dist_pred2gt": float("inf"),
               "dist_gt2pred": float("inf"), "degenerate": True}
        json.dump(out, open(res_path, "w"))
        print(json.dumps(out), flush=True)
        return out

    rs = np.random.RandomState(0)
    v = rs.randn(4000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    gt_path = os.path.join(save_dir, tag, "gt.ply")
    write_ply(gt_path, v * scene_info["sphere_radius"])
    res = eval_mesh(mesh_path, gt_path, scene_info["scene_config"],
                    is_mesh=True, threshold=[0.05, 0.1, 0.2],
                    save_name=tag, write_visualizations=False)
    from neuralrecon_w_tpu.evaluation.eval_mesh import load_eval_points
    from neuralrecon_w_tpu.evaluation.geometry import nn_distances

    vp, vt = load_eval_points(mesh_path, gt_path, scene_info["scene_config"],
                              True, "eval_bbx")
    _, d_gt2pred = nn_distances(vt, vp)
    _, d_pred2gt = nn_distances(vp, vt)
    out = {
        "run": tag, "psnr": round(psnr, 2),
        "f05": round(res["fscores"][0], 3),
        "f10": round(res["fscores"][1], 3),
        "f20": round(res["fscores"][2], 3),
        "dist_pred2gt": round(float(np.mean(d_pred2gt)), 4),
        "dist_gt2pred": round(float(np.mean(d_gt2pred)), 4),
    }
    json.dump(out, open(res_path, "w"))
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out_dir", type=str, default=None)
    ap.add_argument("--jitter", type=float, default=0.35)
    ap.add_argument("--dtype", type=str, default=None,
                    help="TPU.FIELD_DTYPE override (e.g. bfloat16); the "
                         "default config trains f32 — the bf16-vs-f32 "
                         "quality comparison in BENCHMARKS.md runs this "
                         "script once per dtype")
    ap.add_argument("--batch", type=int, default=2048,
                    help="ray batch (LR follows the linear-scaling rule "
                         "via TRAINER.CANONICAL_BS); 8192 validates the "
                         "headline bench's operating point")
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of run tags to execute (default all)")
    args = ap.parse_args()

    # SCAN_INNER x batch must fit the ~74k-ray synthetic pool
    scan_inner = max(1, min(20, 73_000 // args.batch))
    base = args.out_dir or tempfile.mkdtemp(prefix="wild_ablation_")
    os.makedirs(base, exist_ok=True)
    print(f"workdir: {base}", file=sys.stderr)

    results = {}
    only = set(args.only.split(",")) if args.only else None

    def want(tag):
        return only is None or tag in only

    # clean reference scene
    clean_root = os.path.join(base, "scene_clean")
    if want("clean"):
        info_c = build_scene(clean_root, seed=0)
        cfg_c = write_cfg(os.path.join(base, "cfg_clean.yaml"), clean_root,
                          dtype=args.dtype, scan_inner=scan_inner)
        results["clean"] = run_one("clean", cfg_c, info_c, args.steps, base,
                                   batch=args.batch)

    # appearance: jittered scene, embedding on vs off
    jit_root = os.path.join(base, "scene_jitter")
    if want("jitter_encode_a") or want("jitter_no_a"):
        info_j = build_scene(jit_root, seed=0, appearance_jitter=args.jitter)
        cfg_a1 = write_cfg(os.path.join(base, "cfg_a1.yaml"), jit_root,
                           encode_a=True, dtype=args.dtype, scan_inner=scan_inner)
        cfg_a0 = write_cfg(os.path.join(base, "cfg_a0.yaml"), jit_root,
                           encode_a=False, dtype=args.dtype, scan_inner=scan_inner)
        if want("jitter_encode_a"):
            results["jitter_encode_a"] = run_one(
                "jitter_encode_a", cfg_a1, info_j, args.steps, base,
                batch=args.batch)
        if want("jitter_no_a"):
            results["jitter_no_a"] = run_one(
                "jitter_no_a", cfg_a0, info_j, args.steps, base,
                batch=args.batch)

    # transients: occluded scene, ray mask on vs off
    occ_root = os.path.join(base, "scene_occluded")
    if want("occluded_masked") or want("occluded_unmasked"):
        info_o = build_scene(occ_root, seed=0, transient_occluders=True)
        cfg_t1 = write_cfg(os.path.join(base, "cfg_t1.yaml"), occ_root,
                           ray_mask=["person"], dtype=args.dtype, scan_inner=scan_inner)
        cfg_t0 = write_cfg(os.path.join(base, "cfg_t0.yaml"), occ_root,
                           dtype=args.dtype, scan_inner=scan_inner)
        if want("occluded_masked"):
            results["occluded_masked"] = run_one(
                "occluded_masked", cfg_t1, info_o, args.steps, base,
                batch=args.batch)
        if want("occluded_unmasked"):
            results["occluded_unmasked"] = run_one(
                "occluded_unmasked", cfg_t0, info_o, args.steps, base,
                batch=args.batch)

    print("\n== summary ==")
    hdr = ["run", "psnr", "f05", "f10", "f20", "dist_pred2gt", "dist_gt2pred"]
    print("\t".join(hdr))
    for k in ("clean", "jitter_encode_a", "jitter_no_a",
              "occluded_masked", "occluded_unmasked"):
        if k in results:
            r = results[k]
            print("\t".join(str(r[h]) for h in hdr))
    with open(os.path.join(base, "summary.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
