"""Mesh extraction CLI (reference tools/extract_mesh.py:104-168,
scripts/sdf_extract.sh:13-18).

Usage:
    python -m neuralrecon_w_tpu.tools.extract_mesh_cli \
        --cfg_path config/train_X.yaml --ckpt_path results/X/checkpoints/step_N \
        --mesh_size 1024 --eval_level 10 --vertex_color

Multi-device sharding replaces the reference's
torch.distributed.launch: the SDF sweep is sharded across the mesh
automatically.
"""

from __future__ import annotations

import argparse
import os


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--mesh_size", type=int, default=1024,
                        help="dense grid dim when no eval_level given")
    parser.add_argument("--chunk", type=int, default=102144)
    parser.add_argument("--mesh_radius", type=float, default=1.0)
    parser.add_argument("--mesh_origin", type=str, default="0,0,0")
    parser.add_argument("--vertex_color", action="store_true")
    parser.add_argument("--eval_level", type=int, default=-1,
                        help=">0: sparse SFM-grid extraction at this level")
    parser.add_argument("--a_index", type=int, default=1123,
                        help="appearance embedding index for colors")
    parser.add_argument("--out", type=str, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = get_opts(argv)

    import numpy as np

    from ..config import get_cfg_defaults
    from ..datasets.phototourism import load_scene_config
    from ..datasets.colmap import read_points3d_binary
    from ..extraction import (
        dense_eval_grid, extract_mesh, save_mesh_ply, sparse_eval_grid,
    )
    from ..models.neuconw import field_config_from_cfg
    from ..parallel.mesh import make_mesh
    from ..training.checkpoint import load_params_subtree

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.cfg_path)
    root = cfg.DATASET.ROOT_DIR
    scene_config = load_scene_config(root)
    origin = np.asarray(scene_config["origin"], np.float64)
    radius = float(scene_config["radius"])

    fc = field_config_from_cfg(cfg)
    params = load_params_subtree(args.ckpt_path)
    mesh_dev = make_mesh()

    if args.eval_level > 0:
        pts3d = read_points3d_binary(
            os.path.join(root, "dense/sparse/points3D.bin")
        )
        grid = sparse_eval_grid(scene_config, pts3d, args.eval_level)
    else:
        sphere_origin = origin + np.asarray(
            [float(v) for v in args.mesh_origin.split(",")]
        )
        grid = dense_eval_grid(sphere_origin, radius * args.mesh_radius,
                               args.mesh_size)

    mesh = extract_mesh(params, fc, grid, origin, radius, chunk=args.chunk,
                        mesh=mesh_dev, with_color=args.vertex_color,
                        a_index=args.a_index)
    if mesh is None:
        print("empty surface; no mesh written")
        return None
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(args.ckpt_path)),
        f"extracted_mesh_level_{max(args.eval_level, 0)}"
        + ("_colored" if args.vertex_color else "") + ".ply",
    )
    save_mesh_ply(mesh, out)
    print(f"wrote {out}: {len(mesh.verts)} verts, {len(mesh.faces)} faces")
    return out


if __name__ == "__main__":
    main()
