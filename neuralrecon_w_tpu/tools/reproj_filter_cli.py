"""Reprojection filter CLI (reference utils/reproj_filter.py:246-300).

Renders the reconstruction from every training camera (DDA voxel
ray-march on device) and keeps geometry observed by >= 1 view; writes
<out>/reprojected.ply.
"""

from __future__ import annotations

import argparse
import os


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_file", type=str, required=True,
                        help="ply to filter (mesh or point cloud)")
    parser.add_argument("--root_dir", type=str, required=True,
                        help="COLMAP workspace (for training cameras)")
    parser.add_argument("--img_downscale", type=int, default=4,
                        help="render resolution divisor")
    parser.add_argument("--voxel_size", type=float, default=None,
                        help="match voxel size; default scene voxel_size")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--workers", type=int, default=0,
                        help="thread-parallel views (mesh mode)")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_opts(argv)
    import numpy as np

    from ..datasets.phototourism import load_scene_meta
    from ..evaluation import reprojection_filter
    from ..utils.ply import read_ply, write_ply

    meta = load_scene_meta(args.root_dir, args.img_downscale)
    cameras = []
    for id_ in meta.img_ids_train:
        K = meta.Ks[id_]
        wh = (int(K[0, 2] * 2), int(K[1, 2] * 2))
        cameras.append((K, meta.poses[id_], wh))

    voxel = args.voxel_size or float(meta.scene_config["voxel_size"])
    data = read_ply(args.src_file)
    verts = data["verts"]
    faces = data.get("faces")
    kept_verts, kept_faces, mask = reprojection_filter(
        verts, faces, cameras, voxel, workers=args.workers
    )
    out_dir = args.out_dir or os.path.dirname(args.src_file)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "reprojected.ply")
    colors = data.get("colors")
    write_ply(out, kept_verts, faces=kept_faces,
              colors=colors[mask] if colors is not None else None)
    print(f"kept {mask.sum()}/{len(mask)} vertices -> {out}")
    return out


if __name__ == "__main__":
    main()
