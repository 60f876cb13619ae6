"""Ray-cache generation CLI (reference
tools/prepare_data/prepare_data_cache.py:1-210 +
datasets/phototourism.py:539-678).

For every training image: build rays + rgbs, rasterize SFM keypoint
depth/weight, attach the semantic label column, replace near/far by
voxel-band intersection (dropping rays that miss the SFM octree), pad
depth-supervised rays to the target fraction, then write the 64-way
h5 split cache."""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--img_downscale", type=int, default=1)
    parser.add_argument("--semantic_map_path", type=str, default="semantic_maps")
    parser.add_argument("--cache_dir", type=str, default="cache_sgs")
    parser.add_argument("--split_to_chunks", type=int, default=64)
    parser.add_argument("--cache_type", type=str, default="h5",
                        choices=["h5", "npz"])
    parser.add_argument("--depth_percent", type=float, default=-1.0,
                        help="<0: per-scene default (reference hardcodes)")
    parser.add_argument("--no_voxel_filter", action="store_true")
    parser.add_argument("--no_semantics", action="store_true")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_opts(argv)
    from ...datasets.cache import write_ray_cache
    from ...datasets.phototourism import (
        SCENE_DEFAULTS,
        apply_voxel_near_far,
        build_image_rays,
        load_scene_meta,
        oversample_depth_rays,
    )

    scene = os.path.basename(os.path.normpath(args.root_dir))
    defaults = SCENE_DEFAULTS.get(scene, {})
    depth_percent = (
        args.depth_percent if args.depth_percent >= 0
        else defaults.get("depth_percent", 0.0)
    )
    meta = load_scene_meta(args.root_dir, args.img_downscale)
    if not meta.img_ids_train:
        raise SystemExit(
            "no training images in the tsv split (all rows are 'test' or "
            "missing from images.bin) — regenerate the split with a smaller "
            "--num_test"
        )

    rng = np.random.RandomState(0)
    rays_list, rgbs_list = [], []
    for id_ in meta.img_ids_train:
        rays, rgbs = build_image_rays(
            meta, id_, with_semantics=not args.no_semantics,
            semantic_map_path=args.semantic_map_path,
        )
        if not args.no_voxel_filter:
            rays, rgbs = apply_voxel_near_far(rays, rgbs, meta)
        rays, rgbs = oversample_depth_rays(rays, rgbs, depth_percent, rng)
        print(f"image {id_}: {len(rays)} rays")
        rays_list.append(rays)
        rgbs_list.append(rgbs)

    split_root = write_ray_cache(
        rays_list, rgbs_list, args.root_dir, args.cache_dir,
        args.split_to_chunks, args.img_downscale, args.cache_type,
    )
    print(f"cache written to {split_root}")
    return split_root


if __name__ == "__main__":
    main()
