"""Novel-view rendering CLI: images from a trained checkpoint.

The reference renders images only inside validation
(reference lightning_modules/neuconw_system.py:404-430) and hardcodes
appearance embedding 1123 for mesh vertex colors
(reference tools/extract_mesh.py:146); it ships no user-facing render
tool. This CLI exposes the NeRF-W appearance machinery directly:

- render any dataset view from a checkpoint (color / depth / normal),
- override the per-image appearance embedding (``--a_index``),
- interpolate appearance between two images' embeddings — the NeRF-W
  "appearance interpolation" capability (Martin-Brualla et al.) — with
  an optional simultaneous camera-pose flythrough (``--pose_interp``).

Usage:
    python -m neuralrecon_w_tpu.tools.render_cli \
        --cfg_path config/train_brandenburg_gate.yaml \
        --ckpt_path results/bg/checkpoints/step_100000 \
        --img_ids 10,42 --out_dir renders/

    # appearance sweep between image 10's and image 42's embeddings,
    # camera moving from view 10 to view 42:
    python -m neuralrecon_w_tpu.tools.render_cli \
        --cfg_path ... --ckpt_path ... \
        --a_interp 10,42 --frames 12 --pose_interp --out_dir renders/
"""

from __future__ import annotations

import argparse
import os


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--out_dir", type=str, default="renders")
    parser.add_argument("--img_ids", type=str, default="",
                        help="comma list of dataset image ids; default: "
                             "the first train image")
    parser.add_argument("--img_downscale", type=int, default=-1,
                        help="render resolution divisor; default "
                             "max(8, DATASET downscale) like validation")
    parser.add_argument("--chunk", type=int, default=512,
                        help="rays per device call (--test_batch_size)")
    parser.add_argument("--a_index", type=int, default=-1,
                        help=">=0: render every view under this single "
                             "appearance embedding instead of its own")
    parser.add_argument("--a_interp", type=str, default="",
                        help="'I,J': interpolate appearance embeddings "
                             "between images I and J over --frames")
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--pose_interp", action="store_true",
                        help="with --a_interp: also move the camera from "
                             "view I to view J (slerp rotation)")
    parser.add_argument("--gif", action="store_true",
                        help="with --a_interp: also write an animated "
                             "GIF of the frames (ping-pong loop)")
    parser.add_argument("--gif_ms", type=int, default=120,
                        help="GIF frame duration in milliseconds")
    parser.add_argument("--dispatch", choices=["scan", "chunk"],
                        default="scan",
                        help="'scan' (default) renders a whole frame as "
                             "ONE device dispatch (lax.scan over chunk "
                             "tiles — the serving path; amortizes the "
                             "~90 ms per-dispatch transport latency); "
                             "'chunk' keeps the host-side chunk loop "
                             "(reference validation behavior, also used "
                             "automatically on a multi-device mesh)")
    return parser.parse_args(argv)


def _slerp_pose(p0, p1, t):
    """Interpolate two (3, 4) c2w poses: slerp rotation, lerp center."""
    import numpy as np
    from scipy.spatial.transform import Rotation, Slerp

    rots = Rotation.from_matrix(np.stack([p0[:, :3], p1[:, :3]]))
    r = Slerp([0.0, 1.0], rots)(t).as_matrix()
    c = (1.0 - t) * p0[:, 3] + t * p1[:, 3]
    return np.concatenate([r, c[:, None]], axis=1).astype(np.float32)


def _rays_for_pose(K, c2w, wh, near, far):
    """(N, 10) render-layout rays [o, d, near, far, depth=0, weight=0]
    for an arbitrary camera (layout of datasets/phototourism.py
    build_image_rays minus the ts/semantic columns)."""
    import numpy as np

    from ..datasets.rays import get_ray_directions, get_rays

    w, h = wh
    directions = get_ray_directions(h, w, K)
    rays_o, rays_d = get_rays(directions, c2w)
    n = len(rays_o)
    return np.concatenate(
        [rays_o.astype(np.float32), rays_d.astype(np.float32),
         np.full((n, 1), near, np.float32), np.full((n, 1), far, np.float32),
         np.zeros((n, 2), np.float32)], axis=1)


def _save_frame(out_dir, name, out):
    import numpy as np
    from PIL import Image as PILImage

    from ..training.validation import visualize_depth

    os.makedirs(out_dir, exist_ok=True)
    color = (np.clip(out["color"], 0, 1) * 255).astype(np.uint8)
    PILImage.fromarray(color).save(os.path.join(out_dir, f"{name}.png"))
    PILImage.fromarray(visualize_depth(out["depth"])).save(
        os.path.join(out_dir, f"{name}_depth.png"))
    nrm = out["normal"]
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    PILImage.fromarray(((nrm * 0.5 + 0.5) * 255).astype(np.uint8)).save(
        os.path.join(out_dir, f"{name}_normal.png"))


def main(argv=None):
    args = get_opts(argv)

    import numpy as np

    from ..config import get_cfg_defaults
    from ..models.neuconw import field_config_from_cfg
    from ..ops.ray_voxel import device_grid_from_host as make_device_grid
    from ..rendering.renderer import render_config_from_cfg
    from ..training.checkpoint import restore_checkpoint
    from ..training.step import make_render_fn, make_scan_render_fn
    from ..training.validation import render_image
    from ..utils.scene import load_scene_bundle, val_downscale

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.cfg_path)
    ds = args.img_downscale if args.img_downscale > 0 else val_downscale(cfg)
    meta, scene, sfm_grid, sfm_dgrid = load_scene_bundle(cfg, ds)

    import jax.numpy as jnp

    restored = restore_checkpoint(args.ckpt_path, None)
    params = restored["params"]
    fine_dgrid, fine_level = None, -1
    if "fine_grid" in restored:
        fine_dgrid = make_device_grid(restored["fine_grid"])
        fine_level = restored["fine_grid"].level

    fc = field_config_from_cfg(cfg)
    rcfg = render_config_from_cfg(
        cfg, sfm_level=sfm_grid.level, fine_level=fine_level,
        nerf_far_override=bool(cfg.NEUCONW.NEAR_FAR_OVERRIDE))
    render_chunk = make_render_fn(fc, rcfg)

    # shard each chunk's rays over all visible chips (no-op on one)
    from ..parallel.mesh import DATA_AXIS, make_mesh

    mesh = make_mesh()
    if args.chunk % int(mesh.shape.get(DATA_AXIS, 1)):
        print(f"# chunk {args.chunk} not divisible by "
              f"{mesh.shape[DATA_AXIS]} devices; rendering single-device")
        mesh = None
    scan_render = None
    if args.dispatch == "scan" and (
            mesh is None or int(mesh.shape.get(DATA_AXIS, 1)) == 1):
        scan_render = make_scan_render_fn(fc, rcfg, args.chunk)

    def render_view(pars, rays10, ts, wh, name):
        labels = np.zeros((len(rays10),), np.int32)
        out = render_image(render_chunk, pars, scene, rays10, ts, labels,
                           wh, args.chunk, fine_dgrid, sfm_dgrid, mesh=mesh,
                           scan_render=scan_render)
        _save_frame(args.out_dir, name, out)
        print(f"wrote {args.out_dir}/{name}.png ({wh[0]}x{wh[1]})")

    if args.a_interp:
        i, j = (int(x) for x in args.a_interp.split(","))
        table = np.asarray(params["embedding_a"])
        for idx in (i, j):
            if not (0 <= idx < len(table)) or idx not in meta.poses:
                raise SystemExit(
                    f"--a_interp index {idx} is not a dataset image id "
                    f"within N_VOCAB {len(table)}; choose ids from the "
                    "scene tsv")
        e_i, e_j = table[i].copy(), table[j].copy()
        from ..datasets.phototourism import build_image_rays, load_image

        # base camera: view i (or interpolated when --pose_interp; the
        # dataset ray build incl. its SFM depth raster is skipped then)
        K = meta.Ks[i]
        h, w = load_image(meta, i).shape[:2]
        if not args.pose_interp:
            rays_i, _ = build_image_rays(meta, i, with_semantics=False)
        near = float(min(meta.nears[i], meta.nears[j]))
        far = float(max(meta.fars[i], meta.fars[j]))
        for k in range(args.frames):
            t = k / max(args.frames - 1, 1)
            blend = ((1.0 - t) * e_i + t * e_j).astype(table.dtype)
            pars_t = dict(params)
            pars_t["embedding_a"] = jnp.asarray(table).at[0].set(
                jnp.asarray(blend))
            if args.pose_interp:
                c2w = _slerp_pose(np.asarray(meta.poses[i], np.float64),
                                  np.asarray(meta.poses[j], np.float64), t)
                rays10 = _rays_for_pose(K, c2w, (w, h), near, far)
            else:
                rays10 = np.concatenate(
                    [rays_i[:, :8], rays_i[:, 9:11]], axis=1)
            ts = np.zeros((len(rays10),), np.int32)
            render_view(pars_t, rays10, ts, (w, h),
                        f"interp_{i}_{j}_{k:03d}")
        if args.gif:
            from PIL import Image as PILImage

            frames = [
                PILImage.open(os.path.join(
                    args.out_dir, f"interp_{i}_{j}_{k:03d}.png")).convert("P")
                for k in range(args.frames)
            ]
            seq = frames + frames[-2:0:-1]  # ping-pong loop
            gif_path = os.path.join(args.out_dir, f"interp_{i}_{j}.gif")
            seq[0].save(gif_path, save_all=True, append_images=seq[1:],
                        duration=args.gif_ms, loop=0)
            print(f"wrote {gif_path} ({len(seq)} frames)")
        return

    if args.img_ids:
        ids = [int(x) for x in args.img_ids.split(",")]
    else:
        ids = [meta.img_ids_train[0]]
    from ..datasets.phototourism import build_image_rays, load_image

    a_index = args.a_index
    if a_index >= fc.n_vocab:
        print(f"# appearance index {a_index} >= N_VOCAB {fc.n_vocab}; "
              "clamping")
        a_index = fc.n_vocab - 1
    for id_ in ids:
        img = load_image(meta, id_)
        h, w = img.shape[:2]
        rays, _ = build_image_rays(meta, id_, with_semantics=False)
        rays10 = np.concatenate([rays[:, :8], rays[:, 9:11]], axis=1)
        ts = (np.full((len(rays10),), a_index, np.int32)
              if a_index >= 0 else rays[:, 8].astype(np.int32))
        render_view(params, rays10, ts, (w, h), f"view_{id_}")


if __name__ == "__main__":
    main()
