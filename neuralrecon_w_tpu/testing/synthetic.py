"""Synthetic COLMAP workspace generator for end-to-end tests.

Builds a complete phototourism-style scene around an analytic sphere:
posed pinhole cameras on a ring, images rendered by ray-sphere
intersection with Lambert shading, COLMAP binary models whose 3D points
sit on the sphere surface with consistent 2D tracks, scene config.yaml,
tsv split, and semantic maps. The reference has no such fixture
(SURVEY.md §4); every subsystem test that needs real files uses this.
"""

from __future__ import annotations

import os

import numpy as np

from ..datasets.colmap import (
    Camera,
    Image,
    Point3D,
    rotmat2qvec,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)


def sphere_sdf(pts: np.ndarray, radius: float = 1.0) -> np.ndarray:
    return np.linalg.norm(pts, axis=-1) - radius


def _look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0.0, 0.0, 1.0])):
    """COLMAP w2c (right-down-front): camera +z looks at target."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # world -> cam rows
    t = -R @ eye
    return R, t


def _render_sphere_image(K, R, t, w, h, radius, light=np.array([0.3, 0.2, 0.9])):
    """Analytic ray-traced sphere on a sky background. Returns (h, w, 3)
    uint8 and the per-pixel hit depth (along-ray, camera frame)."""
    j, i = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs_cam = np.stack(
        [(i - K[0, 2]) / K[0, 0], (j - K[1, 2]) / K[1, 1], np.ones_like(i, float)], -1
    )
    dirs_w = dirs_cam @ R  # R^T == cam->world
    o = (-R.T @ t).reshape(1, 1, 3)
    d = dirs_w / np.linalg.norm(dirs_w, axis=-1, keepdims=True)

    b = 2.0 * np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - radius**2
    disc = b * b - 4 * c
    hit = disc > 0
    t_hit = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, 0.0)
    hit &= t_hit > 0

    pts = o + d * t_hit[..., None]
    n = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    lam = np.clip(n @ (light / np.linalg.norm(light)), 0.1, 1.0)
    base = np.array([0.8, 0.45, 0.3])
    sky = np.array([0.5, 0.65, 0.9])
    img = np.where(hit[..., None], lam[..., None] * base, sky[None, None, :])
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), np.where(hit, t_hit, 0.0), hit


def make_synthetic_scene(
    root_dir: str,
    n_images: int = 8,
    n_test: int = 2,
    img_wh: tuple = (40, 30),
    sphere_radius: float = 1.0,
    cam_dist: float = 3.0,
    n_points: int = 300,
    seed: int = 0,
    scene_name: str | None = None,
    with_semantics: bool = True,
) -> dict:
    """Write a full workspace under root_dir; returns scene metadata."""
    rs = np.random.RandomState(seed)
    w, h = img_wh
    os.makedirs(os.path.join(root_dir, "dense/sparse"), exist_ok=True)
    os.makedirs(os.path.join(root_dir, "dense/images"), exist_ok=True)
    if with_semantics:
        os.makedirs(os.path.join(root_dir, "semantic_maps"), exist_ok=True)
    scene_name = scene_name or os.path.basename(os.path.normpath(root_dir))

    f = 0.8 * w
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    cameras = {1: Camera(1, "PINHOLE", w, h, np.array([f, f, w / 2, h / 2]))}

    # surface points with per-point jitter as "reconstruction error"
    sph = rs.randn(n_points, 3)
    sph /= np.linalg.norm(sph, axis=-1, keepdims=True)
    pts_world = sph * sphere_radius
    pt_err = np.abs(rs.randn(n_points)) * 0.5 + 0.2

    images = {}
    tracks = {pid: ([], []) for pid in range(1, n_points + 1)}
    from PIL import Image as PILImage

    names = []
    for idx in range(n_images):
        ang = 2 * np.pi * idx / n_images
        eye = np.array(
            [np.cos(ang) * cam_dist, np.sin(ang) * cam_dist, 0.6 + 0.2 * np.sin(3 * ang)]
        )
        R, t = _look_at(eye, np.zeros(3))
        img, _, hit = _render_sphere_image(K, R, t, w, h, sphere_radius)
        name = f"img_{idx:03d}.jpg"
        names.append(name)
        PILImage.fromarray(img).save(
            os.path.join(root_dir, "dense/images", name), quality=95
        )
        if with_semantics:
            # pixels that miss the sphere are "sky" (ADE20K id 2) — like
            # real semantic maps, so the mask BCE carves empty space
            sem = np.where(hit, 0, 2).astype(np.int16)
            np.savez_compressed(
                os.path.join(root_dir, "semantic_maps", f"img_{idx:03d}.npz"), sem
            )

        # project points for keypoints/tracks
        cam_pts = (R @ pts_world.T + t[:, None]).T
        z = cam_pts[:, 2]
        uv = (K @ cam_pts.T).T
        uv = uv[:, :2] / uv[:, 2:3]
        vis = (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        # only front-facing points (normal toward camera)
        vis &= np.sum((pts_world - eye) * pts_world, axis=-1) < 0
        xys, p3d_ids = [], []
        img_id = idx + 1
        for pid0 in np.nonzero(vis)[0]:
            xys.append(uv[pid0])
            p3d_ids.append(pid0 + 1)
            tracks[pid0 + 1][0].append(img_id)
            tracks[pid0 + 1][1].append(len(xys) - 1)
        images[img_id] = Image(
            img_id, rotmat2qvec(R), t, 1, name,
            np.asarray(xys).reshape(-1, 2), np.asarray(p3d_ids, np.int64),
        )

    points3d = {}
    for pid in range(1, n_points + 1):
        img_ids, p2d = tracks[pid]
        if not img_ids:
            continue
        points3d[pid] = Point3D(
            pid, pts_world[pid - 1], np.array([128, 128, 128], np.uint8),
            float(pt_err[pid - 1]), np.asarray(img_ids, np.int32),
            np.asarray(p2d, np.int32),
        )

    write_cameras_binary(cameras, os.path.join(root_dir, "dense/sparse/cameras.bin"))
    write_images_binary(images, os.path.join(root_dir, "dense/sparse/images.bin"))
    write_points3d_binary(points3d, os.path.join(root_dir, "dense/sparse/points3D.bin"))

    # tsv split: last n_test images held out
    with open(os.path.join(root_dir, f"{scene_name}.tsv"), "w") as fh:
        fh.write("filename\tid\tsplit\tdataset\n")
        for idx, name in enumerate(names):
            split = "test" if idx >= n_images - n_test else "train"
            fh.write(f"{name}\t{idx}\t{split}\t{scene_name}\n")

    # scene config.yaml (reference README.md:104-118 schema)
    import yaml

    bbx = 1.5 * sphere_radius
    scene_config = {
        "name": scene_name,
        "origin": [0.0, 0.0, 0.0],
        "radius": float(cam_dist * 1.2),
        "eval_bbx": [[-bbx, -bbx, -bbx], [bbx, bbx, bbx]],
        "eval_bbx_detail": [[-bbx / 2, -bbx / 2, -bbx / 2], [bbx / 2, bbx / 2, bbx / 2]],
        "voxel_size": float(sphere_radius / 4),
        "min_track_length": 2,
        "sfm2gt": np.eye(4).tolist(),
    }
    with open(os.path.join(root_dir, "config.yaml"), "w") as fh:
        yaml.safe_dump(scene_config, fh)

    return {
        "scene_config": scene_config,
        "sphere_radius": sphere_radius,
        "n_points": len(points3d),
        "names": names,
    }
