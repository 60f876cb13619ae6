"""View selection + transient filtering for split generation.

Numpy-vectorized redesign of the reference filters
(reference tools/prepare_data/dataset_filter_utils.py:98-205):
  * ROI selection: fraction of pixel rays passing within the scene
    sphere (perpendicular distance < radius, and either camera inside
    the sphere or looking toward it),
  * transient filtering: images whose static-class fraction (per the
    ADE20K semantic map) is below threshold are dropped,
  * NIMA aesthetic scoring is an optional hook (the reference ships it
    disabled, prepare_data_split.py:41; it needs pretrained weights).
"""

from __future__ import annotations

import os

import numpy as np

from ...datasets.colmap import read_cameras_binary, read_images_binary
from ...datasets.mask_utils import get_label_id_mapping
from ...datasets.phototourism import intrinsics_from_camera
from ...datasets.rays import get_ray_directions, get_rays

DEFAULT_TRANSIENT_OBJECTS = ["person", "car", "bicycle", "minibike", "tree"]


def roi_percent(rays_o: np.ndarray, rays_d: np.ndarray, origin, radius: float) -> float:
    """Fraction of rays intersecting the scene sphere
    (reference dataset_filter_utils.py:170-181)."""
    origin = np.asarray(origin, np.float64)
    cam2orig = origin - rays_o
    dot = np.sum(cam2orig * rays_d, axis=-1, keepdims=True)
    proj = dot * rays_d
    dist_ray = np.linalg.norm(cam2orig - proj, axis=-1)
    dist_cam = np.linalg.norm(cam2orig, axis=-1)
    in_roi = ((radius > dist_cam) | (dot[:, 0] > 0)) & (dist_ray < radius)
    return float(np.count_nonzero(in_roi) / len(in_roi))


def view_selection(
    root_dir: str,
    scene_origin,
    scene_radius: float,
    roi_threshold: float = 0.5,
    min_observation: int = -1,
    subsample: int = 8,
) -> list:
    """Image names whose ROI fraction passes the threshold
    (reference view_selection, dataset_filter_utils.py:98-185).
    subsample: ray-grid stride — the ROI fraction is resolution
    invariant, so we evaluate on a strided pixel grid."""
    sparse = os.path.join(root_dir, "dense/sparse")
    imdata = read_images_binary(os.path.join(sparse, "images.bin"))
    camdata = read_cameras_binary(os.path.join(sparse, "cameras.bin"))

    keep = []
    for im in imdata.values():
        if min_observation > 0 and len(im.point3D_ids[im.point3D_ids != -1]) < min_observation:
            continue
        K = intrinsics_from_camera(camdata[im.camera_id], 1)
        h, w = int(K[1, 2] * 2), int(K[0, 2] * 2)
        Ks = K.copy()
        Ks[:2] /= subsample
        dirs = get_ray_directions(max(h // subsample, 2), max(w // subsample, 2), Ks)
        R = im.qvec2rotmat()
        t = im.tvec.reshape(3, 1)
        c2w = np.linalg.inv(
            np.concatenate([np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0)
        )[:3]
        c2w = c2w.copy()
        c2w[:, 1:3] *= -1
        rays_o, rays_d = get_rays(dirs, c2w)
        if roi_percent(rays_o, rays_d, scene_origin, scene_radius) >= roi_threshold:
            keep.append(im.name)
    return sorted(keep)


def filter_transient(
    root_dir: str,
    image_names: list,
    semantic_map_path: str = "semantic_maps",
    transient_objects: list | None = None,
    static_threshold: float = 0.6,
) -> list:
    """Drop images dominated by transient classes (reference
    filter_image_based_on_transient_percent,
    dataset_filter_utils.py:186-205)."""
    transient_objects = transient_objects or DEFAULT_TRANSIENT_OBJECTS
    lid = get_label_id_mapping()
    ids = [lid[name] for name in transient_objects]
    keep = []
    for name in image_names:
        path = os.path.join(root_dir, semantic_map_path,
                            f"{name.split('.')[0]}.npz")
        if not os.path.exists(path):
            keep.append(name)
            continue
        sem = np.load(path)["arr_0"]
        static = np.ones(sem.shape, bool)
        for i in ids:
            static[sem == i] = False
        if static.mean() > static_threshold:
            keep.append(name)
    return keep


def nima_filter(root_dir: str, image_names: list, ckpt_path: str,
                threshold: float = 4.0, batch: int = 16) -> list:
    """NIMA aesthetic-quality filtering (reference NIMA/NIMA_filter,
    dataset_filter_utils.py:19-96 — shipped disabled in the reference,
    prepare_data_split.py:41). Requires local VGG16-based NIMA weights;
    keeps images whose mean predicted score exceeds ``threshold``."""
    try:
        import torch
        import torch.nn as nn
        from torchvision.models import vgg16
    except ImportError as e:
        raise RuntimeError(
            "NIMA filtering needs torchvision + local pretrained weights "
            "(the reference ships this disabled too, "
            "prepare_data_split.py:41)"
        ) from e

    class NIMA(nn.Module):
        def __init__(self, base, num_classes: int = 10):
            super().__init__()
            self.features = base.features
            self.classifier = nn.Sequential(
                nn.ReLU(inplace=True), nn.Dropout(p=0.75),
                nn.Linear(25088, num_classes), nn.Softmax(dim=1),
            )

        def forward(self, x):
            out = self.features(x).view(x.size(0), -1)
            return self.classifier(out)

    model = NIMA(vgg16(weights=None))
    state = torch.load(ckpt_path, map_location="cpu")
    model.load_state_dict(state.get("model", state))
    model.eval()

    from PIL import Image as PILImage

    mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
    scores = {}
    with torch.no_grad():
        for name in image_names:
            img = PILImage.open(
                os.path.join(root_dir, "dense/images", name)
            ).convert("RGB").resize((224, 224))
            x = torch.from_numpy(
                np.asarray(img, np.float32).transpose(2, 0, 1)[None] / 255.0
            )
            p = model((x - mean) / std)[0]
            scores[name] = float((p * torch.arange(1, 11)).sum())
    return [n for n in image_names if scores[n] > threshold]


def write_split_tsv(root_dir: str, image_names: list, num_test: int = 10,
                    seed: int = 0) -> str:
    """Write the <scene>.tsv split table (first num_test shuffled images
    are 'test', reference prepare_data_split.py:53-62; the id column is
    a pseudo-index — documented broken, ids come from images.bin)."""
    scene = os.path.basename(os.path.normpath(root_dir))
    if num_test >= len(image_names):
        raise ValueError(
            f"num_test={num_test} but only {len(image_names)} images passed "
            "filtering — every image would land in the test split"
        )
    names = list(np.random.RandomState(seed).permutation(image_names))
    path = os.path.join(root_dir, f"{scene}.tsv")
    with open(path, "w") as f:
        f.write("filename\tid\tsplit\tdataset\n")
        for i, name in enumerate(names):
            split = "test" if i < num_test else "train"
            f.write(f"{name}\t{i}\t{split}\t{scene}\n")
    return path
