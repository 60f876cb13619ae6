"""Semantic-map generation CLI (interface parity with reference
tools/prepare_data/prepare_semantic_maps.py:1-50).

The reference runs DeepLabV3-R101 (mmsegmentation, ADE20K, CUDA) per
image and stores the (H, W) int label map as <name>.npz under
semantic_maps/. The contract consumed downstream is only the npz label
map with ADE20K ids (datasets/mask_utils.py), so any segmentation
backend honoring that contract plugs in here:

  * --backend segformer: a real ADE20K model — any transformers
    SegFormer checkpoint directory saved with ``save_pretrained`` (e.g.
    nvidia/segformer-b4-finetuned-ade-512-512 fetched on a machine with
    egress). Weights-dir contract: ``config.json`` +
    ``model.safetensors`` (or ``pytorch_model.bin``); pass it via
    --weights. SegFormer's ADE class indices are already the 0-based
    ids mask_utils and every downstream consumer use — emitted as-is,
    NO shift (the 0-based contract is pinned by
    tests/test_cli_tools.py).
  * --backend torchvision: torchvision deeplabv3 (needs local weights
    via --weights; its VOC/COCO labels are remapped onto the few ADE20K
    ids the pipeline consumes: person/car/sky-equivalents),
  * --backend constant: writes all-zero maps — the correct fallback for
    scenes without transient masking (RAY_MASK_LIST None).

Zero-egress environments must provide local weights; there is no
download path.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

# torchvision COCO-seg (Pascal VOC classes) id -> ADE20K id for the
# classes the pipeline actually masks on (mask_utils label ids)
_VOC_TO_ADE = {
    15: 12,  # person
    7: 20,   # car
    2: 127,  # bicycle
    14: 116, # motorbike -> minibike
}


def get_opts(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", type=str, required=True)
    parser.add_argument("--out_path", type=str, default="semantic_maps")
    parser.add_argument("--backend", type=str, default="constant",
                        choices=["constant", "segformer", "torchvision"])
    parser.add_argument("--weights", type=str, default=None,
                        help="local weights: a transformers SegFormer "
                             "checkpoint dir (--backend segformer) or a "
                             "torchvision deeplabv3 state_dict path")
    return parser.parse_args(argv)


def _load_segformer(weights_dir: str):
    """Local-only SegFormer load; returns (model, infer_fn)."""
    import torch
    from transformers import SegformerForSemanticSegmentation

    if not weights_dir or not os.path.isdir(weights_dir):
        raise SystemExit(
            "--backend segformer needs --weights pointing at a local "
            "SegFormer checkpoint directory (config.json + "
            "model.safetensors), e.g. a save_pretrained() dump of "
            "nvidia/segformer-b4-finetuned-ade-512-512"
        )
    model = SegformerForSemanticSegmentation.from_pretrained(
        weights_dir, local_files_only=True
    )
    model.eval()

    mean = torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]

    def infer(img_np: np.ndarray) -> np.ndarray:
        h, w = img_np.shape[:2]
        x = torch.from_numpy(img_np.astype(np.float32).transpose(2, 0, 1) / 255.0)[None]
        x = (x - mean) / std
        with torch.no_grad():
            logits = model(pixel_values=x).logits  # (1, C, h/4, w/4)
            logits = torch.nn.functional.interpolate(
                logits, size=(h, w), mode="bilinear", align_corners=False
            )
            cls = logits[0].argmax(0).numpy()
        # SegFormer ADE20K heads index classes 0..149 — the SAME
        # 0-based convention as the label table every consumer uses
        # (mask_utils enumerate: sky=2, person=12) and as the raw
        # mmseg predictions the reference saves (reference
        # tools/prepare_data/prepare_semantic_maps.py:46-50)
        return cls.astype(np.int16)

    return model, infer


def main(argv=None):
    args = get_opts(argv)
    img_dir = os.path.join(args.root_dir, "dense/images")
    out_dir = os.path.join(args.root_dir, args.out_path)
    os.makedirs(out_dir, exist_ok=True)

    images = sorted(glob.glob(os.path.join(img_dir, "*")))
    infer = None
    model = None
    if args.backend == "segformer":
        _, infer = _load_segformer(args.weights)
    elif args.backend == "torchvision":
        try:
            import torch
            from torchvision.models.segmentation import deeplabv3_resnet101
        except ImportError as e:
            raise SystemExit(
                "--backend torchvision needs the torchvision package "
                "(not present in this environment); use --backend segformer "
                "with local ADE20K weights or --backend constant"
            ) from e

        model = deeplabv3_resnet101(weights=None, num_classes=21)
        if args.weights:
            model.load_state_dict(torch.load(args.weights, map_location="cpu"))
        model.eval()

    from PIL import Image as PILImage

    for path in images:
        name = os.path.basename(path).split(".")[0]
        img = PILImage.open(path).convert("RGB")
        w, h = img.size
        if infer is not None:
            sem = infer(np.asarray(img))
        elif model is None:
            sem = np.zeros((h, w), np.int16)
        else:
            import torch

            x = torch.from_numpy(
                np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
            )[None]
            x = (x - torch.tensor([0.485, 0.456, 0.406])[None, :, None, None]) / \
                torch.tensor([0.229, 0.224, 0.225])[None, :, None, None]
            with torch.no_grad():
                voc = model(x)["out"][0].argmax(0).numpy()
            sem = np.zeros_like(voc, dtype=np.int16)
            for voc_id, ade_id in _VOC_TO_ADE.items():
                sem[voc == voc_id] = ade_id
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"), sem)
    print(f"wrote {len(images)} semantic maps to {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
