"""Convert a reference PyTorch-Lightning checkpoint into this
framework's orbax format, so reference-trained models can be used
directly for extraction / evaluation / fine-tuning here.

The reference trains `NeuconWSystem` (reference
lightning_modules/neuconw_system.py:61-103) whose Lightning
`state_dict` holds three modules the offline tools reload by name
prefix (reference tools/extract_mesh.py:132-134, utils/__init__.py:64-99):

    embedding_a.weight                                  (N_VOCAB, N_A)
    neuconw.sdf_net.lin{L}.weight_v / weight_g / bias   weight-normed
    neuconw.color_net.lin{L}.weight_v / weight_g / bias
    neuconw.color_net.xyz_encoding_final.weight / bias
    neuconw.color_net.static_encoding.static_linear_{S}.weight / bias
    neuconw.deviation_network.variance                  scalar
    nerf.pts_linears.{i}.weight / bias                  background NeRF
    nerf.alpha_linear / feature_linear / rgb_linear
    nerf.apperence_encoding.static_linear_{S}.*   (ENCODE_A_BG=True)
    nerf.views_linears.0.*                        (ENCODE_A_BG=False)

Mapping to our pytree (models/neuconw.py init_field): torch Linear
weights transpose to (in, out); weight_g (out, 1) squeezes to (out,).
`neuconw.xyz_encoding_final` at the WRAPPER level is dead code in the
reference (models/neuconw.py:319 — duplicated inside RenderingNetwork)
and is skipped.

Usage:
    python -m neuralrecon_w_tpu.tools.convert_torch_ckpt \
        --ckpt_path epoch=10.ckpt --out results/scene/checkpoints

    # reverse: export an orbax checkpoint as a Lightning-style .ckpt
    # the reference's own tools can strict-load
    python -m neuralrecon_w_tpu.tools.convert_torch_ckpt --reverse \
        --orbax_path results/scene/checkpoints/step_200000 \
        --ckpt_path exported.ckpt
"""

from __future__ import annotations

import argparse
import os
import re


def _lin(sd, prefix):
    w = sd[f"{prefix}.weight"].numpy()
    return {"w": w.T.copy(), "b": sd[f"{prefix}.bias"].numpy().copy()}


def _wn(sd, prefix):
    return {
        "v": sd[f"{prefix}.weight_v"].numpy().T.copy(),
        "g": sd[f"{prefix}.weight_g"].numpy()[:, 0].copy(),
        "b": sd[f"{prefix}.bias"].numpy().copy(),
    }


def _count(sd, pattern):
    """Highest index N matched by pattern's single (\\d+) group, +1."""
    rx = re.compile(pattern)
    idxs = [int(m.group(1)) for k in sd if (m := rx.match(k))]
    return max(idxs) + 1 if idxs else 0


def convert_state_dict(sd: dict) -> dict:
    """Reference Lightning state_dict -> our params pytree.

    Infers layer counts from the keys; raises KeyError on a state_dict
    that is not a NeuconW-system checkpoint.
    """
    params: dict = {}
    params["embedding_a"] = sd["embedding_a.weight"].numpy().copy()

    n_sdf = _count(sd, r"neuconw\.sdf_net\.lin(\d+)\.weight_v")
    sdf = {f"lin{l}": _wn(sd, f"neuconw.sdf_net.lin{l}")
           for l in range(n_sdf)}

    n_col = _count(sd, r"neuconw\.color_net\.lin(\d+)\.weight_v")
    color = {f"lin{l}": _wn(sd, f"neuconw.color_net.lin{l}")
             for l in range(n_col)}
    if "neuconw.color_net.xyz_encoding_final.weight" in sd:
        color["xyz_final"] = _lin(sd, "neuconw.color_net.xyz_encoding_final")
        n_static = _count(
            sd, r"neuconw\.color_net\.static_encoding\.static_linear_(\d+)\.weight",
        )
        for s in range(n_static):
            color[f"static{s}"] = _lin(
                sd, f"neuconw.color_net.static_encoding.static_linear_{s}"
            )

    params["neuconw"] = {
        "sdf": sdf,
        "color": color,
        "variance": sd["neuconw.deviation_network.variance"].numpy().reshape(()).copy(),
    }

    n_pts = _count(sd, r"nerf\.pts_linears\.(\d+)\.weight")
    bg = {f"pts{i}": _lin(sd, f"nerf.pts_linears.{i}") for i in range(n_pts)}
    bg["alpha"] = _lin(sd, "nerf.alpha_linear")
    bg["feature"] = _lin(sd, "nerf.feature_linear")
    n_app = _count(
        sd, r"nerf\.apperence_encoding\.static_linear_(\d+)\.weight"
    )
    if n_app:  # ENCODE_A_BG=True checkpoints
        for s in range(n_app):
            bg[f"app{s}"] = _lin(sd, f"nerf.apperence_encoding.static_linear_{s}")
    else:  # indoor configs: plain view branch
        bg["views0"] = _lin(sd, "nerf.views_linears.0")
    bg["rgb"] = _lin(sd, "nerf.rgb_linear")
    params["nerf_bg"] = bg
    return params


def export_state_dict(params: dict, bg_dir_dim: int = 27) -> dict:
    """Our params pytree -> reference Lightning state_dict (numpy
    values; caller wraps in torch tensors). Exact inverse of
    convert_state_dict, plus the two dead-code modules the reference's
    strict `load_ckpt` (reference utils/__init__.py:81-94) expects:
    the wrapper-level `neuconw.xyz_encoding_final` (Linear(512, 512)
    hardcoded, reference models/neuconw.py:319, unused in forward) and
    — for ENCODE_A_BG checkpoints — `nerf.views_linears.0`
    (reference models/nerf.py:143, bypassed by the appearance head),
    both zero-filled.

    bg_dir_dim: the background NeRF's encoded view-dir width
    (reference models/nerf.py:119-122; 27 for the stock multires_view).
    Only shapes the dead views_linears entry in ENCODE_A_BG mode.
    """
    import numpy as np

    def lin(p):
        return {"weight": np.ascontiguousarray(np.asarray(p["w"]).T),
                "bias": np.asarray(p["b"]).copy()}

    def wn(p):
        return {"weight_v": np.ascontiguousarray(np.asarray(p["v"]).T),
                "weight_g": np.asarray(p["g"])[:, None].copy(),
                "bias": np.asarray(p["b"]).copy()}

    sd: dict = {"embedding_a.weight": np.asarray(params["embedding_a"]).copy()}

    def put(prefix, entries):
        for k, v in entries.items():
            sd[f"{prefix}.{k}"] = v

    ncw = params["neuconw"]
    for name, p in ncw["sdf"].items():  # lin{L}
        put(f"neuconw.sdf_net.{name}", wn(p))
    sd["neuconw.xyz_encoding_final.weight"] = np.zeros((512, 512), np.float32)
    sd["neuconw.xyz_encoding_final.bias"] = np.zeros((512,), np.float32)
    sd["neuconw.deviation_network.variance"] = (
        np.asarray(ncw["variance"], np.float32).reshape(()))
    for name, p in ncw["color"].items():
        if name.startswith("lin"):
            put(f"neuconw.color_net.{name}", wn(p))
        elif name == "xyz_final":
            put("neuconw.color_net.xyz_encoding_final", lin(p))
        elif name.startswith("static"):
            s = name[len("static"):]
            put(f"neuconw.color_net.static_encoding.static_linear_{s}", lin(p))
        else:  # pragma: no cover - defensive
            raise KeyError(f"unknown color entry {name}")

    bg = params["nerf_bg"]
    for name, p in bg.items():
        if name.startswith("pts"):
            put(f"nerf.pts_linears.{name[3:]}", lin(p))
        elif name in ("alpha", "feature", "rgb"):
            put(f"nerf.{name}_linear", lin(p))
        elif name.startswith("app"):
            put(f"nerf.apperence_encoding.static_linear_{name[3:]}", lin(p))
        elif name == "views0":
            put("nerf.views_linears.0", lin(p))
        else:  # pragma: no cover - defensive
            raise KeyError(f"unknown bg entry {name}")
    if "views0" not in bg:  # dead layer in ENCODE_A_BG checkpoints
        w = int(np.asarray(bg["pts0"]["w"]).shape[1])
        half = int(np.asarray(bg["rgb"]["w"]).shape[0])
        sd["nerf.views_linears.0.weight"] = np.zeros(
            (half, bg_dir_dim + w), np.float32)
        sd["nerf.views_linears.0.bias"] = np.zeros((half,), np.float32)
    return sd


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", type=str, required=True,
                    help="reference .ckpt (Lightning) file; in --reverse "
                         "mode: the OUTPUT .ckpt path")
    ap.add_argument("--out", type=str, default=None,
                    help="checkpoint dir to write step_<N> into")
    ap.add_argument("--step", type=int, default=None,
                    help="step label; default: the ckpt's global_step")
    ap.add_argument("--reverse", action="store_true",
                    help="export an orbax checkpoint to Lightning .ckpt")
    ap.add_argument("--orbax_path", type=str, default=None,
                    help="orbax step_<N> dir to export (--reverse)")
    ap.add_argument("--bg_dir_dim", type=int, default=27,
                    help="encoded bg view-dir width for the dead "
                         "views_linears entry (--reverse, ENCODE_A_BG)")
    args = ap.parse_args(argv)

    import torch

    from ..training.checkpoint import restore_checkpoint, save_checkpoint

    if args.reverse:
        import numpy as np

        if not args.orbax_path:
            ap.error("--reverse requires --orbax_path")
        restored = restore_checkpoint(args.orbax_path, None)
        sd_np = export_state_dict(restored["params"], args.bg_dir_dim)
        sd = {k: torch.from_numpy(np.asarray(v, dtype=np.float32))
              for k, v in sd_np.items()}
        step = args.step if args.step is not None else int(restored["step"])
        torch.save({"state_dict": sd, "global_step": step, "epoch": 0},
                   args.ckpt_path)
        print(f"exported {len(sd)} torch tensors -> {args.ckpt_path} "
              f"(global_step {step})")
        return args.ckpt_path

    if not args.out:
        ap.error("--out is required")
    ckpt = torch.load(args.ckpt_path, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    params = convert_state_dict(sd)
    step = args.step
    if step is None:
        step = int(ckpt.get("global_step", 0))
    path = save_checkpoint(args.out, step, params)
    n = sum(1 for _ in _iter_leaves(params))
    print(f"converted {len(sd)} torch tensors -> {n} param leaves at {path}")
    return path


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
