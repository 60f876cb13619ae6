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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", type=str, required=True,
                    help="reference .ckpt (Lightning) file")
    ap.add_argument("--out", type=str, required=True,
                    help="checkpoint dir to write step_<N> into")
    ap.add_argument("--step", type=int, default=None,
                    help="step label; default: the ckpt's global_step")
    args = ap.parse_args(argv)

    import torch

    from ..training.checkpoint import save_checkpoint

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
