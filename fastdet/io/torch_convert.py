"""Convert reference PyTorch `.pth` checkpoints into fastdet variable pytrees.

The released checkpoints (documented in SURVEY.md §2) are flat state dicts
with namespaces {backbone., fpn., output_{reg,obj,cls}_layers.}; this module
maps them onto our Flax module tree:

  * regular conv  OIHW → HWIO
  * depthwise conv (C,1,kh,kw) → (kh,kw,1,C)   (feature_group_count=C)
  * BN weight/bias → params…bn.{scale,bias};
    running_mean/var → batch_stats…bn.{mean,var};
    num_batches_tracked is dropped.

torch is only imported inside the conversion entry points — the rest of the
framework never depends on it.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# (stage index → repeats) mirrors ShuffleNetV2.stage_repeats (4, 8, 4)
_STAGE_REPEATS = {2: 4, 3: 8, 4: 4}


def _conv(w: np.ndarray) -> np.ndarray:
    """OIHW (or depthwise C1HW) → HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convbn(sd, torch_conv: str, torch_bn: str, params: dict, stats: dict,
            path: Tuple[str, ...]):
    """Map one torch [conv, bn] pair into the ConvBN submodule at `path`."""
    node_p = params
    node_s = stats
    for p in path:
        node_p = node_p.setdefault(p, {})
        node_s = node_s.setdefault(p, {})
    node_p["conv"] = {"kernel": _conv(sd[f"{torch_conv}.weight"])}
    node_p["bn"] = {
        "scale": sd[f"{torch_bn}.weight"],
        "bias": sd[f"{torch_bn}.bias"],
    }
    node_s["bn"] = {
        "mean": sd[f"{torch_bn}.running_mean"],
        "var": sd[f"{torch_bn}.running_var"],
    }


def _shuffle_block(sd, prefix: str, params, stats, path, stride2: bool):
    # branch_main Sequential: 0 pw-conv, 1 bn, 2 relu, 3 dw-conv, 4 bn,
    #                         5 pw-linear-conv, 6 bn, 7 relu
    _convbn(sd, f"{prefix}.branch_main.0", f"{prefix}.branch_main.1",
            params, stats, path + ("main_pw",))
    _convbn(sd, f"{prefix}.branch_main.3", f"{prefix}.branch_main.4",
            params, stats, path + ("main_dw",))
    _convbn(sd, f"{prefix}.branch_main.5", f"{prefix}.branch_main.6",
            params, stats, path + ("main_pw_linear",))
    if stride2:
        # branch_proj Sequential: 0 dw-conv, 1 bn, 2 pw-conv, 3 bn, 4 relu
        _convbn(sd, f"{prefix}.branch_proj.0", f"{prefix}.branch_proj.1",
                params, stats, path + ("proj_dw",))
        _convbn(sd, f"{prefix}.branch_proj.2", f"{prefix}.branch_proj.3",
                params, stats, path + ("proj_pw",))


def _dwconvblock(sd, prefix: str, params, stats, path):
    # block Sequential: 0 dw, 1 bn, 2 relu, 3 pw, 4 bn, 5 dw, 6 bn, 7 relu,
    #                   8 pw, 9 bn
    for name, ci, bi in (("dw1", 0, 1), ("pw1", 3, 4), ("dw2", 5, 6),
                         ("pw2", 8, 9)):
        _convbn(sd, f"{prefix}.block.{ci}", f"{prefix}.block.{bi}",
                params, stats, path + (name,))


def convert_state_dict(sd: Dict[str, np.ndarray],
                       backbone_only: bool = False) -> dict:
    """Numpy torch state dict → {'params': …, 'batch_stats': …} pytree."""
    params: dict = {}
    stats: dict = {}

    # backbone_only trees have no "backbone" wrapper so they apply
    # directly to a ShuffleNetV2 module; wrap them to merge into a
    # Detector tree
    bb = "" if backbone_only else "backbone."
    bb_path = () if backbone_only else ("backbone",)

    _convbn(sd, f"{bb}first_conv.0", f"{bb}first_conv.1", params, stats,
            bb_path + ("first_conv",))
    for stage, repeats in _STAGE_REPEATS.items():
        for i in range(repeats):
            _shuffle_block(sd, f"{bb}stage{stage}.{i}", params, stats,
                           bb_path + (f"stage{stage}_{i}",), stride2=(i == 0))

    if backbone_only:
        return {"params": params, "batch_stats": stats}

    _convbn(sd, "fpn.conv1x1_2.0", "fpn.conv1x1_2.1", params, stats,
            ("fpn", "conv1x1_2"))
    _convbn(sd, "fpn.conv1x1_3.0", "fpn.conv1x1_3.1", params, stats,
            ("fpn", "conv1x1_3"))
    for head in ("cls_head_2", "reg_head_2", "cls_head_3", "reg_head_3"):
        _dwconvblock(sd, f"fpn.{head}", params, stats, ("fpn", head))

    for flax_name, torch_name in (("output_reg", "output_reg_layers"),
                                  ("output_obj", "output_obj_layers"),
                                  ("output_cls", "output_cls_layers")):
        params[flax_name] = {
            "kernel": _conv(sd[f"{torch_name}.weight"]),
            "bias": sd[f"{torch_name}.bias"],
        }

    return {"params": params, "batch_stats": stats}


def load_torch_weights(pth_path: str, backbone_only: bool = False) -> dict:
    """Load a reference `.pth` and convert to a fastdet variable pytree."""
    import torch  # local import: conversion-time-only dependency

    sd = torch.load(pth_path, map_location="cpu")
    sd_np = {k: v.detach().numpy().astype(np.float32)
             for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    return convert_state_dict(sd_np, backbone_only=backbone_only)


def convert_torch_checkpoint(pth_path: str, out_path: str,
                             backbone_only: bool = False) -> dict:
    """Convert and save as a flat .npz (portable, torch-free to reload)."""
    variables = load_torch_weights(pth_path, backbone_only=backbone_only)
    flat = {}

    def _flatten(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                _flatten(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = v

    _flatten(variables, ())
    np.savez(out_path, **flat)
    return variables


def save_npz_variables(variables: dict, out_path: str) -> None:
    """Save a variables pytree as the flat .npz the CLIs load (inverse
    of `load_npz_variables`; same layout `convert_torch_checkpoint`
    writes)."""
    flat = {}

    def _flatten(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                _flatten(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = np.asarray(v)

    _flatten(variables, ())
    np.savez(out_path, **flat)


def load_npz_variables(npz_path: str) -> dict:
    """Reload a converted .npz into the nested variable pytree."""
    flat = np.load(npz_path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
