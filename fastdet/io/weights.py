"""Unified weight loading: .npz (native), .pth (auto-converted), orbax dir.

Also provides `merge_variables` — the counterpart of the reference's
finetune load with strict=False (train.py:76): pretrained tensors are
grafted onto a freshly initialized tree wherever names AND shapes match
(e.g. reusing a COCO backbone+FPN under a head with a different class
count), everything else keeps its fresh initialization.
"""

from __future__ import annotations

import os
from typing import Tuple


def merge_variables(init: dict, pretrained: dict) -> Tuple[dict, int, int]:
    """Graft matching leaves of `pretrained` onto `init`.

    Returns (merged, n_loaded, n_kept): counts of leaves taken from the
    pretrained tree vs kept from the fresh init."""
    import numpy as np

    counts = [0, 0]

    def rec(a, b):
        if isinstance(a, dict):
            out = {}
            for k, v in a.items():
                if isinstance(b, dict) and k in b:
                    out[k] = rec(v, b[k])
                else:
                    out[k] = _count_keep(v)
            return out
        if (hasattr(b, "shape") and tuple(a.shape) == tuple(b.shape)):
            counts[0] += 1
            return b
        counts[1] += 1
        return a

    def _count_keep(v):
        if isinstance(v, dict):
            return {k: _count_keep(x) for k, x in v.items()}
        counts[1] += 1
        return v

    merged = rec(init, pretrained)
    return merged, counts[0], counts[1]


def load_variables(path: str) -> dict:
    """Load model variables ({'params', 'batch_stats'}) from any supported
    container: fastdet .npz, reference torch .pth, or an orbax checkpoint
    directory."""
    if os.path.isdir(path):
        from fastdet.io.checkpoint import load_checkpoint
        restored = load_checkpoint(path)
        if "params" in restored:
            return {k: restored[k] for k in ("params", "batch_stats")
                    if k in restored}
        raise ValueError(f"checkpoint at {path} has no params")
    if path.endswith(".npz"):
        from fastdet.io.torch_convert import load_npz_variables
        return load_npz_variables(path)
    if path.endswith((".pth", ".pt")):
        from fastdet.io.torch_convert import load_torch_weights
        return load_torch_weights(path)
    raise ValueError(f"unsupported weights container: {path}")
