"""Unified weight loading: .npz (native), .pth (auto-converted), orbax dir."""

from __future__ import annotations

import os


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
