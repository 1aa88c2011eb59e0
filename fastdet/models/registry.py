"""Model-family registry: construct a model + its detect builder + loss.

Families:
  * "yolo-fastestv2" (default) — the anchor-based two-scale detector
  * "anchorfree"               — the FastestDet-style single-scale head
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp
import numpy as np


class ModelFamily(NamedTuple):
    name: str
    model: Any
    build_detect_fn: Callable    # (variables-agnostic) detect builder
    loss_fn: Callable            # (outputs, labels, mask, anchors, hw)


def get_family(name: str, cfg, dtype=jnp.float32) -> ModelFamily:
    name = (name or "yolo-fastestv2").lower()
    if name in ("yolo-fastestv2", "yolofastestv2", "v2", "default"):
        from fastdet.models.detector import Detector
        from fastdet.ops.postprocess import build_detect_fn
        from fastdet.train.loss import compute_loss

        model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num,
                         dtype=dtype)

        def detect_builder(**kw):
            return build_detect_fn(model, cfg, **kw)

        return ModelFamily(name="yolo-fastestv2", model=model,
                           build_detect_fn=detect_builder,
                           loss_fn=compute_loss)

    if name in ("anchorfree", "fastestdet"):
        from fastdet.models.anchorfree import (AnchorFreeDetector,
                                               anchorfree_loss,
                                               build_anchorfree_detect_fn)

        model = AnchorFreeDetector(classes=cfg.classes, dtype=dtype)

        def detect_builder(**kw):
            kw.pop("dtype", None)
            return build_anchorfree_detect_fn(
                model, (cfg.height, cfg.width), **kw)

        def loss_fn(outputs, labels, mask, anchors, input_hw):
            return anchorfree_loss(outputs, labels, mask, input_hw)

        return ModelFamily(name="anchorfree", model=model,
                           build_detect_fn=detect_builder, loss_fn=loss_fn)

    raise ValueError(f"unknown model family: {name}")
