"""Test config: CPU backend with 8 virtual devices (fake mesh), shared fixtures.

Parity tests use the reference PyTorch implementation as a numeric oracle
(running it, never copying it); the released checkpoints provide golden
tensors.  Everything runs on CPU — `XLA_FLAGS=--xla_force_host_platform_
device_count=8` gives the standard fake 8-device mesh for sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by serial XLA-CPU
# compiles on this 1-core host (35 min cold); cached re-runs reuse every
# compiled program across processes/rounds (measured 25.6s -> 0.33s for
# one conv program).  Keyed by HLO+compiler-version hash, so staleness
# is impossible by construction; the dir is gitignored.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
CKPT = os.path.join(REFERENCE, "modelzoo/coco2017-0.241078ap-model.pth")
COCO_DATA = os.path.join(REFERENCE, "data/coco.data")
GOLDEN_IMG = os.path.join(REFERENCE, "img/000139.jpg")

_HAS_REFERENCE = os.path.isdir(REFERENCE)

requires_reference = pytest.mark.skipif(
    not _HAS_REFERENCE, reason="reference repo not mounted")


@pytest.fixture(scope="session")
def ref_variables():
    """Converted reference checkpoint as a JAX variable pytree."""
    import jax.numpy as jnp
    from fastdet.io.torch_convert import load_torch_weights
    return jax.tree.map(jnp.asarray, load_torch_weights(CKPT))


@pytest.fixture(scope="session")
def coco_cfg():
    from fastdet.config import Config
    return Config.from_file(COCO_DATA)


@pytest.fixture(scope="session")
def torch_ref():
    """Import the reference package with stubbed missing deps; returns its
    module namespace.  The stub torchvision.ops.nms is an exact greedy
    numpy implementation of the documented torchvision semantics."""
    import sys
    import types

    import torch
    torch.set_num_threads(4)

    fake_summary = types.ModuleType("torchsummary")
    fake_summary.summary = lambda *a, **k: None
    sys.modules.setdefault("torchsummary", fake_summary)

    tv = types.ModuleType("torchvision")
    tvops = types.ModuleType("torchvision.ops")

    def np_nms(boxes, scores, iou_thres):
        b = boxes.detach().numpy()
        s = scores.detach().numpy()
        order = np.argsort(-s, kind="stable")
        keep, sup = [], np.zeros(len(s), bool)
        for i in order:
            if sup[i]:
                continue
            keep.append(i)
            x1 = np.maximum(b[i, 0], b[:, 0])
            y1 = np.maximum(b[i, 1], b[:, 1])
            x2 = np.minimum(b[i, 2], b[:, 2])
            y2 = np.minimum(b[i, 3], b[:, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            area_i = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
            area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            sup |= inter / (area_i + area - inter) > iou_thres
        return torch.from_numpy(np.asarray(keep, np.int64))

    tvops.nms = np_nms
    tv.ops = tvops
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tvops)

    # Older torch allowed float bounds for in-place clamp_ on integer
    # tensors (the reference relies on this at utils/loss.py:119);
    # restore that behavior for the oracle.
    _orig_clamp_ = torch.Tensor.clamp_

    def _compat_clamp_(self, min=None, max=None):
        if not torch.is_floating_point(self):
            if isinstance(min, torch.Tensor) and torch.is_floating_point(min):
                min = int(min)
            if isinstance(max, torch.Tensor) and torch.is_floating_point(max):
                max = int(max)
            if isinstance(min, float):
                min = int(min)
            if isinstance(max, float):
                max = int(max)
        return _orig_clamp_(self, min, max)

    torch.Tensor.clamp_ = _compat_clamp_

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    import model.detector as ref_detector  # noqa
    import utils.utils as ref_utils  # noqa
    import utils.loss as ref_loss  # noqa

    ns = types.SimpleNamespace(
        torch=torch, detector=ref_detector, utils=ref_utils, loss=ref_loss)
    return ns


@pytest.fixture(scope="session")
def torch_model(torch_ref):
    tm = torch_ref.detector.Detector(80, 3, True)
    tm.load_state_dict(
        torch_ref.torch.load(CKPT, map_location="cpu"))
    tm.eval()
    return tm
