"""Subprocess helper: gradient parity in float64 (run by test_grad_parity).

Exits 0 and prints MAXDIFF lines when gradients match the torch oracle
at float64 precision; any mismatch raises.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

ANCHORS = [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
           126.91, 78.23, 131.57, 214.55, 279.92, 258.87]


def main():
    import types

    import torch
    torch.set_num_threads(4)
    fake = types.ModuleType("torchsummary")
    fake.summary = lambda *a, **k: None
    sys.modules.setdefault("torchsummary", fake)
    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.nms = lambda *a, **k: None
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv.ops)

    # old-torch clamp_ compat (reference utils/loss.py:119)
    _orig = torch.Tensor.clamp_

    def _compat(self, min=None, max=None):
        if not torch.is_floating_point(self):
            min = int(min) if min is not None else None
            max = int(max) if max is not None else None
        return _orig(self, min, max)

    torch.Tensor.clamp_ = _compat

    sys.path.insert(0, "/root/reference")
    import model.detector as ref_det
    import utils.loss as ref_loss

    from fastdet.models import Detector
    from fastdet.io.torch_convert import load_torch_weights
    from fastdet.train.loss import compute_loss
    from fastdet.train.targets import pack_labels

    ckpt = "/root/reference/modelzoo/coco2017-0.241078ap-model.pth"
    tm = ref_det.Detector(80, 3, True).double()
    tm.load_state_dict(torch.load(ckpt, map_location="cpu"))
    tm.eval()

    variables = load_torch_weights(ckpt)
    variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), variables)

    rng = np.random.RandomState(0)
    b = 2
    imgs = rng.randint(0, 255, (b, 3, 352, 352)).astype(np.float64) / 255.0
    labels = [
        np.array([[0, 0.5, 0.5, 0.3, 0.4],
                  [3, 0.25, 0.7, 0.15, 0.2]], np.float32),
        np.array([[7, 0.6, 0.4, 0.5, 0.35]], np.float32),
    ]
    cfg = {"anchor_num": 3, "anchors": ANCHORS, "classes": 80,
           "width": 352, "height": 352}

    rows = []
    for i, lab in enumerate(labels):
        rows.append(np.concatenate(
            [np.full((len(lab), 1), i, np.float32), lab], 1))
    t_tgt = torch.from_numpy(np.concatenate(rows, 0).astype(np.float64))
    t_imgs = torch.from_numpy(imgs)
    for p in tm.parameters():
        p.requires_grad_(True)
    preds = tm(t_imgs)
    _, _, _, total = ref_loss.compute_loss(preds, t_tgt, cfg, "cpu")
    total.backward()
    t_grads = {n: p.grad.detach().numpy() for n, p in tm.named_parameters()}

    lab_arr, mask = pack_labels(labels, 8)
    anchors = jnp.asarray(np.asarray(ANCHORS, np.float64).reshape(2, 3, 2))
    model = Detector(classes=80, anchor_num=3, dtype=jnp.float64)
    x = jnp.asarray(imgs.transpose(0, 2, 3, 1))

    def loss_fn(params):
        outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False)
        tot, _ = compute_loss(outs, jnp.asarray(lab_arr, jnp.float64),
                              jnp.asarray(mask), anchors, (352, 352))
        return tot

    j_total, j_grads = jax.value_and_grad(loss_fn)(variables["params"])
    dt = abs(float(j_total) - float(total))
    print(f"LOSSDIFF {dt:.3e}")
    # the reference accumulates its loss scalar in float32 tensors
    # (utils/loss.py:133 ft([0])), capping scalar agreement at fp32 eps
    assert dt < 1e-5 * max(abs(float(total)), 1), (float(j_total),
                                                   float(total))

    def t2j_conv(g):  # OIHW <- HWIO
        return np.transpose(np.asarray(g), (3, 2, 0, 1))

    checks = {
        "backbone.first_conv.0.weight":
            t2j_conv(j_grads["backbone"]["first_conv"]["conv"]["kernel"]),
        "backbone.stage3.4.branch_main.3.weight":
            t2j_conv(j_grads["backbone"]["stage3_4"]["main_dw"]["conv"]["kernel"]),
        "backbone.stage4.2.branch_main.1.weight":
            np.asarray(j_grads["backbone"]["stage4_2"]["main_pw"]["bn"]["scale"]),
        "fpn.reg_head_2.block.0.weight":
            t2j_conv(j_grads["fpn"]["reg_head_2"]["dw1"]["conv"]["kernel"]),
        "fpn.conv1x1_3.1.bias":
            np.asarray(j_grads["fpn"]["conv1x1_3"]["bn"]["bias"]),
        "output_reg_layers.weight":
            t2j_conv(j_grads["output_reg"]["kernel"]),
        "output_obj_layers.bias":
            np.asarray(j_grads["output_obj"]["bias"]),
        "output_cls_layers.weight":
            t2j_conv(j_grads["output_cls"]["kernel"]),
    }
    for name, jg in checks.items():
        tg = t_grads[name]
        scale = max(np.abs(tg).max(), 1e-12)
        rel = np.abs(jg - tg).max() / scale
        print(f"MAXDIFF {name} {rel:.3e}")
        assert rel < 2e-5, name
    print("GRAD PARITY OK")


if __name__ == "__main__":
    main()
