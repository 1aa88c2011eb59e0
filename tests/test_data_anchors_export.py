"""Data pipeline, anchor k-means (vs reference oracle), StableHLO export."""

import os

import cv2
import numpy as np
import pytest

from tests.conftest import requires_reference


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Tiny Darknet-format dataset: images + label txts + list file."""
    root = tmp_path_factory.mktemp("synthds")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(8):
        img = rng.randint(0, 255, (240, 320, 3), np.uint8)
        p = root / f"img{i}.jpg"
        cv2.imwrite(str(p), img)
        n = rng.randint(1, 5)
        rows = []
        for _ in range(n):
            c = rng.randint(0, 3)
            cx, cy = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            rows.append(f"{c} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        (root / f"img{i}.txt").write_text("\n".join(rows) + "\n")
        paths.append(str(p))
    lst = root / "train.txt"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst), paths


def test_dataset_and_loader(synth_dataset):
    from fastdet.data import DarknetDataset, DataLoader
    lst, paths = synth_dataset
    ds = DarknetDataset(lst, 352, 352, augment=None)
    assert len(ds) == 8
    img, labels = ds[0]
    assert img.shape == (352, 352, 3) and img.dtype == np.uint8
    assert labels.ndim == 2 and labels.shape[1] == 5

    loader = DataLoader(ds, batch_size=3, shuffle=True, drop_last=True,
                        max_labels=10, num_workers=2)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    images, labels, mask = batches[0]
    assert images.shape == (3, 352, 352, 3)
    assert labels.shape == (3, 10, 5)
    assert mask.shape == (3, 10)
    assert mask.any()
    # padded rows are zero
    assert (labels[~mask] == 0).all()


def test_loader_abandoned_iteration(synth_dataset):
    """Breaking out mid-epoch must not strand the producer thread, and
    the loader must be fully re-iterable afterwards (resume scenario)."""
    import threading
    import time
    from fastdet.data import DarknetDataset, DataLoader

    lst, _ = synth_dataset
    ds = DarknetDataset(lst, 64, 64, augment=None)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        max_labels=10, num_workers=2, prefetch=1)

    for _ in range(3):  # repeated interrupted epochs
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch (what a `break` does via GC)

    deadline = time.time() + 10
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name.startswith("fastdet-loader-producer")]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"stranded producer threads: {alive}"

    # a full epoch still works after the interruptions
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0][0].shape == (2, 64, 64, 3)
    loader.close()


def test_dataset_validation(tmp_path):
    from fastdet.data import DarknetDataset
    bad = tmp_path / "bad.txt"
    bad.write_text("/nonexistent/img.jpg\n")
    with pytest.raises(FileNotFoundError):
        DarknetDataset(str(bad))
    gif = tmp_path / "x.gif"
    gif.write_text("")
    lst = tmp_path / "lst.txt"
    lst.write_text(str(gif) + "\n")
    with pytest.raises(ValueError):
        DarknetDataset(str(lst))


def test_augmentations_shapes(synth_dataset):
    import random
    from fastdet.data.dataset import (augment_hsv, contrast_and_brightness,
                                      motion_blur, random_resize)
    rng = random.Random(0)
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    for fn in (contrast_and_brightness, motion_blur, augment_hsv,
               random_resize):
        out = fn(img, rng)
        assert out.shape == img.shape
        assert out.dtype == np.uint8


@requires_reference
def test_kmeans_parity_with_reference(torch_ref, tmp_path):
    """Same init → same converged centroids & avg IoU as the reference
    k-means (run as oracle with its removed-np.float alias patched)."""
    import sys
    np_mod = np
    if not hasattr(np_mod, "float"):
        np_mod.float = np.float64  # reference uses the removed alias
    import genanchors as ref_ga  # from /root/reference (path via conftest)

    rng = np.random.RandomState(1)
    wh = np.abs(rng.rand(200, 2) * 0.5 + 0.01)
    init = wh[:5].copy()

    from fastdet.anchors import kmeans_anchors, pair_iou
    ours_c, ours_avg = kmeans_anchors(wh, 5, init=init.copy())

    anchor_file = str(tmp_path / "anchors5.txt")
    ref_ga.kmeans(wh.copy(), init.copy(), 0.005, anchor_file, 352, 352)
    ref_lines = open(anchor_file).read().strip().split("\n")
    ref_anchors = np.asarray([
        [float(v) for v in pair.split(",")]
        for pair in ref_lines[0].replace(", ", ";").split(";")])
    ref_avg = float(ref_lines[1])

    ours_scaled = ours_c.copy()
    ours_scaled[:, 0] *= 352
    ours_scaled[:, 1] *= 352
    ours_sorted = ours_scaled[np.argsort(ours_scaled[:, 0])]
    np.testing.assert_allclose(ours_sorted, ref_anchors, atol=5e-3)
    np.testing.assert_allclose(ours_avg, ref_avg, atol=1e-5)

    # our pairwise IoU formula == reference 4-case IOU
    ref_iou = np.stack([ref_ga.IOU(x, wh[:5]) for x in wh])
    np.testing.assert_allclose(pair_iou(wh, wh[:5]), ref_iou, rtol=1e-10)


def test_export_roundtrip(tmp_path):
    """StableHLO export → deserialize → same outputs as direct deploy."""
    import jax
    import jax.numpy as jnp
    from fastdet.export.stablehlo import export_detector, load_exported
    from fastdet.models import Detector

    model = Detector(classes=5, anchor_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    out = str(tmp_path / "model.stablehlo")
    export_detector(model, variables, out, input_hw=(64, 64), batch=2)
    assert os.path.getsize(out) > 1000

    call = load_exported(out)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3), np.uint8))
    e2, e3 = call(img)
    d2, d3 = model.apply(variables, img.astype(jnp.float32) / 255.0,
                         train=False, deploy=True)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(d2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e3), np.asarray(d3), atol=1e-6)


def test_export_quantized_roundtrip(tmp_path):
    """Int8 StableHLO export → deserialize → same maps as the direct
    int8 deploy forward (sigmoid/softmax concat baked in)."""
    import jax
    import jax.numpy as jnp
    from fastdet.export.stablehlo import export_quantized, load_exported
    from fastdet.models import Detector
    from fastdet.quant import calibrate, fold_model, quantize_weights
    from fastdet.quant.ptq import QuantOps, forward_folded

    model = Detector(classes=5, anchor_num=3)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.RandomState(2)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    folded = fold_model(variables)
    scales = calibrate(folded, calib, batch=4)
    qw = quantize_weights(folded)

    out = str(tmp_path / "model-int8.stablehlo")
    export_quantized(qw, scales, out, input_hw=(64, 64), batch=2)
    assert os.path.getsize(out) > 1000

    call = load_exported(out)
    img = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3), np.uint8))
    e2, e3 = call(img)

    reg2, obj2, cls2, reg3, obj3, cls3 = forward_folded(
        img, QuantOps(jax.tree.map(jnp.asarray, qw), scales))

    def m(reg, obj, cls):
        return jnp.concatenate(
            [jax.nn.sigmoid(reg), jax.nn.sigmoid(obj),
             jax.nn.softmax(cls, axis=-1)], axis=-1)

    np.testing.assert_allclose(np.asarray(e2),
                               np.asarray(m(reg2, obj2, cls2)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(e3),
                               np.asarray(m(reg3, obj3, cls3)), atol=1e-6)


def test_export_quantized_anchorfree_roundtrip(tmp_path):
    """Int8 StableHLO export of the anchor-free family (one stride-16
    deploy map, family self-described by the artifact op names)."""
    import jax
    import jax.numpy as jnp
    from fastdet.export.stablehlo import export_quantized, load_exported
    from fastdet.models.anchorfree import AnchorFreeDetector
    from fastdet.quant import calibrate, fold_model, quantize_weights
    from fastdet.quant.ptq import QuantOps, forward_folded_af

    model = AnchorFreeDetector(classes=5)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.RandomState(4)
    calib = rng.randint(0, 255, (4, 64, 64, 3), np.uint8)
    folded = fold_model(variables)
    scales = calibrate(folded, calib, batch=4)
    qw = quantize_weights(folded)

    out = str(tmp_path / "af-int8.stablehlo")
    export_quantized(qw, scales, out, input_hw=(64, 64), batch=2)
    call = load_exported(out)
    img = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3), np.uint8))
    e = call(img)

    obj, cls, reg = forward_folded_af(
        img, QuantOps(jax.tree.map(jnp.asarray, qw), scales))
    want = jnp.concatenate(
        [jax.nn.sigmoid(reg), jax.nn.sigmoid(obj),
         jax.nn.softmax(cls, axis=-1)], axis=-1)
    np.testing.assert_allclose(np.asarray(e), np.asarray(want), atol=1e-6)


def test_merge_variables_partial_finetune():
    """strict=False finetune semantics: backbone+FPN load from an
    80-class checkpoint under a 5-class head."""
    import jax
    import jax.numpy as jnp
    from fastdet.io import merge_variables
    from fastdet.io.torch_convert import load_torch_weights
    from fastdet.models import Detector

    pre = load_torch_weights(
        "/root/reference/modelzoo/coco2017-0.241078ap-model.pth")
    model5 = Detector(classes=5, anchor_num=3)
    init = model5.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 352, 352, 3)), train=False)
    merged, n_load, n_keep = merge_variables(init, pre)
    # cls head (kernel+bias) differs in shape -> kept fresh
    assert n_keep == 2 and n_load > 300
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["backbone"]["first_conv"]["conv"]["kernel"]),
        np.asarray(pre["params"]["backbone"]["first_conv"]["conv"]["kernel"]))
    # merged model runs
    outs = model5.apply(merged, jnp.zeros((1, 352, 352, 3)), train=False)
    assert outs[2].shape == (1, 22, 22, 5)


def test_backbone_only_conversion():
    """The ImageNet backbone .pth (330 tensors) converts standalone."""
    import jax
    import jax.numpy as jnp
    from fastdet.io.torch_convert import load_torch_weights
    from fastdet.models.shufflenet import ShuffleNetV2

    bb = load_torch_weights("/root/reference/model/backbone/backbone.pth",
                            backbone_only=True)
    net = ShuffleNetV2()
    c2, c3 = net.apply(jax.tree.map(jnp.asarray, bb),
                       jnp.zeros((1, 352, 352, 3)), False)
    assert c2.shape == (1, 22, 22, 96) and c3.shape == (1, 11, 11, 192)
