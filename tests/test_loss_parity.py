"""Dense-grid loss parity vs the reference dynamic-shape implementation.

The reference compute_loss/build_target (run via the torch oracle) defines
the golden values; our static-shape masked formulation must match on
random predictions + random labels, including edge cases (no labels,
boundary boxes, duplicate cells).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastdet.train.loss import compute_loss
from fastdet.train.targets import pack_labels
from tests.conftest import requires_reference

ANCHORS = [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
           126.91, 78.23, 131.57, 214.55, 279.92, 258.87]


def _rand_outputs(rng, b, nc=80, scale=1.0):
    return [
        rng.randn(b, 22, 22, 12).astype(np.float32) * scale,
        rng.randn(b, 22, 22, 3).astype(np.float32) * scale,
        rng.randn(b, 22, 22, nc).astype(np.float32) * scale,
        rng.randn(b, 11, 11, 12).astype(np.float32) * scale,
        rng.randn(b, 11, 11, 3).astype(np.float32) * scale,
        rng.randn(b, 11, 11, nc).astype(np.float32) * scale,
    ]


def _rand_labels(rng, b, max_n=12):
    per_img = []
    for _ in range(b):
        n = rng.randint(0, max_n)
        cls = rng.randint(0, 80, n)
        cxy = rng.uniform(0.05, 0.95, (n, 2))
        wh = rng.uniform(0.02, 0.6, (n, 2))
        per_img.append(np.concatenate([cls[:, None], cxy, wh], 1)
                       .astype(np.float32))
    return per_img


def _ref_loss(torch_ref, outputs, per_img_labels, nc=80):
    torch = torch_ref.torch
    cfg = {"anchor_num": 3, "anchors": ANCHORS, "classes": nc,
           "width": 352, "height": 352}
    preds = [torch.from_numpy(o.transpose(0, 3, 1, 2)) for o in outputs]
    rows = []
    for i, lab in enumerate(per_img_labels):
        if len(lab):
            rows.append(np.concatenate(
                [np.full((len(lab), 1), i, np.float32), lab], 1))
    targets = (torch.from_numpy(np.concatenate(rows, 0)) if rows
               else torch.zeros((0, 6)))
    lbox, lobj, lcls, total = torch_ref.loss.compute_loss(
        preds, targets, cfg, "cpu")
    return (float(lbox), float(lobj), float(lcls), float(total))


def _our_loss(outputs, per_img_labels, nc=80):
    labels, mask = pack_labels(per_img_labels, max_labels=16)
    anchors = jnp.asarray(np.asarray(ANCHORS, np.float32).reshape(2, 3, 2))
    total, comps = compute_loss([jnp.asarray(o) for o in outputs],
                                jnp.asarray(labels), jnp.asarray(mask),
                                anchors, (352, 352))
    return (float(comps["box"]), float(comps["obj"]), float(comps["cls"]),
            float(total))


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_parity_random(torch_ref, seed):
    rng = np.random.RandomState(seed)
    outputs = _rand_outputs(rng, b=4)
    labels = _rand_labels(rng, b=4)
    ref = _ref_loss(torch_ref, outputs, labels)
    ours = _our_loss(outputs, labels)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@requires_reference
def test_loss_parity_no_labels(torch_ref):
    rng = np.random.RandomState(3)
    outputs = _rand_outputs(rng, b=2)
    labels = [np.zeros((0, 5), np.float32)] * 2
    ref = _ref_loss(torch_ref, outputs, labels)
    ours = _our_loss(outputs, labels)
    assert ours[0] == 0.0 and ours[2] == 0.0
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@requires_reference
def test_loss_parity_boundary_boxes(torch_ref):
    """Boxes hugging the image border exercise the clamp path."""
    rng = np.random.RandomState(4)
    outputs = _rand_outputs(rng, b=2)
    labels = [
        np.array([[0, 0.01, 0.01, 0.05, 0.05],
                  [5, 0.99, 0.99, 0.08, 0.08],
                  [7, 0.5, 0.02, 0.3, 0.04],
                  [2, 0.02, 0.5, 0.04, 0.3]], np.float32),
        np.array([[1, 0.5, 0.5, 1.0, 1.0]], np.float32),
    ]
    ref = _ref_loss(torch_ref, outputs, labels)
    ours = _our_loss(outputs, labels)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_loss_grad_finite():
    """Gradient through the dense loss is finite and nonzero."""
    import jax
    rng = np.random.RandomState(5)
    outputs = [jnp.asarray(o) for o in _rand_outputs(rng, b=2)]
    labels, mask = pack_labels(_rand_labels(rng, 2), 16)
    anchors = jnp.asarray(np.asarray(ANCHORS, np.float32).reshape(2, 3, 2))

    def f(outs):
        total, _ = compute_loss(outs, jnp.asarray(labels),
                                jnp.asarray(mask), anchors, (352, 352))
        return total

    grads = jax.grad(f)(outputs)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert sum(float(jnp.abs(g).sum()) for g in grads) > 0
