"""Fused Pallas inference path: numeric parity with the linen model.

Runs in Pallas interpret mode on CPU (same kernel code that Mosaic
compiles on TPU; the TPU compile/run was validated on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdet.kernels.fold import pack_fused_weights
from fastdet.kernels.fused_infer import build_fused_forward
from fastdet.models import Detector
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("fuse_s2", [False, True])
def test_fused_forward_matches_linen(ref_variables, fuse_s2):
    model = Detector(classes=80, anchor_num=3)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (2, 352, 352, 3), np.uint8))
    ref = model.apply(ref_variables, img.astype(jnp.float32) / 255.0,
                      train=False)
    fwd, packed = build_fused_forward(ref_variables, dtype=jnp.float32,
                                      interpret=True, fuse_s2=fuse_s2)
    outs = fwd(img, packed)
    for i, (a, b) in enumerate(zip(ref, outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"output {i}")


@requires_reference
@pytest.mark.parametrize("fuse_s2", [False, True])
def test_fused_forward_s2d_matches_linen(ref_variables, fuse_s2):
    """The s2d_u8 input path (fused Pallas stem) matches the linen model."""
    from fastdet.kernels.fused_infer import pack_images_s2d
    model = Detector(classes=80, anchor_num=3)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randint(0, 255, (2, 352, 352, 3), np.uint8))
    ref = model.apply(ref_variables, img.astype(jnp.float32) / 255.0,
                      train=False)
    fwd, packed = build_fused_forward(ref_variables, dtype=jnp.float32,
                                      interpret=True,
                                      input_format="s2d_u8",
                                      fuse_s2=fuse_s2)
    outs = fwd(jnp.asarray(pack_images_s2d(np.asarray(img))), packed)
    for i, (a, b) in enumerate(zip(ref, outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"output {i}")


@requires_reference
@pytest.mark.parametrize("fuse_s2", [False, True])
def test_fused_forward_s2d8_matches_linen(ref_variables, fuse_s2):
    """The s2d8_u8 path (phase-packed stem feeding stage 2 directly,
    no phase-split permute) matches the linen model."""
    from fastdet.kernels.fused_infer import pack_images_s2d8
    model = Detector(classes=80, anchor_num=3)
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randint(0, 255, (2, 352, 352, 3), np.uint8))
    ref = model.apply(ref_variables, img.astype(jnp.float32) / 255.0,
                      train=False)
    fwd, packed = build_fused_forward(ref_variables, dtype=jnp.float32,
                                      interpret=True,
                                      input_format="s2d8_u8",
                                      fuse_s2=fuse_s2)
    outs = fwd(jnp.asarray(pack_images_s2d8(np.asarray(img))), packed)
    for i, (a, b) in enumerate(zip(ref, outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=f"output {i}")


@requires_reference
def test_stem8_phase_packed_matches_stem(ref_variables):
    """upto='stem': the s2d8 16-phase conv + cross-phase pool equals the
    s2d4 fused stem (same (B, 88, 88, 24) NHWC map)."""
    from fastdet.kernels.fused_infer import (pack_images_s2d,
                                             pack_images_s2d8)
    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (2, 352, 352, 3), np.uint8)
    f4, p4 = build_fused_forward(ref_variables, dtype=jnp.float32,
                                 interpret=True, input_format="s2d_u8",
                                 upto="stem")
    f8, p8 = build_fused_forward(ref_variables, dtype=jnp.float32,
                                 interpret=True, input_format="s2d8_u8",
                                 upto="stem")
    a = f4(jnp.asarray(pack_images_s2d(img)), p4)
    b = f8(jnp.asarray(pack_images_s2d8(img)), p8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_chunked_stem_exact(monkeypatch):
    """The row-chunked fused stem (halo rows, per-chunk pool masking) is
    EXACTLY the XLA stem.  Integer weights make f32 arithmetic exact, so
    equality is bitwise; the lane budget is shrunk to force 8 chunks."""
    import jax.numpy as jnp
    from jax import lax
    from fastdet.kernels import fused_infer as fi

    monkeypatch.setattr(fi, "_STEM_LANE_BUDGET", 200)
    rng = np.random.RandomState(5)
    ih, iw = 128, 96                      # h4=32, w4=24 → r=4, 8 chunks
    imgs = rng.randint(0, 7, (2, ih, iw, 3), np.uint8)
    sw = rng.randint(-3, 4, (3, 3, 3, 24)).astype(np.float32)
    sb = rng.randint(-2, 3, (24,)).astype(np.float32)

    x = jnp.asarray(imgs, jnp.float32)
    y = lax.conv_general_dilated(x, jnp.asarray(sw), (2, 2),
                                 [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y + sb, 0.0)
    ref = lax.reduce_window(y, -jnp.inf, lax.max, (1, 3, 3, 1),
                            (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])

    w96, b96 = fi.pack_stem_s2d(sw, sb, scale=1.0)
    xs = jnp.asarray(fi.pack_images_s2d(imgs))
    got = fi._stem_call_chunked(xs, jnp.asarray(w96), jnp.asarray(b96),
                                ih // 4, iw // 4, jnp.float32,
                                interpret=True)
    got = np.asarray(got).transpose(0, 2, 1).reshape(2, ih // 4, iw // 4, 24)
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_bn_fold_random_model():
    """BN folding alone (weight packing) reproduces eval-mode ConvBN."""
    from fastdet.kernels.fold import _fold_pw, _fold_dw
    from fastdet.models.layers import ConvBN

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))

    m = ConvBN(16, (1, 1), relu=False)
    v = m.init(jax.random.PRNGKey(0), x, False)
    # give BN non-trivial stats
    v = jax.tree.map(lambda a: a, v)
    stats = {"bn": {"mean": jnp.asarray(rng.randn(16), jnp.float32),
                    "var": jnp.abs(jnp.asarray(rng.randn(16), jnp.float32)) + 0.5}}
    params = {"conv": v["params"]["conv"],
              "bn": {"scale": jnp.asarray(rng.randn(16), jnp.float32),
                     "bias": jnp.asarray(rng.randn(16), jnp.float32)}}
    ref = m.apply({"params": params, "batch_stats": stats}, x, False)

    w, b = _fold_pw(params, stats)
    ours = x @ jnp.asarray(w) + jnp.asarray(b)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ours), atol=1e-5)

    md = ConvBN(16, (3, 3), groups=16, relu=False)
    vd = md.init(jax.random.PRNGKey(1), x, False)
    paramsd = {"conv": vd["params"]["conv"], "bn": params["bn"]}
    refd = md.apply({"params": paramsd, "batch_stats": stats}, x, False)
    wd, bd = _fold_dw(paramsd, stats)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = sum(xp[:, dy:dy + 8, dx:dx + 8, :] * jnp.asarray(wd)[dy, dx]
              for dy in range(3) for dx in range(3)) + jnp.asarray(bd)
    np.testing.assert_allclose(np.asarray(refd), np.asarray(acc), atol=1e-5)
