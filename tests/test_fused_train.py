"""Custom-VJP fused training backbone (fastdet/kernels/fused_train.py,
fastdet/train/fused_forward.py).

Layers of evidence:
  * span-kernel forward+grad parity vs a pure-JAX linen-equivalent
    reference, group == full batch (ghost ≡ full BN), f32 interpret;
  * exact ghost-stat combine (running stats == full-batch stats);
  * full fused-apply vs `Detector.apply` at float64 in a subprocess
    (tests/fused_train_x64.py — f32 comparisons are dominated by ReLU
    mask flips; see that file's header);
  * one fused Trainer step end-to-end (interpret).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from fastdet.kernels.fused_train import (combine_ghost_stats,
                                         make_span_train)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EPS = 1e-5


# ------------------------------------------------------- pure-JAX reference

def _bn_train(u, g, b):
    mu = jnp.mean(u, axis=(0, 1, 2))
    var = jnp.mean((u - mu) ** 2, axis=(0, 1, 2))
    return (u - mu) * lax.rsqrt(var + EPS) * g + b, (mu, var)


def _ref_block(x, p):
    W1, Kdw, W2, g1, b1, g2, b2, g3, b3 = p
    xe, xo = x[..., 0::2], x[..., 1::2]
    u1 = jnp.einsum("bhwi,io->bhwo", xo, W1)
    y1, st1 = _bn_train(u1, g1, b1)
    y = jax.nn.relu(y1)
    u2 = lax.conv_general_dilated(
        y, Kdw, (1, 1), [(1, 1), (1, 1)],
        feature_group_count=y.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    v, st2 = _bn_train(u2, g2, b2)
    u3 = jnp.einsum("bhwi,io->bhwo", v, W2)
    z1, st3 = _bn_train(u3, g3, b3)
    return jnp.concatenate([xe, jax.nn.relu(z1)], -1), (st1, st2, st3)


def _ref_span(x, ps):
    sts = []
    for p in ps:
        x, st = _ref_block(x, p)
        sts.append(st)
    return x, sts


def _pack_ws(ps, c):
    mid = c // 2
    sel_odd = np.zeros((c, mid), np.float32)
    sel_odd[np.arange(1, c, 2), np.arange(mid)] = 1.0
    sel_even = np.zeros((mid, c), np.float32)
    sel_even[np.arange(mid), np.arange(0, c, 2)] = 1.0
    ws = []
    for (W1, Kdw, W2, g1, b1, g2, b2, g3, b3) in ps:
        wa = jnp.concatenate([(jnp.asarray(sel_odd) @ W1).T,
                              jnp.asarray(sel_even)], 0)
        eye = jnp.eye(mid, dtype=jnp.float32)
        wdw = jnp.concatenate(
            [eye * Kdw[t // 3, t % 3, 0][None, :] for t in range(9)], 1)
        gb = jnp.concatenate(
            [a[:, None] for a in (g1, b1, g2, b2, g3, b3)]
            + [jnp.zeros((mid, 2), jnp.float32)], 1)
        ws.append((wa, wdw, gb, W2.T))
    return ws


def _mk_params(rng, mid, nblk):
    ps = []
    for _ in range(nblk):
        ps.append(tuple(jnp.asarray(a.astype(np.float32)) for a in (
            rng.randn(mid, mid) * 0.3, rng.randn(3, 3, 1, mid) * 0.3,
            rng.randn(mid, mid) * 0.3, 1.0 + 0.1 * rng.randn(mid),
            0.1 * rng.randn(mid), 1.0 + 0.1 * rng.randn(mid),
            0.1 * rng.randn(mid), 1.0 + 0.1 * rng.randn(mid),
            0.1 * rng.randn(mid))))
    return ps


def _pack_x(x, b, hw, c, nimg, g):
    xt = x.reshape(b, hw, c)
    xt = jnp.pad(xt, ((0, 0), (0, nimg - hw), (0, 0)))
    xt = xt.transpose(0, 2, 1).reshape(b // g, g, c, nimg)
    return xt.transpose(0, 2, 1, 3).reshape(b // g, c, g * nimg)


def _unpack_x(xt, b, h, w, c, nimg, g):
    xu = xt.reshape(b // g, c, g, nimg).transpose(0, 2, 1, 3)
    return (xu.reshape(b, c, nimg)[:, :, :h * w].transpose(0, 2, 1)
            .reshape(b, h, w, c))


@pytest.mark.parametrize("geom", [(4, 6, 7, 48, 2), (4, 3, 3, 192, 3)],
                         ids=["c48", "c192-stage4geom"])
def test_span_kernel_grad_parity(geom):
    """Forward + ALL gradients vs jax.grad through the reference span,
    group == batch (ghost ≡ full-batch BN), f32 interpret."""
    b, h, w, c, nblk = geom
    mid, hw = c // 2, h * w
    nimg = (hw + 127) // 128 * 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    ps = _mk_params(rng, mid, nblk)
    r = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    span = make_span_train(nblk, h, w, nimg, c, b, dtype=jnp.float32,
                           interpret=True)

    def loss_fused(x, ps):
        out_t, stats = span(_pack_x(x, b, hw, c, nimg, b), _pack_ws(ps, c))
        return jnp.sum(_unpack_x(out_t, b, h, w, c, nimg, b) * r), stats

    def loss_ref(x, ps):
        out, sts = _ref_span(x, ps)
        return jnp.sum(out * r), sts

    (lf, stats), gf = jax.value_and_grad(loss_fused, argnums=(0, 1),
                                         has_aux=True)(x, ps)
    (lr, sts), gr = jax.value_and_grad(loss_ref, argnums=(0, 1),
                                       has_aux=True)(x, ps)
    assert abs(float(lf - lr)) / abs(float(lr)) < 1e-5

    def assert_close(a, b, what):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        # atol floor: grads of a bias feeding a following BN are
        # mathematically 0 (mean-subtracted) — both sides are f32 noise
        assert np.abs(a - b).max() <= 1e-4 * scale + 1e-4, \
            f"{what}: {np.abs(a - b).max()} vs scale {scale}"

    assert_close(gf[0], gr[0], "dx")
    names = ["W1", "Kdw", "W2", "g1", "b1", "g2", "b2", "g3", "b3"]
    for i in range(nblk):
        for j, nm in enumerate(names):
            assert_close(gf[1][i][j], gr[1][i][j], f"blk{i}.{nm}")

    # ghost-stat combine == full-batch stats (single group here)
    mean_c, var_c = combine_ghost_stats(stats)
    for i in range(nblk):
        for j in range(3):
            mr, vr = sts[i][j]
            assert_close(mean_c[i, :, j], mr, f"blk{i}.bn{j}.mean")
            assert_close(var_c[i, :, j], vr, f"blk{i}.bn{j}.var")


def test_ghost_stats_combine_exact():
    """combine_ghost_stats reproduces the pooled mean/var exactly for
    synthetic per-group stats."""
    rng = np.random.RandomState(1)
    G, nblk, mid = 4, 2, 8
    m = 64
    data = rng.randn(G, nblk, mid, m).astype(np.float64)
    stats = np.zeros((G, nblk, mid, 16), np.float32)
    for g in range(G):
        mu = data[g].mean(-1)
        var = data[g].var(-1)
        for j in range(3):   # same data for the 3 BN slots
            stats[g, :, :, 3 * j] = mu
            stats[g, :, :, 3 * j + 2] = var
    mean_c, var_c = combine_ghost_stats(jnp.asarray(stats))
    pooled = data.transpose(1, 2, 0, 3).reshape(nblk, mid, G * m)
    np.testing.assert_allclose(np.asarray(mean_c)[..., 0],
                               pooled.mean(-1), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_c)[..., 0],
                               pooled.var(-1), rtol=2e-5, atol=1e-5)


def test_fused_apply_parity_x64():
    """Full fused-backbone forward vs linen Detector.apply at f64
    (subprocess — x64 is process-global)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "fused_train_x64.py")],
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout


def test_fused_trainer_step_runs():
    """One fused-backbone Trainer step end-to-end (interpret): finite
    loss, params move, span batch_stats update."""
    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.train.trainer import Trainer

    cfg = Config.from_dict({
        "classes": 8, "width": 96, "height": 96, "anchor_num": 3,
        "anchors": [10., 20., 30., 40., 50., 60., 70., 80., 90., 100.,
                    110., 120.],
        "learning_rate": 1e-3, "steps": [100], "subdivisions": 1,
        "batch_size": 4, "epochs": 1})
    model = Detector(classes=8, anchor_num=3)
    trainer = Trainer(model, cfg, steps_per_epoch=10, fused_backbone=True)
    rng = np.random.RandomState(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 96, 3)), train=False)
    state = trainer.init_state(variables)
    imgs = jnp.asarray(rng.randint(0, 255, (4, 96, 96, 3), np.uint8))
    labels = np.zeros((4, 8, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((4, 8), bool)
    mask[:, 0] = True
    # snapshot before stepping — the train step donates its input state
    s0 = np.asarray(
        state.batch_stats["backbone"]["stage3_1"]["main_pw"]["bn"]["var"])
    new_state, metrics = trainer.step(state, imgs, jnp.asarray(labels),
                                      jnp.asarray(mask))
    assert np.isfinite(float(metrics["total"]))
    # step 0's quartic-warmup LR is exactly 0 (reference train.py:112-117
    # semantics), so params don't move yet — assert the momentum trace
    # absorbed a non-zero fused-backbone gradient instead
    flat = [np.abs(np.asarray(x)).max()
            for x in jax.tree.leaves(new_state.opt_state)]
    assert max(flat) > 0, "momentum trace never absorbed a gradient"
    s1 = np.asarray(
        new_state.batch_stats["backbone"]["stage3_1"]["main_pw"]["bn"]
        ["var"])
    assert np.abs(s1 - s0).max() > 0
