"""Subprocess helper: fused-backbone train forward/grad parity vs linen
in float64 (run by test_fused_train).

f32 comparisons of two equivalent-but-differently-ordered forwards are
dominated by ReLU mask flips on near-zero activations (measured: the
linen path's own f32-vs-f64 grad noise reaches 78% on mathematically-
zero leaves and ~2% elsewhere); at f64 both paths agree to ~1e-12, so
this subprocess pins outputs ≤1e-10, batch stats ≤1e-8, grads ≤1e-4
(relative to each leaf's max) with no flip ambiguity.  Group == batch
for every span here, so ghost BN ≡ full-batch BN and the comparison is
exact semantics, not approximation.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from fastdet.kernels.fused_infer import pack_images_s2d
    from fastdet.models import Detector
    from fastdet.train.fused_forward import build_fused_train_apply

    b = 4
    model = Detector(classes=80, anchor_num=3, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    imgs_u8 = rng.randint(0, 255, (b, 96, 96, 3)).astype(np.uint8)
    imgs = jnp.asarray(imgs_u8)
    x64 = jnp.asarray(imgs_u8, jnp.float64) / 255.0
    variables = model.init(jax.random.PRNGKey(0), x64, train=False)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                          variables["params"])
    stats = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                         variables["batch_stats"])

    outs_l, mut = model.apply({"params": params, "batch_stats": stats},
                              x64, train=True, mutable=["batch_stats"])
    new_l = mut["batch_stats"]

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))

    r2 = [jnp.asarray(rng.randn(*np.asarray(o).shape), jnp.float64)
          for o in outs_l]

    def loss_l(params):
        outs, _ = model.apply({"params": params, "batch_stats": stats},
                              x64, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o * w) for o, w in zip(outs, r2))

    gl = jax.grad(loss_l)(params)
    gl_flat = dict(jax.tree_util.tree_leaves_with_path(gl))

    imgs_s2d = jnp.asarray(pack_images_s2d(imgs_u8))
    for fmt, fmt_imgs in (("nhwc", imgs), ("s2d_u8", imgs_s2d)):
        # stem ghost group == b in both formats here, so ghost BN ==
        # full-batch BN and parity must be exact
        apply_fn = build_fused_train_apply(
            (96, 96), dtype=jnp.float64, interpret=True,
            input_format=fmt, stem_group=b if fmt == "s2d_u8" else None)
        outs_f, new_f = apply_fn(params, stats, fmt_imgs)
        worst_out = max(rel(a, b) for a, b in zip(outs_f, outs_l))
        assert worst_out < 1e-10, f"{fmt} outputs diverge: {worst_out}"
        print(f"MAXDIFF {fmt} outputs {worst_out:.3e}")

        fl = dict(jax.tree_util.tree_leaves_with_path(new_l))
        worst_bs = 0.0
        for path, leaf in jax.tree_util.tree_leaves_with_path(new_f):
            o = np.asarray(fl[path])
            r = (np.abs(np.asarray(leaf) - o).max()
                 / (np.abs(o).max() + 1e-6))
            worst_bs = max(worst_bs, float(r))
        assert worst_bs < 1e-8, f"{fmt} batch stats diverge: {worst_bs}"
        print(f"MAXDIFF {fmt} batch_stats {worst_bs:.3e}")

        def loss_f(params, _ap=apply_fn, _im=fmt_imgs):
            outs, _ = _ap(params, stats, _im)
            return sum(jnp.sum(o * w) for o, w in zip(outs, r2))

        gf = jax.grad(loss_f)(params)
        worst_g = ("", 0.0)
        for path, leaf in jax.tree_util.tree_leaves_with_path(gf):
            o = np.asarray(gl_flat[path])
            r = float(np.abs(np.asarray(leaf) - o).max()
                      / (np.abs(o).max() + 1e-6))
            if r > worst_g[1]:
                worst_g = (jax.tree_util.keystr(path), r)
        assert worst_g[1] < 1e-4, f"{fmt} grads diverge: {worst_g}"
        print(f"MAXDIFF {fmt} grads {worst_g[1]:.3e} ({worst_g[0]})")
    print("PASS")


if __name__ == "__main__":
    main()
