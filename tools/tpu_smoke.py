#!/usr/bin/env python
"""Real-hardware compile gate for every Pallas entry point.

Two consecutive rounds shipped kernels that were green in interpret mode
(tests pin JAX_PLATFORMS=cpu) but failed Mosaic verification or crashed
the worker on the actual chip (r3: int8 chain; r4: pp_fused f32 iota).
This script is the gate: it COMPILES AND RUNS every Pallas kernel entry
point on the real TPU backend, at every (k, group, tile, input-format)
shape class the framework dispatches, and exits non-zero on the first
failure.  Run it before committing anything that touches
fastdet/kernels/ and note its pass in the commit message:

    python tools/tpu_smoke.py              # all entries
    python tools/tpu_smoke.py --only pp    # substring filter
    python tools/tpu_smoke.py --list       # show entries

Batch sizes are chosen so the kernel GROUP shapes match the serving
defaults (b128): `_pick_group`/pp_fused group sizing depends only on
power-of-2 divisibility and the lane budget, and b=16 reproduces every
b128 group at 352² (verified in-line below).  A persistent JAX
compilation cache makes re-runs take seconds.
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup_jax():
    import jax
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def _variables():
    import jax
    import jax.numpy as jnp
    from fastdet.io.torch_convert import load_npz_variables
    return jax.tree.map(jnp.asarray, load_npz_variables(
        os.path.join(REPO, "weights", "coco2017-ref.npz")))


def _anchors(cfg):
    import jax.numpy as jnp
    import numpy as np
    return jnp.asarray(np.asarray(cfg.anchors, np.float32).reshape(
        cfg.num_scales, cfg.anchor_num, 2))


def _cfg():
    from fastdet.config import Config
    return Config.from_file(os.path.join(REPO, "data", "coco.data"))


def _randu8(shape, seed=0):
    import jax
    import jax.numpy as jnp
    return jax.jit(lambda k: jax.random.randint(k, shape, 0, 255,
                                                jnp.uint8),
                   )(jax.random.PRNGKey(seed))


def _finite_fetch(x):
    """Device→host fetch of a small slice + finiteness check: forces
    real execution (relay acks are not trustworthy) and catches NaN
    garbage from a miscompiled kernel."""
    import jax
    import numpy as np
    v = np.asarray(jax.device_get(x))
    assert np.isfinite(v.astype(np.float64)).all(), "non-finite output"
    return v


# ---------------------------------------------------------------- entries

def entry_detect352_s2d(ctx):
    """Flagship serving path @352 s2d_u8: fused stem + span kernels +
    pp_fused rank→decode→NMS (k=128, the serving default) + compact."""
    import jax
    import jax.numpy as jnp
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.ops.postprocess import postprocess
    fwd, packed = build_fused_forward(
        ctx["variables"], input_hw=(352, 352), dtype=jnp.bfloat16,
        input_format="s2d_u8")
    npad = (88 * 88 + 127) // 128 * 128

    @jax.jit
    def detect(packed, imgs, anc):
        outs = [o.astype(jnp.float32) for o in fwd(imgs, packed)]
        return postprocess(outs, anc, (352, 352), conf_thres=0.3,
                           iou_thres=0.4, max_nms=128)

    imgs = _randu8((16, 48, npad))
    dets, counts = detect(packed, imgs, ctx["anchors"])
    _finite_fetch(dets[:2, :4])
    _finite_fetch(counts)


def entry_detect352_s2d8(ctx):
    """s2d(8) phase-packed stem + fused stride-2+span stage 2."""
    import jax
    import jax.numpy as jnp
    from fastdet.kernels.fused_infer import build_fused_forward
    fwd, packed = build_fused_forward(
        ctx["variables"], input_hw=(352, 352), dtype=jnp.bfloat16,
        input_format="s2d8_u8")
    npad8 = (44 * 44 + 127) // 128 * 128

    @jax.jit
    def run(packed, imgs):
        return fwd(imgs, packed)[0]

    imgs = _randu8((16, 192, npad8))
    _finite_fetch(run(packed, imgs)[:1, :2, :2])


def entry_fuse_s2(ctx):
    """fuse_s2=True: every backbone stage as one Pallas program
    (phase-packed stride-2 prologue + spans)."""
    import jax
    import jax.numpy as jnp
    from fastdet.kernels.fused_infer import build_fused_forward
    fwd, packed = build_fused_forward(
        ctx["variables"], input_hw=(352, 352), dtype=jnp.bfloat16,
        input_format="s2d_u8", fuse_s2=True)
    npad = (88 * 88 + 127) // 128 * 128

    @jax.jit
    def run(packed, imgs):
        return fwd(imgs, packed)[0]

    imgs = _randu8((16, 48, npad))
    _finite_fetch(run(packed, imgs)[:1, :2, :2])


def entry_detect640_s2d(ctx):
    """640² serving: row-chunked fused stem + staged postprocess (the
    k·npad guard keeps 640² windows off the fused pp kernel)."""
    import jax
    import jax.numpy as jnp
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.ops.postprocess import postprocess
    fwd, packed = build_fused_forward(
        ctx["variables"], input_hw=(640, 640), dtype=jnp.bfloat16,
        input_format="s2d_u8")

    @jax.jit
    def detect(packed, imgs, anc):
        outs = [o.astype(jnp.float32) for o in fwd(imgs, packed)]
        return postprocess(outs, anc, (640, 640), conf_thres=0.3,
                           iou_thres=0.4, max_nms=128)

    imgs = _randu8((8, 48, 160 * 160))
    dets, counts = detect(packed, imgs, ctx["anchors"])
    _finite_fetch(dets[:2, :4])


def entry_nms_single_1024(ctx):
    """Single-tile NMS kernel at its largest window (k=1024, group 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastdet.kernels.nms_kernel import suppress_ranked_batch
    rng = np.random.RandomState(1)
    b, k = 8, 1024
    boxes = jnp.asarray(
        np.sort(rng.rand(b, k, 2, 2) * 352, axis=2).reshape(b, k, 4)
        .astype(np.float32))
    score = jnp.asarray(np.sort(rng.rand(b, k).astype(np.float32))[:, ::-1])
    cls = jnp.asarray(rng.randint(0, 80, (b, k)).astype(np.int32))
    valid = score > 0.2
    fn = jax.jit(lambda bx, s, c, v: suppress_ranked_batch(
        bx, s, c, v, iou_thres=0.4, max_det=300))
    dets, counts = fn(boxes, score, cls, valid)
    _finite_fetch(dets[:2, :4])


def entry_nms_blocked_2048(ctx):
    """Blocked (T=512) NMS kernel, eval-grade window k=2048."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastdet.kernels.nms_kernel import suppress_ranked_batch
    rng = np.random.RandomState(2)
    b, k = 4, 2048
    boxes = jnp.asarray(
        np.sort(rng.rand(b, k, 2, 2) * 352, axis=2).reshape(b, k, 4)
        .astype(np.float32))
    score = jnp.asarray(np.sort(rng.rand(b, k).astype(np.float32))[:, ::-1])
    cls = jnp.asarray(rng.randint(0, 80, (b, k)).astype(np.int32))
    valid = score > 0.2
    fn = jax.jit(lambda bx, s, c, v: suppress_ranked_batch(
        bx, s, c, v, iou_thres=0.4, max_det=300))
    dets, counts = fn(boxes, score, cls, valid)
    _finite_fetch(dets[:2, :4])


def _pp_fused_at_k(k):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from fastdet.kernels.pp_fused import rank_decode_nms
    rng = np.random.RandomState(k)
    b, npad, nc, n = 16, 1920, 80, 1815
    score = rng.rand(b, n).astype(np.float32)
    ranked = np.where(score > 0.5, score, -1.0).astype(np.float32)
    cls = rng.randint(0, nc, (b, n)).astype(np.int32)
    iota = np.broadcast_to(np.arange(n, dtype=np.int32), (b, n))
    neg_s, combo_s = lax.sort(
        (jnp.asarray(-ranked), jnp.asarray(iota * nc + cls)),
        dimension=1, is_stable=False, num_keys=2)
    regs = jnp.asarray(rng.randn(b, 4, npad).astype(np.float32))
    geo = np.zeros((8, npad), np.float32)
    geo[0] = rng.randint(0, 22, npad)
    geo[1] = rng.randint(0, 22, npad)
    geo[2] = 16.0
    geo[3:5] = rng.rand(2, npad) * 50 + 5
    fn = jax.jit(lambda a, b_, c, d: rank_decode_nms(
        a, b_, c, d, nc=nc, iou_thres=0.4))
    keep, boxes = fn(neg_s[:, :k], combo_s[:, :k], regs, jnp.asarray(geo))
    _finite_fetch(boxes[:2, :4])


def entry_pp_fused_k128(ctx):
    """Fused rank→decode→NMS, the serving-default window k=128."""
    _pp_fused_at_k(128)


def entry_pp_fused_k256(ctx):
    """Fused rank→decode→NMS, k=256 (the pre-r5 serving window; still
    user-selectable via max_nms)."""
    _pp_fused_at_k(256)


def entry_pp_fused_k384(ctx):
    """Fused rank→decode→NMS, widest dispatched window k=384 (group 2;
    k=512 is excluded from the fused branch — 16.2 MB scoped VMEM even
    at group 1, over the v5e 16 MB limit)."""
    _pp_fused_at_k(384)


def entry_staged_k512(ctx):
    """k=512 serving window through the STAGED path (the fused branch
    caps at 384): 6-operand sort + single-tile NMS kernel."""
    import jax
    import jax.numpy as jnp
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.ops.postprocess import postprocess
    fwd, packed = build_fused_forward(
        ctx["variables"], input_hw=(352, 352), dtype=jnp.bfloat16,
        input_format="s2d_u8")
    npad = (88 * 88 + 127) // 128 * 128

    @jax.jit
    def detect(packed, imgs, anc):
        outs = [o.astype(jnp.float32) for o in fwd(imgs, packed)]
        return postprocess(outs, anc, (352, 352), conf_thres=0.3,
                           iou_thres=0.4, max_nms=512)

    imgs = _randu8((16, 48, npad), seed=5)
    dets, counts = detect(packed, imgs, ctx["anchors"])
    _finite_fetch(dets[:2, :4])


def entry_int8_chain(ctx):
    """int8 PTQ forward + postprocess — the r3 worker-crash shape."""
    import jax
    import jax.numpy as jnp
    from fastdet.ops.postprocess import postprocess
    from fastdet.quant import forward_from, load_quantized
    qw, qsc = load_quantized(os.path.join(REPO, "weights", "coco-int8.npz"))
    fwd_q = forward_from(qw, qsc)
    qw = jax.tree.map(jnp.asarray, qw)

    @jax.jit
    def detect(w, imgs, anc):
        outs = list(fwd_q(imgs, w))
        return postprocess(outs, anc, (352, 352), conf_thres=0.3,
                           iou_thres=0.4, max_nms=128)

    imgs = _randu8((16, 352, 352, 3), seed=3)
    dets, counts = detect(qw, imgs, ctx["anchors"])
    _finite_fetch(dets[:2, :4])


def entry_anchorfree_fused(ctx):
    """Anchor-free family through the shared fused backbone."""
    import jax
    import jax.numpy as jnp
    from fastdet.io.torch_convert import load_npz_variables
    from fastdet.models.anchorfree import build_anchorfree_fused_detect
    af_vars = jax.tree.map(jnp.asarray, load_npz_variables(
        os.path.join(REPO, "weights", "anchorfree-synth.npz")))
    detect, packed = build_anchorfree_fused_detect(
        af_vars, (352, 352), conf_thres=0.3, iou_thres=0.4)
    npad = (88 * 88 + 127) // 128 * 128
    imgs = _randu8((16, 48, npad), seed=4)
    dets, counts = jax.jit(detect)(packed, imgs)
    _finite_fetch(dets[:2, :4])


def entry_train_fused_vjp(ctx):
    """Custom-VJP fused-backbone training: forward + backward span
    kernels at the b128 group shapes (b=16 reproduces them), full
    value_and_grad through loss."""
    import jax
    import jax.numpy as jnp
    from fastdet.train.fused_forward import build_fused_train_apply
    from fastdet.train.loss import compute_loss
    import numpy as np
    apply_fn = build_fused_train_apply((352, 352), dtype=jnp.bfloat16)
    params = ctx["variables"]["params"]
    stats = ctx["variables"]["batch_stats"]
    b = 16
    labels = np.zeros((b, 8, 5), np.float32)
    labels[:, 0, :] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((b, 8), bool)
    mask[:, 0] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)

    @jax.jit
    def step(params, stats, imgs, labels, mask, anc):
        def loss_fn(p):
            x = imgs.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            outs, new_stats = apply_fn(p, stats, x)
            total, comps = compute_loss(outs, labels, mask, anc,
                                        (352, 352))
            return total, new_stats
        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return total, grads, new_stats

    imgs = _randu8((b, 352, 352, 3), seed=6)
    total, grads, new_stats = step(params, stats, imgs, labels, mask,
                                   ctx["anchors"])
    _finite_fetch(total)
    _finite_fetch(grads["backbone"]["stage3_1"]["main_pw"]["conv"]
                  ["kernel"])
    _finite_fetch(new_stats["backbone"]["stage3_1"]["main_pw"]["bn"]
                  ["var"])


def entry_train_fused_stem(ctx):
    """Fused custom-VJP training STEM (s2d input): conv+ghost-BN+ReLU+
    pool forward, pool-routed backward, full value_and_grad."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastdet.train.fused_forward import build_fused_train_apply
    from fastdet.train.loss import compute_loss
    apply_fn = build_fused_train_apply((352, 352), dtype=jnp.bfloat16,
                                       input_format="s2d_u8")
    params = ctx["variables"]["params"]
    stats = ctx["variables"]["batch_stats"]
    b = 16
    npad = (88 * 88 + 127) // 128 * 128
    labels = np.zeros((b, 8, 5), np.float32)
    labels[:, 0, :] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((b, 8), bool)
    mask[:, 0] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)

    @jax.jit
    def step(params, stats, imgs, labels, mask, anc):
        def loss_fn(p):
            outs, new_stats = apply_fn(p, stats, imgs)
            total, comps = compute_loss(outs, labels, mask, anc,
                                        (352, 352))
            return total, new_stats
        (total, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return total, grads, new_stats

    imgs = _randu8((b, 48, npad), seed=7)
    total, grads, new_stats = step(params, stats, imgs, labels, mask,
                                   ctx["anchors"])
    _finite_fetch(total)
    _finite_fetch(grads["backbone"]["first_conv"]["conv"]["kernel"])
    _finite_fetch(grads["backbone"]["first_conv"]["bn"]["scale"])
    _finite_fetch(new_stats["backbone"]["first_conv"]["bn"]["var"])


def entry_golden_pp_fused(ctx):
    """Golden-image CORRECTNESS on hardware: the reference photo
    000139.jpg through the f32 linen forward + the fused
    rank→decode→NMS serving kernel must reproduce the pinned golden
    detections (3 boxes; person ≈ [119.9, 56.3, 186.0, 182.3] conf
    0.87 cls 0 — tests/test_cli.py's golden, reference test.py on
    img/000139.jpg).  The CPU-side twin is
    tests/test_eval_e2e_parity.py::test_fused_serving_path_eval_equal."""
    import cv2
    import numpy as np
    import jax.numpy as jnp
    from fastdet.models import Detector
    from fastdet.ops.postprocess import build_detect_fn
    img_path = os.path.join(
        os.environ.get("FASTDET_REFERENCE", "/root/reference"),
        "img", "000139.jpg")
    if not os.path.exists(img_path):
        raise SkipEntry("reference golden image unavailable")
    cfg = ctx["cfg"]
    img = cv2.resize(cv2.imread(img_path), (cfg.width, cfg.height),
                     interpolation=cv2.INTER_LINEAR)
    detect = build_detect_fn(Detector(classes=cfg.classes,
                                      anchor_num=cfg.anchor_num),
                             cfg, conf_thres=0.3, iou_thres=0.4,
                             max_nms=128, fused=True)
    dets, counts = detect(ctx["variables"], jnp.asarray(img[None]))
    n = int(np.asarray(counts)[0])
    d = np.asarray(dets)[0, :n]
    assert n == 3, f"golden count {n} != 3"
    assert np.allclose(d[0][:4], [119.9, 56.3, 186.0, 182.3],
                       atol=0.75), d[0]
    assert abs(d[0][4] - 0.870) < 0.02 and int(d[0][5]) == 0, d[0]


class SkipEntry(Exception):
    pass


ENTRIES = [
    ("detect352_s2d", entry_detect352_s2d),
    ("detect352_s2d8", entry_detect352_s2d8),
    ("fuse_s2", entry_fuse_s2),
    ("detect640_s2d", entry_detect640_s2d),
    ("nms_single_1024", entry_nms_single_1024),
    ("nms_blocked_2048", entry_nms_blocked_2048),
    ("pp_fused_k128", entry_pp_fused_k128),
    ("pp_fused_k256", entry_pp_fused_k256),
    ("pp_fused_k384", entry_pp_fused_k384),
    ("staged_k512", entry_staged_k512),
    ("int8_chain", entry_int8_chain),
    ("anchorfree_fused", entry_anchorfree_fused),
    ("train_fused_vjp", entry_train_fused_vjp),
    ("train_fused_stem", entry_train_fused_stem),
    ("golden_pp_fused", entry_golden_pp_fused),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on entry names")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run on whatever backend is available "
                         "(kernel paths still take their TPU branches "
                         "via interpret only where they auto-detect; "
                         "this is NOT a hardware gate)")
    args = ap.parse_args()

    if args.list:
        for name, fn in ENTRIES:
            print(f"{name:24s} {fn.__doc__.splitlines()[0]}")
        return 0

    jax = _setup_jax()
    backend = jax.default_backend()
    if backend != "tpu" and not args.allow_cpu:
        print(f"FATAL: backend is {backend!r}, not tpu — this gate only "
              "means something on real hardware (use --allow-cpu to "
              "override for plumbing tests)")
        return 2

    ctx = {"variables": _variables(), "cfg": _cfg()}
    ctx["anchors"] = _anchors(ctx["cfg"])

    selected = [(n, f) for n, f in ENTRIES
                if args.only is None or args.only in n]
    failures, skips = [], []
    t_all = time.time()
    for name, fn in selected:
        t0 = time.time()
        try:
            fn(ctx)
            print(f"PASS {name:24s} {time.time() - t0:6.1f}s")
        except SkipEntry as e:
            print(f"SKIP {name:24s} {e}")
            skips.append(name)
        except Exception:
            print(f"FAIL {name:24s} {time.time() - t0:6.1f}s")
            traceback.print_exc()
            failures.append(name)
    ran = len(selected) - len(skips)
    print(f"== {ran - len(failures)}/{ran} passed"
          + (f" ({len(skips)} skipped)" if skips else "")
          + f" in {time.time() - t_all:.0f}s on backend={backend} ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
