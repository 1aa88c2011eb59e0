"""Serving pipelines: device-fused and native-host-postprocess paths.

Two deployment shapes, mirroring the reference's two inference paths
(python chain vs ncnn C++ deployment):

  * `DevicePipeline` — everything on-TPU in one XLA program (forward +
    decode + NMS).  Lowest latency, fixed max_det.
  * `FusedPipeline` — the same single-program shape on the Pallas
    fused-kernel path (the bench path), consuming the s2d(4) uint8
    input layout the native preprocessor emits; fastest throughput.
  * `HybridPipeline` — the exported deploy graph on TPU (activation maps
    out), decode+NMS on host in the C++ runtime (OpenMP).  Matches the
    ncnn-style split: useful when postprocess must be host-side
    (dynamic det counts, custom filtering) and overlaps TPU/host work.

DevicePipeline/HybridPipeline consume raw uint8 NHWC image batches (the
native preprocessor or the data pipeline produce them); FusedPipeline
takes NHWC or pre-packed s2d batches.

The serving default `max_nms=128` (the pre-NMS top-k window) is sized
for the conf≥0.3 operating point: across the 500-image derived val set
plus the golden image the max pre-NMS candidate count at conf 0.3 is
37 (p99 34), so 128 is output-identical to any larger window with 3.5×
headroom, and measured +12% serving throughput vs 256 (docs/PERF.md
§1).  Deployments that lower `conf_thres` well below 0.3 should raise
`max_nms` accordingly (eval-grade chains use 1024-2048).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from fastdet.config import Config


class DevicePipeline:
    def __init__(self, model, variables, cfg: Config, conf_thres=0.3,
                 iou_thres=0.45, max_det=300, max_nms=128):
        import jax
        import jax.numpy as jnp
        from fastdet.ops.postprocess import build_detect_fn
        self._detect = build_detect_fn(model, cfg, conf_thres=conf_thres,
                                       iou_thres=iou_thres, max_det=max_det,
                                       max_nms=max_nms,
                                       dtype=model.dtype)
        self._variables = variables

    def __call__(self, images_u8: np.ndarray) -> List[np.ndarray]:
        import jax.numpy as jnp
        dets, counts = self._detect(self._variables, jnp.asarray(images_u8))
        dets, counts = np.asarray(dets), np.asarray(counts)
        return [dets[i, :counts[i]] for i in range(len(counts))]


class ShardedPipeline:
    """Data-parallel inference over a device mesh: the batch shards on
    axis 0, params/anchors replicate, and the whole forward + decode +
    NMS program runs SPMD — the serving analog of the DP train step
    (the reference has no multi-device inference at all).

    The batch must divide the mesh size; ragged tails are padded and
    trimmed like StreamingPipeline."""

    def __init__(self, model, variables, cfg: Config, mesh=None,
                 conf_thres=0.3, iou_thres=0.45, max_det=300, max_nms=128):
        import jax
        import jax.numpy as jnp
        from fastdet.ops.postprocess import build_detect_fn
        from fastdet.parallel.mesh import (batch_sharding, make_mesh,
                                           replicated_sharding)
        self._mesh = mesh if mesh is not None else make_mesh()
        self._n_dev = self._mesh.size
        self._data = batch_sharding(self._mesh)
        self._repl = replicated_sharding(self._mesh)
        self._variables = jax.device_put(variables, self._repl)
        self._detect = build_detect_fn(model, cfg, conf_thres=conf_thres,
                                       iou_thres=iou_thres, max_det=max_det,
                                       max_nms=max_nms, dtype=model.dtype)

    def __call__(self, images_u8: np.ndarray) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp
        n = len(images_u8)
        pad = (-n) % self._n_dev
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.zeros((pad,) + images_u8.shape[1:],
                                     images_u8.dtype)])
        images = jax.device_put(jnp.asarray(images_u8), self._data)
        dets, counts = self._detect(self._variables, images)
        dets, counts = np.asarray(dets), np.asarray(counts)
        return [dets[i, :counts[i]] for i in range(n)]


class FusedPipeline:
    """The bench-grade serving path, productized: BN-folded Pallas fused
    forward (fastdet/kernels/fused_infer.py) + on-device top-k decode +
    NMS, consuming the s2d(4) uint8 input layout that the native
    preprocessor emits directly (`native.preprocess_batch_s2d`).

    Accepts NHWC uint8 batches (packed on the host automatically) or
    pre-packed (B, 48, pad128(H/4·W/4)) uint8 batches; `from_files`
    drives the full native decode→resize→pack→detect chain.

    Pass `mesh` (a `jax.sharding.Mesh`) for data-parallel SPMD serving:
    batches shard on axis 0 over every mesh axis, packed weights and
    anchors replicate, and ragged batches are padded to the mesh size
    and trimmed (same contract as ShardedPipeline).

    `family` selects the model head: "yolo-fastestv2" (anchor decode +
    NMS) or "anchorfree" (sigma-squared decode + NMS) — both run the
    same Pallas backbone kernels (fused_infer.py head= parameter).

    `fast_decode=True` uses the scaled-DCT JPEG fast path in the native
    preprocessor (~2× cheaper host decode; pixel values differ slightly
    from the full decode — see csrc/preprocess.cc)."""

    def __init__(self, variables, cfg: Config, conf_thres=0.3,
                 iou_thres=0.45, max_det=300, max_nms=128,
                 dtype=None, interpret: bool = False, mesh=None,
                 family: str = "yolo-fastestv2",
                 fast_decode: bool = False):
        import jax
        import jax.numpy as jnp
        from fastdet.kernels.fused_infer import (build_fused_forward,
                                                 pack_images_s2d)
        from fastdet.ops.postprocess import postprocess
        if dtype is None:
            dtype = jnp.bfloat16
        anchorfree = family in ("anchorfree", "fastestdet")
        self._fast_decode = fast_decode
        self._cfg = cfg
        self._hw = (cfg.height, cfg.width)
        self._npad = ((cfg.height // 4) * (cfg.width // 4) + 127) \
            // 128 * 128
        self._pack_py = pack_images_s2d
        self._anchors = jnp.asarray(
            np.asarray(cfg.anchors, np.float32).reshape(
                cfg.num_scales, cfg.anchor_num, 2)) \
            if not anchorfree else jnp.zeros((0,), jnp.float32)
        fwd, self._packed = build_fused_forward(
            variables, input_hw=self._hw, anchor_num=cfg.anchor_num,
            classes=cfg.classes, dtype=dtype, interpret=interpret,
            input_format="s2d_u8",
            head="anchorfree" if anchorfree else "yolo")

        self._mesh = mesh
        self._n_dev = 1
        if mesh is not None:
            from fastdet.parallel.mesh import (batch_sharding,
                                               replicated_sharding)
            self._n_dev = mesh.size
            self._data = batch_sharding(mesh)
            repl = replicated_sharding(mesh)
            self._packed = jax.device_put(self._packed, repl)
            self._anchors = jax.device_put(self._anchors, repl)

        hw = self._hw

        if anchorfree:
            from fastdet.models.anchorfree import decode_anchorfree
            from fastdet.ops.nms import batched_nms

            @jax.jit
            def detect(packed, images, _anchors):
                obj, cls, reg = fwd(images, packed)
                boxes, obj_p, cls_p = decode_anchorfree(obj, cls, reg, hw)
                return batched_nms(boxes, obj_p, cls_p,
                                   conf_thres=conf_thres,
                                   iou_thres=iou_thres, max_det=max_det,
                                   max_nms=max_nms)
        else:
            @jax.jit
            def detect(packed, images, anchors):
                outs = list(fwd(images, packed))
                return postprocess(outs, anchors, hw,
                                   conf_thres=conf_thres,
                                   iou_thres=iou_thres, max_det=max_det,
                                   max_nms=max_nms)

        self._detect = detect

    def _pack(self, images_u8: np.ndarray) -> np.ndarray:
        from fastdet import native
        if native.available():
            return native.pack_s2d(images_u8)
        return np.asarray(self._pack_py(np.asarray(images_u8)))

    def __call__(self, images_u8: np.ndarray) -> List[np.ndarray]:
        import jax
        import jax.numpy as jnp
        x = np.asarray(images_u8)
        if x.ndim == 4:                      # NHWC → pack on host
            x = self._pack(x)
        n = len(x)
        if self._mesh is not None:
            pad = (-n) % self._n_dev
            if pad:
                x = np.concatenate(
                    [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            x = jax.device_put(jnp.asarray(x), self._data)
        else:
            x = jnp.asarray(x)
        dets, counts = self._detect(self._packed, x, self._anchors)
        dets, counts = np.asarray(dets), np.asarray(counts)
        return [dets[i, :counts[i]] for i in range(n)]

    def preprocess_files(self, paths: Sequence[str]) -> np.ndarray:
        """Decode + resize + s2d-pack image files on the host →
        (N, 48, pad128(H/4·W/4)) uint8, ready for `__call__` (native
        libjpeg/libpng path when built, cv2 fallback otherwise)."""
        from fastdet import native
        if native.available():
            return native.preprocess_batch_s2d(list(paths),
                                               self._cfg.width,
                                               self._cfg.height,
                                               fast=self._fast_decode)
        import cv2
        imgs = np.stack([cv2.resize(cv2.imread(p), (self._cfg.width,
                                                    self._cfg.height))
                         for p in paths])
        return np.asarray(self._pack_py(imgs))

    def from_files(self, paths: Sequence[str]) -> List[np.ndarray]:
        return self(self.preprocess_files(paths))


class StreamingPipeline:
    """Double-buffered stream detection: host preprocessing of batch N+1
    overlaps device inference of batch N via a background producer
    thread and JAX's async dispatch.

    Wraps any batch pipeline (`DevicePipeline`, `ShardedPipeline`, or
    `FusedPipeline`).  Two entry points:

      * `run(frames)` — iterable of model-sized HWC uint8 frames (the
        640×640 streaming stretch config, BASELINE.json);
      * `run_files(paths)` — image files end-to-end: the producer thread
        decodes + resizes + (fused path) s2d-packs each batch with the
        native C++ preprocessor while the consumer drives the device —
        the full host→device→boxes serving rate the reference's 3.29 ms
        Kirin number measures (sample/ncnn/src/yolo-fastestv2.cpp:193-218
        includes decode/resize/normalize)."""

    def __init__(self, pipeline, batch_size: int = 8):
        self._pipe = pipeline
        self._bs = batch_size

    def _stream(self, producer) -> List[np.ndarray]:
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        sentinel = object()

        def run_producer():
            try:
                producer(q)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=run_producer, daemon=True)
        t.start()
        out: List[np.ndarray] = []
        while True:
            item = q.get()
            if item is sentinel:
                break
            batch, valid = item
            out.extend(self._pipe(batch)[:valid])
        t.join()
        return out

    def run(self, frames) -> List[np.ndarray]:
        """frames: iterable of HWC uint8 images (already model-sized).
        Returns per-frame detection arrays, in order."""

        def producer(q):
            buf = []
            for f in frames:
                buf.append(f)
                if len(buf) == self._bs:
                    q.put((np.stack(buf), self._bs))
                    buf = []
            if buf:
                # pad the ragged tail to the static batch size so the
                # jitted detect program never recompiles; the valid
                # count trims the padded outputs
                n = len(buf)
                pad = [np.zeros_like(buf[0])] * (self._bs - n)
                q.put((np.stack(buf + pad), n))

        return self._stream(producer)

    def run_files(self, paths: Sequence[str]) -> List[np.ndarray]:
        """Image files → per-file detection arrays, in order; host
        preprocessing (decode/resize/pack) overlaps device inference.
        Uses the wrapped pipeline's `preprocess_files` when it has one
        (FusedPipeline: native decode straight into the s2d layout),
        else the native NHWC batch preprocessor."""
        pre = getattr(self._pipe, "preprocess_files", None)
        if pre is None:
            from fastdet import native

            def pre(batch_paths):
                return native.preprocess_batch(list(batch_paths))

        paths = list(paths)

        def producer(q):
            for i in range(0, len(paths), self._bs):
                chunk = paths[i:i + self._bs]
                x = pre(chunk)
                n = len(chunk)
                if n < self._bs:                     # static-shape tail
                    x = np.concatenate(
                        [x, np.zeros((self._bs - n,) + x.shape[1:],
                                     x.dtype)])
                q.put((x, n))

        return self._stream(producer)


class HybridPipeline:
    def __init__(self, model, variables, cfg: Config, conf_thres=0.3,
                 iou_thres=0.45, max_det=300):
        import jax
        import jax.numpy as jnp
        self._cfg = cfg
        self._conf = conf_thres
        self._iou = iou_thres
        self._max_det = max_det
        self._anchors = np.asarray(cfg.anchors, np.float32)
        self._variables = variables

        @jax.jit
        def deploy_fwd(variables, images):
            x = images.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
            return model.apply(variables, x, train=False, deploy=True)

        self._fwd = deploy_fwd

    def __call__(self, images_u8: np.ndarray) -> List[np.ndarray]:
        import jax.numpy as jnp
        from fastdet import native
        s2, s3 = self._fwd(self._variables, jnp.asarray(images_u8))
        return native.postprocess(
            np.asarray(s2, np.float32), np.asarray(s3, np.float32),
            self._anchors, (self._cfg.height, self._cfg.width),
            conf_thres=self._conf, iou_thres=self._iou,
            max_det=self._max_det)
