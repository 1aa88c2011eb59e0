"""fastdet — a TPU-native object-detection framework (JAX/XLA/Pallas).

Provides the full capabilities of dog-qiuqiu/Yolo-FastestV2, redesigned
TPU-first: NHWC Flax modules, one-XLA-program fused inference
(forward + anchor decode + NMS), dense-grid anchor-matching loss compiled
to XLA, data-parallel training over a `jax.sharding.Mesh`, orbax
checkpoints, and StableHLO export.

Layout:
    fastdet.config     — Darknet-style `.data`/`.names` config parsing
    fastdet.models     — ShuffleNetV2 backbone, LightFPN neck, Detector head
    fastdet.ops        — IoU/CIoU, anchor decode, fixed-shape NMS, fused postprocess
    fastdet.kernels    — Pallas TPU kernels for the hot ops
    fastdet.train      — dense target building, loss, LR schedule, Trainer
    fastdet.eval       — batched detection statistics + VOC AP metrics
    fastdet.data       — Darknet-format dataset + prefetching host pipeline
    fastdet.parallel   — device mesh / sharding helpers
    fastdet.io         — orbax checkpoints + torch `.pth` weight conversion
    fastdet.export     — StableHLO export of the deploy-mode forward
"""

__version__ = "0.1.0"
