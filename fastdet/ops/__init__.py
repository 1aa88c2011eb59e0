from fastdet.ops.iou import bbox_ciou, box_iou_xyxy, pairwise_iou_xyxy, xywh2xyxy
from fastdet.ops.decode import decode_outputs, make_grid
from fastdet.ops.nms import batched_nms
from fastdet.ops.postprocess import build_detect_fn, postprocess

__all__ = [
    "bbox_ciou", "box_iou_xyxy", "pairwise_iou_xyxy", "xywh2xyxy",
    "decode_outputs", "make_grid", "batched_nms",
    "build_detect_fn", "postprocess",
]
