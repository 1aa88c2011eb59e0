from fastdet.train.targets import build_dense_targets, pack_labels
from fastdet.train.loss import compute_loss
from fastdet.train.schedule import make_lr_schedule

__all__ = ["build_dense_targets", "pack_labels", "compute_loss",
           "make_lr_schedule"]
