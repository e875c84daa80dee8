from frcnn_tpu.train.losses import smooth_l1, cross_entropy_fg_bg, nll_loss
from frcnn_tpu.train.objective import TrainBatch, build_objective

__all__ = [
    "smooth_l1",
    "cross_entropy_fg_bg",
    "nll_loss",
    "TrainBatch",
    "build_objective",
]
