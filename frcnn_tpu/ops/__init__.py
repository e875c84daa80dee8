from frcnn_tpu.ops.nms import nms, nms_indices_sorted, per_class_nms
from frcnn_tpu.ops.roi_pool import adaptive_max_pool, prepare_roi_rects

__all__ = [
    "nms",
    "nms_indices_sorted",
    "per_class_nms",
    "adaptive_max_pool",
    "prepare_roi_rects",
]
