from frcnn_tpu.geometry import boxes
from frcnn_tpu.geometry.localizer import LayerInfo, Localizer, layer_infos_for_tap
from frcnn_tpu.geometry.anchors import AnchorGenerator

__all__ = ["boxes", "LayerInfo", "Localizer", "layer_infos_for_tap", "AnchorGenerator"]
