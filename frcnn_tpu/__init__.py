"""frcnn_tpu — a TPU-native two-stage detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Torch7
reference ``andreaskoepf/faster-rcnn.torch``: a Faster R-CNN-style detector
with a multi-scale anchor proposal network (4 pyramid taps on a VGG-style
backbone, 3 equal-area aspect ratios), SPP-style adaptive-max ROI pooling
into a two-headed classifier, joint RPN+classifier training, greedy NMS at
the proposal and per-class stages, dataset importers, augmentation, and
checkpoint/resume.

Unlike the reference (per-anchor host Lua loops, single GPU), everything
after image decode here is fixed-shape, batched, jit-compiled device code,
data-parallel over a ``jax.sharding.Mesh``.

Layout:
  geometry/  box algebra, receptive-field math, dense anchor generation
  ops/       NMS, ROI adaptive max-pool, normalization, color — XLA + Pallas
  models/    flax modules: proposal net (pnet) and classifier head (cnet)
  data/      dataset importers, host decode/augment pipeline, batching
  train/     joint objective, RMSprop trainer, checkpointing, metrics
  detect/    jitted batched inference
  parallel/  mesh + sharding helpers
  utils/     serialization, drawing, logging
"""

__version__ = "0.1.0"

# Primary public API (lazy to keep `import frcnn_tpu` light).
__all__ = [
    "Config", "duplo_config", "imagenet_config", "serving_config",
    "Trainer", "Detector", "ShardedDetector", "BatchIterator",
    "AnchorGenerator",
]


def __getattr__(name):
    if name in ("Config", "duplo_config", "imagenet_config",
                "serving_config"):
        import frcnn_tpu.config as m

        return getattr(m, name)
    if name == "Trainer":
        from frcnn_tpu.train.trainer import Trainer

        return Trainer
    if name == "Detector":
        from frcnn_tpu.detect.detector import Detector

        return Detector
    if name == "ShardedDetector":
        from frcnn_tpu.parallel.serving import ShardedDetector

        return ShardedDetector
    if name == "BatchIterator":
        from frcnn_tpu.data.pipeline import BatchIterator

        return BatchIterator
    if name == "AnchorGenerator":
        from frcnn_tpu.geometry.anchors import AnchorGenerator

        return AnchorGenerator
    raise AttributeError(name)
