from frcnn_tpu.data.importers import (
    create_duplo_manifest,
    create_imagenet_manifest,
    load_manifest,
    save_manifest,
)
from frcnn_tpu.data.pipeline import BatchIterator

__all__ = [
    "create_duplo_manifest",
    "create_imagenet_manifest",
    "load_manifest",
    "save_manifest",
    "BatchIterator",
]
