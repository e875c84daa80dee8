"""Tiny configuration for fast end-to-end tests on the 1-core CPU backend."""

from frcnn_tpu.config import (
    AnchorNetSpec,
    AugmentationConfig,
    ClassLayerSpec,
    Config,
    LayerSpec,
    ModelConfig,
    StaticShapeConfig,
)


def tiny_model() -> ModelConfig:
    return ModelConfig(
        name="tiny",
        layers=(
            LayerSpec(filters=8, conv_steps=1),
            LayerSpec(filters=16, dropout=0.4, conv_steps=1),
            LayerSpec(filters=24, dropout=0.4, conv_steps=1),
            LayerSpec(filters=32, dropout=0.4, conv_steps=1),
        ),
        anchor_nets=(
            AnchorNetSpec(kW=3, n=32, input=3),
            AnchorNetSpec(kW=3, n=32, input=4),
            AnchorNetSpec(kW=5, n=32, input=4),
            AnchorNetSpec(kW=7, n=32, input=4),
        ),
        class_layers=(
            ClassLayerSpec(n=64, dropout=0.5, batch_norm=True),
            ClassLayerSpec(n=32, dropout=0.5),
        ),
    )


def tiny_config(**overrides) -> Config:
    cfg = Config(
        class_count=3,
        target_smaller_side=128,
        scales=(16, 32, 64, 96),
        max_pixel_size=192,
        augmentation=AugmentationConfig(hflip=0.5, vflip=0.5),
        batch_size=64,
        model=tiny_model(),
        shapes=StaticShapeConfig(
            image_hw=(128, 160),
            images_per_step=2,
            max_gt=4,
            max_positives=16,
            max_negatives=8,
            max_nearby=16,
            max_proposals=64,
            max_detections=16,
        ),
        compute_dtype="float32",
    )
    return cfg.replace(**overrides) if overrides else cfg
