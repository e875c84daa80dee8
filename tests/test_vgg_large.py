"""vgg_large / imagenet config: construction + forward shapes (the second
model family, reference models/vgg_large.lua + config/imagenet.lua)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import imagenet_config, vgg_large_model
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.geometry.localizer import Localizer, layer_infos_for_tap
from frcnn_tpu.models.factory import cnet_input_dim, create_models


def small_imagenet_cfg():
    cfg = imagenet_config()
    import dataclasses

    return cfg.replace(
        shapes=dataclasses.replace(
            cfg.shapes, image_hw=(192, 256), images_per_step=1,
        ),
        compute_dtype="float32",
    )


def test_vgg_large_spec():
    m = vgg_large_model()
    assert [l.filters for l in m.layers] == [64, 128, 256, 512]
    assert [l.conv_steps for l in m.layers] == [2, 2, 3, 3]
    assert [a.kW for a in m.anchor_nets] == [3, 3, 5, 7]


def test_vgg_large_strides():
    """conv_steps differ from vgg_small but strides per tap are identical
    (pooling structure is the same); offsets grow with the deeper blocks."""
    m = vgg_large_model()
    loc0 = Localizer(layer_infos_for_tap(m, 0))
    assert loc0.scale_x == 8
    loc1 = Localizer(layer_infos_for_tap(m, 1))
    assert loc1.scale_x == 16


def test_imagenet_config_values():
    cfg = imagenet_config()
    assert cfg.class_count == 200
    assert cfg.scales == (48, 96, 192, 384)
    assert cfg.positive_threshold == 0.6
    assert cfg.batch_size == 300
    assert cfg.augmentation.hflip == 0.25 and cfg.augmentation.vflip == 0.0


def test_vgg_large_forward_shapes():
    cfg = small_imagenet_cfg()
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    H, W = cfg.shapes.image_hw
    k = jax.random.PRNGKey(0)
    pvars = pnet.init({"params": k}, jnp.zeros((1, H, W, 3)), train=False)
    amaps, fm = pnet.apply(pvars, jnp.zeros((1, H, W, 3)), train=False)
    for m, (h, w) in zip(amaps, gen.tap_dims):
        assert m.shape == (1, h, w, 18)
    assert fm.shape[-1] == 512
    assert cnet_input_dim(cfg) == 6 * 6 * 512
    assert cnet.num_classes_with_bg == 201
