"""Mesh-parallel serving: sharded detect == single-device detect."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.detect.detector import Detector
from frcnn_tpu.models.factory import init_params
from frcnn_tpu.parallel.mesh import make_mesh
from frcnn_tpu.parallel.serving import ShardedDetector
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params, stats


def _force_fg(cfg, params):
    from tests.test_detector import _force_fg_params

    return _force_fg_params(cfg, params)


def test_sharded_detect_matches_single_device(setup):
    cfg, params, stats = setup
    p = _force_fg(cfg, params)
    mesh = make_mesh(n_devices=8)
    assert mesh.devices.size == 8

    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, (8, H, W, 3)).astype(np.float32))
    hw = jnp.tile(jnp.asarray([[H, W]], jnp.int32), (8, 1))

    single = Detector(cfg, p, stats)
    sharded = ShardedDetector(cfg, p, stats, mesh)
    o1 = single.detect(imgs, hw)
    o2 = sharded.detect(np.asarray(imgs), np.asarray(hw))
    np.testing.assert_array_equal(np.asarray(o1.valid), np.asarray(o2.valid))
    np.testing.assert_allclose(
        np.asarray(o1.boxes), np.asarray(o2.boxes), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(o1.classes), np.asarray(o2.classes)
    )
    # inputs really were sharded over the data axis
    assert o2.boxes.shape[0] == 8


def test_sharded_detect_rejects_indivisible_batch(setup):
    cfg, params, stats = setup
    mesh = make_mesh(n_devices=8)
    sharded = ShardedDetector(cfg, params, stats, mesh)
    H, W = cfg.shapes.image_hw
    with pytest.raises(AssertionError):
        sharded.detect(np.zeros((3, H, W, 3), np.float32),
                       np.tile(np.asarray([[H, W]], np.int32), (3, 1)))


def test_sharded_detect_s2d_layout(setup):
    """s2d input layout through the sharded path (host-side pack +
    tuple input broadcast over the data sharding) == NHWC sharded."""
    cfg, params, stats = setup
    p = _force_fg(cfg, params)
    mesh = make_mesh(n_devices=8)
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(3)
    imgs = rng.normal(0.3, 0.2, (8, H, W, 3)).astype(np.float32)
    hw = np.tile(np.asarray([[H, W]], np.int32), (8, 1))

    ref = ShardedDetector(cfg.replace(pallas_mode="interpret"), p, stats,
                          mesh).detect(imgs, hw)
    cfg_s = cfg.replace(pallas_mode="interpret", input_layout="s2d")
    got = ShardedDetector(cfg_s, p, stats, mesh).detect(imgs, hw)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.boxes)[v],
                               np.asarray(ref.boxes)[v], rtol=0.02, atol=0.5)


def test_serving_config_s2d_gating():
    """s2d needs a single-3x3 first block AND even sizes for EVERY compile
    bucket (a lazily-built odd portrait program would fail mid-serving)."""
    import dataclasses as dc

    from frcnn_tpu.config import (
        duplo_config,
        serving_config,
        vgg_large_model,
    )

    assert serving_config().input_layout == "s2d"
    assert serving_config().pallas_mode == "on"
    # vgg_large: 2-conv first block, served by the fused 2-conv s2d
    # kernel (ops/pallas_block0_2conv.py)
    large = serving_config(duplo_config().replace(model=vgg_large_model()))
    assert large.input_layout == "s2d"
    assert large.pallas_mode == "on"
    # anything but a 3x3/1/1 1- or 2-conv first block stays NHWC
    import dataclasses as _dc

    base5 = duplo_config()
    layers = list(base5.model.layers)
    layers[0] = _dc.replace(layers[0], kH=5, kW=5, padH=2, padW=2)
    base5 = base5.replace(
        model=_dc.replace(base5.model, layers=tuple(layers)))
    assert serving_config(base5).input_layout == "nhwc"
    # an odd-sized portrait bucket must disable s2d at config time
    base = duplo_config()
    base = base.replace(shapes=dc.replace(
        base.shapes, image_hw=(450, 800), portrait_hw=(801, 450)))
    assert serving_config(base).input_layout == "nhwc"
