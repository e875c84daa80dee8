"""Config ablations from BASELINE.json: 7x7 ROI grid, alternate color
spaces — the knobs the reference exposes via config."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import RoiPoolingConfig
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import cnet_input_dim, create_models, init_params
from frcnn_tpu.ops.color import convert_color, rgb2yuv, yuv2rgb
from frcnn_tpu.train.objective import build_objective
from tests.test_objective import make_batch
from tests.tiny import tiny_config


def test_roi_pooling_7x7_objective_runs():
    cfg = tiny_config().replace(roi_pooling=RoiPoolingConfig(kw=7, kh=7))
    assert cnet_input_dim(cfg) == 7 * 7 * cfg.model.layers[-1].filters
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    loss_fn = build_objective(cfg, gen, pnet, cnet)
    batch = make_batch(cfg, np.random.default_rng(0))
    total, (_, metrics) = loss_fn(params, stats, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))


def test_roi_pool_7x7_oracle():
    from frcnn_tpu.ops.roi_pool import adaptive_max_pool
    from tests.reference_oracles import adaptive_max_pool_oracle

    rng = np.random.default_rng(1)
    fm = rng.normal(size=(29, 50, 4)).astype(np.float32)
    rect = jnp.array([[3.0, 2.0, 43.0, 27.0]])
    out = np.asarray(adaptive_max_pool(jnp.asarray(fm), rect, 7, 7))[0]
    expect = adaptive_max_pool_oracle(fm[2:27, 3:43], 7, 7)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_color_spaces_roundtrip_and_ranges():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    yuv = rgb2yuv(img)
    np.testing.assert_allclose(yuv2rgb(yuv), img, atol=1e-5)
    lab = convert_color(img, "lab")
    assert lab[..., 0].min() >= -1e-4 and lab[..., 0].max() <= 100.001
    hsv = convert_color(img, "hsv")
    assert hsv.min() >= -1e-6 and hsv.max() <= 1.0 + 1e-6
    assert convert_color(img, "rgb") is img


@pytest.mark.parametrize("space", ["rgb", "lab", "hsv"])
def test_pipeline_alternate_color_space(space, tmp_path):
    from frcnn_tpu.data.pipeline import BatchIterator
    from tests.test_e2e_synthetic import make_dataset

    make_dataset(tmp_path, n=4)
    cfg = tiny_config().replace(
        target_smaller_side=128, max_pixel_size=192,
        examples_base_path=str(tmp_path), color_space=space,
        normalization=dataclasses.replace(
            tiny_config().normalization,
            method="none" if space == "hsv" else "contrastive",
        ),
    )
    it = BatchIterator(cfg, str(tmp_path / "manifest.json"), seed=1)
    # lab/hsv must take the Python path (nonlinear vs resampling order)
    if space in ("lab", "hsv"):
        assert not it.use_native
    batch = it.next_training_batch()
    assert np.isfinite(np.asarray(batch.image)).all()
    assert batch.gt_mask.any()
