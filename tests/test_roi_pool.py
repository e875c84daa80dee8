"""Adaptive-max ROI pooling vs the torch bin-edge oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import vgg_small_model
from frcnn_tpu.geometry.localizer import Localizer, layer_infos_for_feature_map
from frcnn_tpu.ops.roi_pool import adaptive_max_pool, prepare_roi_rects
from tests.reference_oracles import adaptive_max_pool_oracle


def test_pool_full_map_matches_oracle():
    rng = np.random.default_rng(0)
    fm = rng.normal(size=(29, 50, 8)).astype(np.float32)
    rect = jnp.array([[0.0, 0.0, 50.0, 29.0]])
    out = np.asarray(adaptive_max_pool(jnp.asarray(fm), rect, 6, 6))[0]
    expect = adaptive_max_pool_oracle(fm, 6, 6)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_pool_subrects_match_oracle(seed):
    rng = np.random.default_rng(seed)
    fm = rng.normal(size=(29, 50, 4)).astype(np.float32)
    rects = []
    for _ in range(8):
        x0 = rng.integers(0, 45)
        y0 = rng.integers(0, 25)
        x1 = rng.integers(x0 + 1, 51)
        y1 = rng.integers(y0 + 1, 30)
        rects.append([x0, y0, x1, y1])
    rects = np.array(rects, np.float32)
    out = np.asarray(adaptive_max_pool(jnp.asarray(fm), jnp.asarray(rects), 6, 6))
    for i, (x0, y0, x1, y1) in enumerate(rects.astype(int)):
        expect = adaptive_max_pool_oracle(fm[y0:y1, x0:x1], 6, 6)
        np.testing.assert_allclose(out[i], expect, rtol=1e-6, err_msg=str(rects[i]))


def test_pool_region_smaller_than_grid():
    """Regions smaller than 6x6 have overlapping bins — every bin must
    still see at least one cell (torch semantics)."""
    rng = np.random.default_rng(5)
    fm = rng.normal(size=(20, 20, 3)).astype(np.float32)
    rect = jnp.array([[4.0, 7.0, 6.0, 10.0]])  # 2x3 region
    out = np.asarray(adaptive_max_pool(jnp.asarray(fm), rect, 6, 6))[0]
    expect = adaptive_max_pool_oracle(fm[7:10, 4:6], 6, 6)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    assert np.isfinite(out).all()


def test_prepare_roi_rects():
    fm_w, fm_h = 50, 29
    rects = jnp.array(
        [
            [-3.0, -2.0, 10.0, 5.0],    # clip left/top
            [45.0, 25.0, 60.0, 40.0],   # clip right/bottom
            [10.0, 10.0, 10.0, 10.0],   # degenerate -> 1 cell
            [55.0, 3.0, 60.0, 8.0],     # fully outside right
            [-9.0, -9.0, -1.0, -1.0],   # fully outside top-left
        ]
    )
    out = np.asarray(prepare_roi_rects(rects, fm_w, fm_h))
    assert out[0].tolist() == [0, 0, 10, 5]
    assert out[1].tolist() == [45, 25, 50, 29]
    assert out[2].tolist() == [9, 9, 10, 10]   # min(min, max-1) pulls back one
    assert out[3].tolist() == [49, 3, 50, 8]
    assert out[4].tolist() == [0, 0, 1, 1]
    # invariants
    assert (out[:, 0] < out[:, 2]).all() and (out[:, 1] < out[:, 3]).all()
    assert (out[:, 0] >= 0).all() and (out[:, 2] <= fm_w).all()


def test_pool_gradient_scatters_to_argmax():
    fm = np.zeros((8, 8, 1), np.float32)
    fm[2, 3, 0] = 5.0  # unique max of the whole map
    rect = jnp.array([[0.0, 0.0, 8.0, 8.0]])

    def f(x):
        return jnp.sum(adaptive_max_pool(x, rect, 1, 1))

    g = np.asarray(jax.grad(f)(jnp.asarray(fm)))
    assert g[2, 3, 0] == 1.0
    assert g.sum() == 1.0


def test_full_extract_path_matches_scalar_localizer():
    """input rect -> feature rect -> pool, against host scalar arithmetic."""
    loc = Localizer(layer_infos_for_feature_map(vgg_small_model()))
    rng = np.random.default_rng(7)
    fm = rng.normal(size=(29, 50, 4)).astype(np.float32)
    input_rects = np.array([[100, 80, 300, 200], [0, 0, 64, 64], [700, 400, 810, 460]], np.float32)
    fr = np.asarray(loc.input_to_feature_rect_jax(jnp.asarray(input_rects)))
    prepped = np.asarray(prepare_roi_rects(jnp.asarray(fr), 50, 29)).astype(int)
    out = np.asarray(adaptive_max_pool(jnp.asarray(fm), jnp.asarray(prepped, dtype=np.float32), 6, 6))
    for i in range(len(input_rects)):
        x0, y0, x1, y1 = prepped[i]
        expect = adaptive_max_pool_oracle(fm[y0:y1, x0:x1], 6, 6)
        np.testing.assert_allclose(out[i], expect, rtol=1e-6)
