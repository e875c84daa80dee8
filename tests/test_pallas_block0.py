"""Parity of the fused s2d block0 kernel vs the straightforward
conv + PReLU + ceil-pool formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.models.layers import ceil_max_pool_2x2
from frcnn_tpu.ops.pallas_block0 import (
    block0_nhwc,
    block0_weights,
    fused_block0,
    pack_s2d,
    views_from_s2d,
)


def reference_block0(x, w, b, slope):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(w, jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    y = jnp.where(y >= 0, y, slope * y)
    return ceil_max_pool_2x2(y)


@pytest.mark.parametrize("hw", [(12, 16), (26, 40)])
def test_block0_kernel_parity(hw):
    H, W = hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    w = rng.normal(0, 0.2, (3, 3, 3, 64)).astype(np.float32)
    b = rng.normal(0, 0.1, (64,)).astype(np.float32)
    slope = 0.25

    ref = reference_block0(x, w, b, slope)
    got = block0_nhwc(x, w, b, slope, interpret=True).astype(jnp.float32)
    assert got.shape == ref.shape == (2, H // 2, W // 2, 64)
    # bf16 kernel inputs: tolerance at bf16 resolution of the magnitudes
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_block0_kernel_nhwc_out_layout():
    """out_layout='nhwc' (in-kernel transpose) == cmid output transposed."""
    H, W = 12, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    w = rng.normal(0, 0.2, (3, 3, 3, 64)).astype(np.float32)
    b = rng.normal(0, 0.1, (64,)).astype(np.float32)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt, bias = block0_weights(w, b)
    cmid = fused_block0(cviews, lviews, wt, bias, 0.25, interpret=True)
    nhwc = fused_block0(cviews, lviews, wt, bias, 0.25, interpret=True,
                        out_layout="nhwc")
    np.testing.assert_array_equal(
        np.asarray(cmid.transpose(0, 1, 3, 2)), np.asarray(nhwc)
    )


def test_block0_kernel_partial_last_tile():
    """Ho=9 with tr=8 leaves a 1-row last tile; out-of-bounds rows must
    be discarded, in-bounds rows exact."""
    H, W = 18, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, 3)).astype(np.float32))
    w = rng.normal(0, 0.2, (3, 3, 3, 64)).astype(np.float32)
    b = np.zeros(64, np.float32)
    ref = reference_block0(x, w, b, 0.1)
    got = block0_nhwc(x, w, b, 0.1, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_pack_views_basis():
    """The chroma/luminance views index the padded image exactly as the
    patch basis documents: cview_g[b, i, 2(2qy+qx)+c-1, j] and
    lview_g[b, 2qy+qx, i, j] == xpad[2(i+cy)+qy, 2(j+cx)+qx, c]."""
    H, W = 8, 12
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, H, W, 3)).astype(np.float32)
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    lum4, chroma = pack_s2d(jnp.asarray(x))
    cviews, lviews = views_from_s2d(lum4, chroma)
    cviews = [np.asarray(v, np.float32) for v in cviews]
    lviews = [np.asarray(v, np.float32) for v in lviews]
    for cy in range(2):
        for cx in range(2):
            g = 2 * cy + cx
            for qy in range(2):
                for qx in range(2):
                    ph = 2 * qy + qx
                    for c in range(3):
                        want = xp[0, 2 * cy + qy:2 * cy + qy + H:2,
                                  2 * cx + qx:2 * cx + qx + W:2, c]
                        if c == 0:
                            got = lviews[g][0, ph, :, :]
                        else:
                            got = cviews[g][0, :, 2 * ph + c - 1, :]
                        np.testing.assert_allclose(
                            got, want.astype(np.float32), rtol=0.01, atol=0.01
                        )


def test_s2d_detect_path_matches_nhwc():
    """Full detect with input_layout='s2d' (planar normalize + fused
    block0 kernel, interpret mode) == the NHWC pallas path."""
    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from frcnn_tpu.models.factory import create_models, init_params
    from tests.tiny import tiny_config

    cfg = tiny_config().replace(pallas_mode="interpret")
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, (2, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[H, W], [H - 20, W - 14]], jnp.int32)

    o_ref = build_detect_fn(cfg, gen, pnet, cnet)(params, stats, imgs, hw)

    cfg_s = cfg.replace(input_layout="s2d")
    packed = pack_s2d(imgs)
    o_s2d = build_detect_fn(cfg_s, gen, pnet, cnet)(params, stats, packed, hw)

    # the Detector wrapper packs host-side from plain NHWC input
    from frcnn_tpu.detect.detector import Detector

    det = Detector(cfg_s, params, stats, gen=gen, pnet=pnet, cnet=cnet)
    o_wrap = det.detect(np.asarray(imgs), hw)
    np.testing.assert_array_equal(np.asarray(o_s2d.valid),
                                  np.asarray(o_wrap.valid))
    np.testing.assert_allclose(np.asarray(o_wrap.boxes),
                               np.asarray(o_s2d.boxes), rtol=1e-5, atol=1e-3)

    np.testing.assert_array_equal(np.asarray(o_ref.valid),
                                  np.asarray(o_s2d.valid))
    v = np.asarray(o_ref.valid)
    np.testing.assert_array_equal(np.asarray(o_ref.classes)[v],
                                  np.asarray(o_s2d.classes)[v])
    np.testing.assert_allclose(np.asarray(o_s2d.boxes)[v],
                               np.asarray(o_ref.boxes)[v], rtol=0.02, atol=0.5)
    np.testing.assert_allclose(np.asarray(o_s2d.confidence)[v],
                               np.asarray(o_ref.confidence)[v],
                               rtol=0.05, atol=0.01)


def test_block0_kernel_fp32_compute():
    """compute_dtype=float32: the kernel must not silently degrade to
    bf16 — fp32 path matches the fp32 reference to fp32-level tolerance."""
    H, W = 12, 16
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, 3)).astype(np.float32))
    w = rng.normal(0, 0.2, (3, 3, 3, 64)).astype(np.float32)
    b = rng.normal(0, 0.1, (64,)).astype(np.float32)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma, out_dtype=jnp.float32)
    wt, bias = block0_weights(w, b)
    got = fused_block0(cviews, lviews, wt, bias, 0.25, interpret=True,
                       compute_dtype=jnp.float32).transpose(0, 1, 3, 2)
    ref = reference_block0(x, w, b, 0.25)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block0_kernel_s8_out():
    """out_scale: the kernel quantizes in-register; result must equal
    quantizing the kernel's own float output at the same scale (up to the
    1-lsb flips bf16-input rounding can cause near .5 boundaries)."""
    H, W = 26, 40
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    w = rng.normal(0, 0.2, (3, 3, 3, 64)).astype(np.float32)
    b = rng.normal(0, 0.1, (64,)).astype(np.float32)
    slope = 0.25
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt, bias = block0_weights(w, b)
    ref = fused_block0(cviews, lviews, wt, bias, slope, interpret=True,
                       out_dtype=jnp.float32)
    s = float(jnp.max(jnp.abs(ref))) / 127.0
    expect = np.clip(np.round(np.asarray(ref, np.float64) / s), -127, 127)
    got = fused_block0(cviews, lviews, wt, bias, slope, interpret=True,
                       out_scale=s)
    assert got.dtype == jnp.int8
    diff = np.abs(np.asarray(got, np.int32) - expect.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
