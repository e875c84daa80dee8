"""Parity of the fused 2-conv s2d block0 kernel (vgg_large's block 0,
``models/vgg_large.lua:5-10``) vs the straightforward conv + PReLU +
conv + PReLU + pool formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.models.layers import ceil_max_pool_2x2
from frcnn_tpu.ops.pallas_block0 import (
    block0_weights,
    pack_s2d,
    views_from_s2d,
)
from frcnn_tpu.ops.pallas_block0_2conv import (
    block0_2conv_nhwc,
    block0_2conv_weights,
    block0_2conv_weights_jnp,
    fused_block0_2conv,
    _pick_tr,
)


def _conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(w, jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def reference_block0_2conv(x, w0, b0, s0, w1, b1, s1):
    y = _conv(x, w0, b0)
    y = jnp.where(y >= 0, y, s0 * y)
    y = _conv(y, w1, b1)
    y = jnp.where(y >= 0, y, s1 * y)
    return ceil_max_pool_2x2(y)


def _rand(seed, B, H, W, f=64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)).astype(np.float32))
    w0 = rng.normal(0, 0.2, (3, 3, 3, f)).astype(np.float32)
    b0 = rng.normal(0, 0.1, (f,)).astype(np.float32)
    w1 = rng.normal(0, 0.08, (3, 3, f, f)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (f,)).astype(np.float32)
    return x, w0, b0, w1, b1


# (12,16): Ho=6 -> tr=6; (26,40): Ho=13 is prime -> tr=1 (every row is a
# strip, maximal halo recompute + masking traffic)
@pytest.mark.parametrize("hw", [(12, 16), (26, 40)])
def test_block0_2conv_parity(hw):
    H, W = hw
    x, w0, b0, w1, b1 = _rand(0, 2, H, W)
    ref = reference_block0_2conv(x, w0, b0, 0.25, w1, b1, 0.1)
    got = block0_2conv_nhwc(x, w0, b0, 0.25, w1, b1, 0.1,
                            interpret=True).astype(jnp.float32)
    assert got.shape == ref.shape == (2, H // 2, W // 2, 64)
    # two chained bf16 matmuls: tolerance at bf16 resolution of the
    # (conv1-amplified) magnitudes
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.07, atol=0.12)


def test_block0_2conv_fp32_exact():
    """compute_dtype=float32 pins every border/halo/roll index decision:
    any mis-shifted tap or unmasked halo row is a gross error, far above
    fp32 tolerance."""
    H, W = 20, 24
    x, w0, b0, w1, b1 = _rand(1, 2, H, W)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma, out_dtype=jnp.float32)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights(w1)
    got = fused_block0_2conv(
        cviews, lviews, wt0, bias0, 0.25, w1t, b1, 0.1,
        interpret=True, compute_dtype=jnp.float32,
    ).transpose(0, 1, 3, 2)
    ref = reference_block0_2conv(x, w0, b0, 0.25, w1, b1, 0.1)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("tr", [1, 2, 5, 10])
def test_block0_2conv_strip_heights_agree(tr):
    """Every valid strip height yields identical results — halo rows are
    recomputed, not approximated."""
    H, W = 20, 16  # Ho=10: tr in {1,2,5,10} all divide
    x, w0, b0, w1, b1 = _rand(2, 1, H, W)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma, out_dtype=jnp.float32)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights(w1)
    kw = dict(interpret=True, compute_dtype=jnp.float32)
    ref = fused_block0_2conv(cviews, lviews, wt0, bias0, 0.2, w1t, b1,
                             0.1, tr=10, **kw)
    got = fused_block0_2conv(cviews, lviews, wt0, bias0, 0.2, w1t, b1,
                             0.1, tr=tr, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_weight_builder_jnp_matches_numpy():
    rng = np.random.default_rng(3)
    w1 = rng.normal(0, 0.1, (3, 3, 64, 64)).astype(np.float32)
    a = block0_2conv_weights(w1)
    b = np.asarray(block0_2conv_weights_jnp(jnp.asarray(w1)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_weight_builder_group_structure():
    """Each [2F, 12F] matrix holds each w1 tap exactly once (transposed),
    in the group its (ry, rx, dy, dx) phase mapping dictates, with the
    unused column-group of each rx all-zero."""
    f = 64
    rng = np.random.default_rng(4)
    w1 = rng.normal(0, 0.1, (3, 3, f, f)).astype(np.float32)
    wt = block0_2conv_weights(w1)
    GROUPS = ((-1, 1), (0, 0), (0, 1), (1, 0))
    for ry in range(2):
        used = np.zeros(12, bool)
        for rx in range(2):
            for dy in range(3):
                rgi = GROUPS.index(divmod(ry + dy - 1, 2))
                for dx in range(3):
                    cgi = GROUPS.index(divmod(rx + dx - 1, 2))
                    g = (rgi - ry) * 4 + cgi
                    used[g] = True
                    blk = wt[ry, rx * f:(rx + 1) * f, g * f:(g + 1) * f]
                    np.testing.assert_array_equal(blk, w1[dy, dx].T)
        # per rx, one of the 4 column-groups is never referenced: its
        # weight blocks must be zero so the matmul ignores that stack slot
        for rx in range(2):
            for g in range(12):
                cgi = g % 4
                unused_cgi = 3 if rx == 0 else 0
                if cgi == unused_cgi:
                    blk = wt[ry, rx * f:(rx + 1) * f, g * f:(g + 1) * f]
                    np.testing.assert_array_equal(blk, np.zeros_like(blk))
        # 3 row-groups x cgi-union{0,1,2}u{1,2,3} = all 12 slots touched
        assert used.sum() == 12


def test_pick_tr():
    assert _pick_tr(225) == 9
    assert _pick_tr(240) == 10
    assert _pick_tr(250) == 10
    assert _pick_tr(13) == 1
    assert _pick_tr(6) == 6


def test_s2d_2conv_detect_path_matches_nhwc():
    """Full detect with a 2-conv first block under input_layout='s2d'
    (fused 2-conv kernel, interpret mode) == the NHWC pallas path, on
    forced real detections (not padding)."""
    import dataclasses

    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from frcnn_tpu.models.factory import create_models, init_params
    from tests.test_detector import _force_fg_params
    from tests.tiny import tiny_config

    cfg = tiny_config().replace(pallas_mode="interpret")
    layers = list(cfg.model.layers)
    layers[0] = dataclasses.replace(layers[0], conv_steps=2)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, layers=tuple(layers))
    )
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    params = _force_fg_params(cfg, params)
    cb = np.zeros(cfg.class_count + 1, np.float32)
    cb[0] = 4.0
    params["cnet"]["cls_head"]["bias"] = jnp.asarray(cb)

    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(7)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, (2, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[H, W], [H - 20, W - 14]], jnp.int32)

    o_ref = build_detect_fn(cfg, gen, pnet, cnet)(params, stats, imgs, hw)
    cfg_s = cfg.replace(input_layout="s2d")
    o_s2d = build_detect_fn(cfg_s, gen, pnet, cnet)(
        params, stats, pack_s2d(imgs), hw
    )

    v = np.asarray(o_ref.valid)
    assert v.sum() >= 1, "vacuous parity test: no valid detections"
    np.testing.assert_array_equal(v, np.asarray(o_s2d.valid))
    np.testing.assert_array_equal(np.asarray(o_ref.classes)[v],
                                  np.asarray(o_s2d.classes)[v])
    np.testing.assert_allclose(np.asarray(o_s2d.boxes)[v],
                               np.asarray(o_ref.boxes)[v],
                               rtol=0.02, atol=0.5)
    np.testing.assert_allclose(np.asarray(o_s2d.confidence)[v],
                               np.asarray(o_ref.confidence)[v],
                               rtol=0.05, atol=0.01)
