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
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.07, atol=0.12)


@pytest.mark.parametrize("layout", ["zg", "roll"])
def test_block0_2conv_layouts_parity(layout):
    """Both kernel layouts against the XLA oracle (bf16 tolerance)."""
    H, W = 12, 16
    x, w0, b0, w1, b1 = _rand(0, 2, H, W)
    ref = reference_block0_2conv(x, w0, b0, 0.25, w1, b1, 0.1)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights(w1)
    got = fused_block0_2conv(
        cviews, lviews, wt0, bias0, 0.25, w1t, b1, 0.1,
        interpret=True, layout=layout,
    ).astype(jnp.float32).transpose(0, 1, 3, 2)
    assert got.shape == ref.shape == (2, H // 2, W // 2, 64)
    # two chained bf16 matmuls: tolerance at bf16 resolution of the
    # (conv1-amplified) magnitudes
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.07, atol=0.12)


@pytest.mark.parametrize("layout", ["zg", "roll"])
def test_block0_2conv_fp32_exact(layout):
    """compute_dtype=float32 pins every border/halo/shift index decision:
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
        interpret=True, compute_dtype=jnp.float32, layout=layout,
    ).transpose(0, 1, 3, 2)
    ref = reference_block0_2conv(x, w0, b0, 0.25, w1, b1, 0.1)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("layout", ["zg", "roll"])
@pytest.mark.parametrize("tr", [1, 2, 5, 10])
def test_block0_2conv_strip_heights_agree(tr, layout):
    """Every valid strip height yields identical results — halo rows are
    recomputed, not approximated. The two layouts must also agree
    EXACTLY in f32 (same taps, same arithmetic order)."""
    H, W = 20, 16  # Ho=10: tr in {1,2,5,10} all divide
    x, w0, b0, w1, b1 = _rand(2, 1, H, W)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma, out_dtype=jnp.float32)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights(w1)
    kw = dict(interpret=True, compute_dtype=jnp.float32)
    ref = fused_block0_2conv(cviews, lviews, wt0, bias0, 0.2, w1t, b1,
                             0.1, tr=10, layout="roll", **kw)
    got = fused_block0_2conv(cviews, lviews, wt0, bias0, 0.2, w1t, b1,
                             0.1, tr=tr, layout=layout, **kw)
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


def _quantize_w1(w1):
    """models/quant.py scheme: symmetric per-out-channel int8 weights."""
    s_w = np.maximum(np.abs(w1).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    w1q = np.clip(np.round(w1 / s_w), -127, 127).astype(np.int8)
    return w1q, s_w.astype(np.float32)


def quantized_reference_conv1(y, w1q, s_w, s_y, b1, slope1):
    """XLA oracle for the kernel's int8 conv1: quantize y at s_y, int8
    conv (int32 accumulate), dequantize + bias + PReLU + pool."""
    yq = jnp.clip(jnp.round(y / s_y), -127, 127).astype(jnp.int8)
    z = jax.lax.conv_general_dilated(
        yq, jnp.asarray(w1q), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    z = z.astype(jnp.float32) * (s_y * s_w)[None, None, None, :] + b1
    z = jnp.where(z >= 0, z, slope1 * z)
    return ceil_max_pool_2x2(z)


@pytest.mark.parametrize("layout", ["zg", "roll"])
def test_block0_2conv_quant_fp32_exact(layout):
    """int8-conv1 mode, f32 compute: the kernel must reproduce the XLA
    int8 formulation (quantize y0 -> s8 conv -> dequant) to float
    rounding — int32 accumulation is exact, so any tap/scale mistake is a
    gross integer error."""
    from frcnn_tpu.ops.pallas_block0_2conv import block0_2conv_weights_q_jnp

    H, W = 20, 24
    x, w0, b0, w1, b1 = _rand(5, 2, H, W)
    w1q, s_w = _quantize_w1(w1)
    s_y = np.float32(0.05)

    y = _conv(x, w0, b0)
    y = jnp.where(y >= 0, y, 0.25 * y)
    ref = quantized_reference_conv1(y, w1q, s_w, s_y, b1, 0.1)

    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma, out_dtype=jnp.float32)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights_q_jnp(jnp.asarray(w1q))
    got = fused_block0_2conv(
        cviews, lviews, wt0, bias0, 0.25, w1t, b1, 0.1,
        interpret=True, compute_dtype=jnp.float32,
        w1_scales=s_w, act_scale=s_y, layout=layout,
    ).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_block0_2conv_quant_bf16_bounded():
    """bf16 compute only moves y0 by bf16 noise, so the quantized output
    may differ from the f32-quantized oracle by at most a few flipped
    bins; the error bound is a small multiple of the output LSB
    (s_y * s_w * |w| envelope), NOT unbounded float drift."""
    from frcnn_tpu.ops.pallas_block0_2conv import block0_2conv_weights_q_jnp

    H, W = 12, 16
    x, w0, b0, w1, b1 = _rand(6, 2, H, W)
    w1q, s_w = _quantize_w1(w1)
    s_y = np.float32(0.05)

    y = _conv(x, w0, b0)
    y = jnp.where(y >= 0, y, 0.25 * y)
    ref = quantized_reference_conv1(y, w1q, s_w, s_y, b1, 0.1)

    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights_q_jnp(jnp.asarray(w1q))
    got = fused_block0_2conv(
        cviews, lviews, wt0, bias0, 0.25, w1t, b1, 0.1,
        interpret=True, w1_scales=s_w, act_scale=s_y,
    ).astype(jnp.float32).transpose(0, 1, 3, 2)
    d = np.abs(np.asarray(got) - np.asarray(ref))
    # a flipped y0 bin moves one conv1 tap by s_y * s_w[o] * |w1q| <=
    # s_y * |w1|_max; allow a handful of flips plus bf16 epilogue noise
    bound = 9 * s_y * np.abs(w1).max() + 0.02 * np.abs(np.asarray(ref))
    assert (d <= bound).all(), float((d - bound).max())


def test_s2d_2conv_detect_int8_kernel_matches_int8s_xla():
    """Full detect, vgg_large-style 2-conv first block: the s2d path with
    the IN-KERNEL int8 conv1 (cfg.s2d_block0_int8) vs the plain int8s XLA
    path (QuantizedPNetAdapter, NHWC input), forced real detections. The
    two quantize conv1 identically; conv0 is f32 in-kernel vs int8 in the
    adapter, so boxes/confidence match to quantization-level tolerance."""
    import dataclasses

    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from frcnn_tpu.models.factory import create_models, init_params
    from frcnn_tpu.models.quant import (
        QuantizedPNetAdapter,
        quantize_pnet_params,
    )
    from frcnn_tpu.ops.normalization import normalize_image
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

    nc = cfg.normalization
    calib = jax.vmap(
        lambda im, thw: normalize_image(
            im, thw[0], thw[1], method=nc.method, width=nc.width,
            centering=nc.centering, scaling=nc.scaling,
        )
    )(imgs, hw)
    adapter = QuantizedPNetAdapter(
        cfg.model, quantize_pnet_params(params, cfg.model),
        act_dtype=jnp.float32,
    ).calibrate(calib)
    assert "block0_conv1" in adapter.act_scales

    o_ref = build_detect_fn(cfg, gen, adapter, cnet)(params, stats, imgs, hw)
    cfg_s = cfg.replace(input_layout="s2d")
    assert cfg_s.s2d_block0_int8
    o_q = build_detect_fn(cfg_s, gen, adapter, cnet)(
        params, stats, pack_s2d(imgs), hw
    )

    v = np.asarray(o_ref.valid)
    assert v.sum() >= 1, "vacuous parity test: no valid detections"
    np.testing.assert_array_equal(v, np.asarray(o_q.valid))
    # conv0 quantization noise (int8 in the adapter vs f32 in-kernel)
    # reorders near-equal confidences in the final sort, so match
    # detections by nearest box per image (1:1), not by slot
    br, bq = np.asarray(o_ref.boxes), np.asarray(o_q.boxes)
    cr, cq = np.asarray(o_ref.confidence), np.asarray(o_q.confidence)
    kr, kq = np.asarray(o_ref.classes), np.asarray(o_q.classes)
    for b in range(br.shape[0]):
        idx = np.where(v[b])[0]
        taken = set()
        for i in idx:
            d = np.abs(br[b, i] - bq[b, idx]).max(axis=1)
            j = idx[int(d.argmin())]
            assert j not in taken, "two ref detections map to one q slot"
            taken.add(j)
            assert d.min() < 0.5, (b, i, float(d.min()))
            assert kr[b, i] == kq[b, j]
            np.testing.assert_allclose(cq[b, j], cr[b, i],
                                       rtol=0.05, atol=0.01)


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


def test_block0_2conv_kernel_s8_out():
    """out_scale on the 2-conv kernel: int8 output equals quantizing the
    kernel's float output at the same scale (1-lsb tolerance for rounding
    boundary flips)."""
    import jax.numpy as jnp
    from frcnn_tpu.ops.pallas_block0 import (
        block0_weights, pack_s2d, views_from_s2d,
    )
    from frcnn_tpu.ops.pallas_block0_2conv import (
        block0_2conv_weights, fused_block0_2conv,
    )

    H, W = 20, 32
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, H, W, 3)).astype(np.float32))
    w0 = rng.normal(0, 0.2, (3, 3, 3, 16)).astype(np.float32)
    b0 = rng.normal(0, 0.1, (16,)).astype(np.float32)
    w1 = rng.normal(0, 0.2, (3, 3, 16, 16)).astype(np.float32)
    b1 = rng.normal(0, 0.1, (16,)).astype(np.float32)
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights(w1)
    ref = fused_block0_2conv(cviews, lviews, wt0, bias0, 0.25, w1t, b1,
                             0.25, interpret=True, out_dtype=jnp.float32)
    s = float(jnp.max(jnp.abs(ref))) / 127.0
    expect = np.clip(np.round(np.asarray(ref, np.float64) / s), -127, 127)
    got = fused_block0_2conv(cviews, lviews, wt0, bias0, 0.25, w1t, b1,
                             0.25, interpret=True, out_scale=s)
    assert got.dtype == jnp.int8
    diff = np.abs(np.asarray(got, np.int32) - expect.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
