"""Int8 serving path: numerical closeness to the fp32 forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.models.factory import create_models, init_params
from frcnn_tpu.models.quant import (
    QuantizedPNetAdapter,
    quant_pnet_apply,
    quantize_pnet_params,
)
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_pnet_params(params, cfg.model)
    return cfg, pnet, params, qparams


def _cos(a, b):
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quant_forward_close_to_fp32(setup):
    cfg, pnet, params, qparams = setup
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    amaps_f, fm_f = pnet.apply({"params": params["pnet"]}, x, train=False)
    amaps_q, fm_q = quant_pnet_apply(qparams, cfg.model, x, act_dtype=jnp.float32)
    assert fm_q.shape == fm_f.shape
    for mf, mq in zip(amaps_f, amaps_q):
        assert mq.shape == mf.shape
        assert _cos(np.asarray(mf), np.asarray(mq)) > 0.995
    assert _cos(np.asarray(fm_f), np.asarray(fm_q)) > 0.995


def test_quant_weights_are_int8(setup):
    cfg, pnet, params, qparams = setup
    w = qparams["block0_conv0"]["w_int8"]
    assert w.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(w.astype(jnp.int32)))) <= 127
    # per-out-channel scale round-trips the extreme weight
    orig = params["pnet"]["block0_conv0"]["kernel"]
    recon = w.astype(jnp.float32) * qparams["block0_conv0"]["scale"]
    rel = float(jnp.max(jnp.abs(recon - orig)) / jnp.max(jnp.abs(orig)))
    assert rel < 0.01


def test_quant_adapter_in_detector(setup):
    cfg, pnet, params, qparams = setup
    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from frcnn_tpu.models.factory import create_models, init_params

    gen = AnchorGenerator(cfg)
    _, cnet = create_models(cfg)
    _, stats = init_params(cfg, jax.random.PRNGKey(0))
    adapter = QuantizedPNetAdapter(cfg.model, qparams, act_dtype=jnp.float32)
    detect = build_detect_fn(cfg, gen, adapter, cnet)
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, (1, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[H, W]], jnp.int32)
    out = detect(params, stats, imgs, hw)
    assert out.boxes.shape[0] == 1  # runs end to end


def _force_fg_qparams(qparams, fg_bias=8.0):
    """Quantized analog of tests/test_detector.py::_force_fg_params: zero
    the int8 anchor-head weights and put the fg bias in the (fp32) bias so
    every cell passes the 0.95 gate — real proposals flow through NMS,
    pool, and cnet instead of the whole output being dead padding."""
    q = jax.tree.map(lambda x: x, qparams)
    for ai in range(4):
        name = f"anchor{ai}_out"
        b = np.zeros(18, np.float32)
        for j in range(3):
            b[6 * j] = fg_bias
        q[name] = {
            "w_int8": jnp.zeros_like(qparams[name]["w_int8"]),
            "scale": qparams[name]["scale"],
            "bias": jnp.asarray(b),
        }
    return q


def test_quant_plus_pallas_detect_matches_quant_xla(setup):
    """The combined serving config (int8 backbone + Pallas kernels) must
    match int8 + XLA formulations exactly — Pallas swaps only the NMS/pool
    implementations, not semantics. Anchor heads are biased to force real
    proposals (an untrained net yields zero valid detections, which made an
    earlier version of this test compare only dead padding)."""
    cfg, pnet, params, qparams = setup
    from frcnn_tpu.detect.detector import build_detect_fn
    from frcnn_tpu.geometry.anchors import AnchorGenerator
    from frcnn_tpu.models.factory import create_models, init_params

    gen = AnchorGenerator(cfg)
    _, cnet = create_models(cfg)
    _, stats = init_params(cfg, jax.random.PRNGKey(0))
    adapter = QuantizedPNetAdapter(
        cfg.model, _force_fg_qparams(qparams), act_dtype=jnp.float32
    )
    # Bias the class head toward class 0 so the conf>0.2 / non-background
    # gates stay open (a random-init cnet can argmax background for every
    # row, which would empty the output again).
    params = jax.tree.map(lambda x: x, params)
    cb = np.zeros(cfg.class_count + 1, np.float32)
    cb[0] = 4.0
    params["cnet"]["cls_head"]["bias"] = jnp.asarray(cb)
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, (1, H, W, 3)).astype(np.float32))
    hw = jnp.asarray([[H, W]], jnp.int32)

    o_x = build_detect_fn(cfg, gen, adapter, cnet)(params, stats, imgs, hw)
    cfg_k = cfg.replace(pallas_mode="interpret")
    o_k = build_detect_fn(cfg_k, gen, adapter, cnet)(params, stats, imgs, hw)
    v_x = np.asarray(o_x.valid)
    np.testing.assert_array_equal(v_x, np.asarray(o_k.valid))
    assert v_x.sum() >= 1, "vacuous parity test: no valid detections"
    np.testing.assert_allclose(
        np.asarray(o_x.boxes), np.asarray(o_k.boxes), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(o_x.classes), np.asarray(o_k.classes)
    )
    np.testing.assert_allclose(
        np.asarray(o_x.confidence), np.asarray(o_k.confidence),
        rtol=1e-5, atol=1e-6,
    )


def test_static_scales_match_dynamic_on_calibration_data(setup):
    """Calibrating on batch X then running static on X must reproduce the
    dynamic-quant forward bit-for-bit: the scales recorded through the
    quantized forward are exactly the ones the dynamic path computes."""
    cfg, pnet, params, qparams = setup
    from frcnn_tpu.models.quant import calibrate_pnet_scales

    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    scales = calibrate_pnet_scales(qparams, cfg.model, x, act_dtype=jnp.float32)
    assert len(scales) > 0 and all(float(s) > 0 for s in scales.values())

    amaps_d, fm_d = quant_pnet_apply(qparams, cfg.model, x, act_dtype=jnp.float32)
    amaps_s, fm_s = quant_pnet_apply(
        qparams, cfg.model, x, act_dtype=jnp.float32, act_scales=scales
    )
    np.testing.assert_array_equal(np.asarray(fm_d), np.asarray(fm_s))
    for md, ms in zip(amaps_d, amaps_s):
        np.testing.assert_array_equal(np.asarray(md), np.asarray(ms))


def test_s2d_calibration_records_scales_from_fused_block0(setup):
    """Round-3 photo-scale parity bug: static scales were calibrated through
    the int8-qconv block0 while s2d inference consumed the fused Pallas
    kernel's block0 output (a different distribution) — -0.020 mAP.
    calibrate_quantized_pnet must record block1's scale from the SAME fused
    block0 the serving program computes: exactly absmax(b0)/127 here."""
    cfg, pnet, params, qparams = setup
    from frcnn_tpu.detect.detector import (
        calibrate_quantized_pnet,
        compute_s2d_block0,
    )
    from frcnn_tpu.ops.pallas_block0 import pack_s2d_np

    scfg = cfg.replace(pallas_mode="interpret", input_layout="s2d")
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(5)
    calib = rng.normal(0, 0.5, (2, H, W, 3)).astype(np.float32)
    adapter = QuantizedPNetAdapter(scfg.model, qparams, act_dtype=jnp.float32)
    calibrate_quantized_pnet(scfg, adapter, params, calib)
    scales = adapter.act_scales
    # block0's own conv never runs in s2d inference -> no scale recorded;
    # 1-conv first block -> no in-kernel conv1 scale either
    assert "block1_conv0" in scales
    assert "block0_conv0" not in scales and "block0_conv1" not in scales

    lum4, chroma = pack_s2d_np(calib)
    b0 = compute_s2d_block0(
        scfg, adapter, params["pnet"], jnp.asarray(lum4), jnp.asarray(chroma)
    )
    expect = max(float(jnp.max(jnp.abs(b0))) / 127.0, 1e-12)
    np.testing.assert_allclose(
        float(scales["block1_conv0"]), expect, rtol=1e-6
    )


def test_s2d_calibration_2conv_records_in_kernel_conv1_scale():
    """2-conv first block (vgg_large-style): s2d calibration must also
    record block0_conv1's scale (the fused kernel quantizes its in-kernel
    conv1 input with it) from the conv0+PReLU activation."""
    import dataclasses

    from frcnn_tpu.detect.detector import calibrate_quantized_pnet
    from frcnn_tpu.models.factory import init_params
    from tests.tiny import tiny_config

    cfg = tiny_config().replace(pallas_mode="interpret", input_layout="s2d")
    layers = list(cfg.model.layers)
    layers[0] = dataclasses.replace(layers[0], conv_steps=2)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, layers=tuple(layers)))
    params, _ = init_params(cfg, jax.random.PRNGKey(1))
    qparams = quantize_pnet_params(params, cfg.model)
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(6)
    calib = rng.normal(0, 0.5, (2, H, W, 3)).astype(np.float32)
    adapter = QuantizedPNetAdapter(cfg.model, qparams, act_dtype=jnp.float32)
    calibrate_quantized_pnet(cfg, adapter, params, calib)
    assert "block0_conv1" in adapter.act_scales
    assert float(adapter.act_scales["block0_conv1"]) > 0
    assert "block1_conv0" in adapter.act_scales
    assert "block0_conv0" not in adapter.act_scales


def test_static_scales_close_to_fp32_on_unseen_data(setup):
    """Static scales calibrated on one batch must stay accurate on a
    different batch (the serving scenario)."""
    cfg, pnet, params, qparams = setup
    from frcnn_tpu.models.quant import calibrate_pnet_scales

    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(4)
    xc = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    xe = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    scales = calibrate_pnet_scales(qparams, cfg.model, xc, act_dtype=jnp.float32)
    amaps_f, fm_f = pnet.apply({"params": params["pnet"]}, xe, train=False)
    amaps_s, fm_s = quant_pnet_apply(
        qparams, cfg.model, xe, act_dtype=jnp.float32, act_scales=scales
    )
    for mf, ms in zip(amaps_f, amaps_s):
        assert _cos(np.asarray(mf), np.asarray(ms)) > 0.99
    assert _cos(np.asarray(fm_f), np.asarray(fm_s)) > 0.99


def test_pool_s8_exact_vs_default_order(setup):
    """pool_s8 reorders quantize before the 2x2 pool. round(x/s) is
    monotone non-decreasing, so max commutes with it and the int8 stream
    feeding every downstream conv is IDENTICAL; anchor maps and the
    (dequantized) feature map must match the default order exactly."""
    from frcnn_tpu.models.quant import calibrate_pnet_scales

    cfg, pnet, params, qparams = setup
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, H, W, 3)).astype(np.float32))
    scales = calibrate_pnet_scales(qparams, cfg.model, x, act_dtype=jnp.float32)
    ref_maps, ref_fm = quant_pnet_apply(
        qparams, cfg.model, x, act_dtype=jnp.float32, act_scales=scales
    )
    got_maps, got_fm = quant_pnet_apply(
        qparams, cfg.model, x, act_dtype=jnp.float32, act_scales=scales,
        pool_s8=True,
    )
    for mr, mg in zip(ref_maps, got_maps):
        np.testing.assert_array_equal(np.asarray(mr), np.asarray(mg))
    # fm travels quantize->dequantize in pool_s8 mode: one rounding step
    # at the calibrated scale
    s_fm = max(float(scales[f"anchor{ai}_conv"])
               for ai, a in enumerate(cfg.model.anchor_nets)
               if a.input - 1 == len(cfg.model.layers) - 1)
    np.testing.assert_allclose(
        np.asarray(ref_fm), np.asarray(got_fm), atol=s_fm * 0.5 + 1e-6
    )


def test_s2d_pool_s8_chain_close_to_default(setup):
    """Full s8 chain (s2d fused block0 emitting int8 + s8-pooled blocks):
    anchor maps must track the default int8s+s2d path — the only deltas
    are bf16-vs-f32 rounding ahead of each quantize."""
    cfg, pnet, params, qparams = setup
    from frcnn_tpu.detect.detector import (
        calibrate_quantized_pnet,
        compute_s2d_block0,
    )
    from frcnn_tpu.ops.pallas_block0 import pack_s2d_np

    scfg = cfg.replace(pallas_mode="interpret", input_layout="s2d")
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(9)
    calib = rng.normal(0, 0.5, (2, H, W, 3)).astype(np.float32)
    lum4, chroma = pack_s2d_np(calib)
    lum4, chroma = jnp.asarray(lum4), jnp.asarray(chroma)

    outs = {}
    for pool_s8 in (False, True):
        adapter = QuantizedPNetAdapter(
            scfg.model, qparams, act_dtype=jnp.float32, pool_s8=pool_s8
        )
        calibrate_quantized_pnet(scfg, adapter, params, calib)
        b0 = compute_s2d_block0(scfg, adapter, params["pnet"], lum4, chroma)
        assert isinstance(b0, tuple) == pool_s8
        outs[pool_s8] = adapter.apply({}, None, block0_out=b0)

    for mr, mg in zip(outs[False][0], outs[True][0]):
        assert _cos(np.asarray(mr), np.asarray(mg)) > 0.999
