"""uint8 wire format (``Config.uint8_wire``): the pipeline ships uint8 RGB
canvases and the device does /255 + rgb->yuv (ops/color.py::unwire_uint8).
Checks: wire batches decode to the float path's images within one 1/255
rounding; objective and detector agree across wire formats."""

import dataclasses

import numpy as np
import jax
import pytest

from frcnn_tpu.data.pipeline import BatchIterator
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import create_models, init_params
from frcnn_tpu.ops.color import unwire_uint8
from frcnn_tpu.train.objective import build_objective
from tests.test_e2e_synthetic import make_dataset
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def wire_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("wire")
    make_dataset(root, n=6)
    cfg = tiny_config().replace(
        target_smaller_side=128, max_pixel_size=192,
        examples_base_path=str(root),
    )
    import json
    manifest = str(root / "m.json")
    from frcnn_tpu.data.importers import create_duplo_manifest

    create_duplo_manifest("wire-test", str(root / "boxes.csv"), None,
                          manifest, validation_size=0.25, seed=0)
    return cfg, manifest


def test_pipeline_wire_matches_float_path(wire_setup):
    cfg, manifest = wire_setup
    cfg_w = cfg.replace(uint8_wire=True)
    it_w = BatchIterator(cfg_w, manifest, seed=3, use_native=False)
    it_f = BatchIterator(cfg, manifest, seed=3, use_native=False)
    bw = it_w.next_training_batch()
    bf = it_f.next_training_batch()

    assert bw.image.dtype == np.uint8
    assert bf.image.dtype == np.float32
    np.testing.assert_array_equal(bw.gt_boxes, bf.gt_boxes)
    np.testing.assert_array_equal(bw.true_hw, bf.true_hw)
    # unwire (host-side numpy works too) == the float path's yuv image,
    # up to the single 1/255 quantization (|dRGB| <= 0.5/255, then one
    # linear matmul with row sums ~1)
    un = unwire_uint8(np.asarray(bw.image), cfg.color_space)
    np.testing.assert_allclose(un, bf.image, atol=2.5 / 255)


def test_native_pipeline_wire(wire_setup):
    """The C++ fast path stays enabled under uint8_wire: it decodes in
    float RGB and the canvases are quantized at assembly — same one-
    rounding rule as the Python path (resamplers are Pillow-parity, so
    compare with a small tolerance)."""
    from frcnn_tpu.data import native

    if not native.available():
        pytest.skip("native host pipeline not built")
    cfg, manifest = wire_setup
    cfg_w = cfg.replace(uint8_wire=True)
    it_n = BatchIterator(cfg_w, manifest, seed=3)
    assert it_n.use_native, "uint8_wire must not disable the native path"
    it_p = BatchIterator(cfg_w, manifest, seed=3, use_native=False)
    bn = it_n.next_training_batch()
    bp = it_p.next_training_batch()
    assert bn.image.dtype == np.uint8
    np.testing.assert_array_equal(bn.true_hw, bp.true_hw)
    np.testing.assert_array_equal(bn.gt_boxes, bp.gt_boxes)
    # uint8 levels from two Pillow-parity resamplers: allow +-2 levels
    # on a tiny fraction of pixels
    diff = np.abs(bn.image.astype(np.int16) - bp.image.astype(np.int16))
    assert np.quantile(diff, 0.999) <= 2 and diff.max() <= 8


def test_objective_wire_parity(wire_setup):
    cfg, manifest = wire_setup
    cfg_w = cfg.replace(uint8_wire=True)
    it_w = BatchIterator(cfg_w, manifest, seed=4)
    batch_w = it_w.next_training_batch()
    batch_f = batch_w._replace(
        image=unwire_uint8(np.asarray(batch_w.image), cfg.color_space)
    )

    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    loss_fn = build_objective(cfg, gen, pnet, cnet)
    rng = jax.random.PRNGKey(7)
    tw, (_, mw) = loss_fn(params, stats, batch_w, rng)
    tf, (_, mf) = loss_fn(params, stats, batch_f, rng)
    np.testing.assert_allclose(float(tw), float(tf), rtol=1e-4, atol=1e-5)
    for k in ("pcls", "preg", "dcls", "dreg"):
        np.testing.assert_allclose(float(mw[k]), float(mf[k]),
                                   rtol=1e-3, atol=1e-4)


def test_detector_wire_parity(wire_setup):
    from frcnn_tpu.detect.detector import Detector

    cfg, manifest = wire_setup
    cfg_w = cfg.replace(uint8_wire=True)
    it_w = BatchIterator(cfg_w, manifest, seed=5)
    imgs, hws, _ = it_w.padded_validation_batch(2)
    assert imgs.dtype == np.uint8

    params, stats = init_params(cfg, jax.random.PRNGKey(1))
    det_w = Detector(cfg_w, params, stats)
    det_f = Detector(cfg, params, stats)
    out_w = det_w.detect(imgs, hws)
    out_f = det_f.detect(
        unwire_uint8(imgs, cfg.color_space).astype(np.float32), hws)
    np.testing.assert_array_equal(
        np.asarray(out_w.valid), np.asarray(out_f.valid))
    vw = np.asarray(out_w.valid)
    np.testing.assert_allclose(
        np.asarray(out_w.boxes)[vw], np.asarray(out_f.boxes)[vw],
        rtol=1e-3, atol=0.1)
