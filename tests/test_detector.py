"""Jitted detector: shape/validity/threshold semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.detect.detector import build_detect_fn
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import create_models, init_params
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    detect = jax.jit(build_detect_fn(cfg, gen, pnet, cnet))
    return cfg, gen, pnet, cnet, params, stats, detect


def _images(cfg, rng, b=2):
    H, W = cfg.shapes.image_hw
    imgs = rng.normal(0.3, 0.2, size=(b, H, W, 3)).astype(np.float32)
    hw = np.tile(np.array([[H, W]], np.int32), (b, 1))
    return jnp.asarray(imgs), jnp.asarray(hw)


def test_detect_runs_fixed_shapes(setup):
    cfg, gen, pnet, cnet, params, stats, detect = setup
    imgs, hw = _images(cfg, np.random.default_rng(0))
    out = detect(params, stats, imgs, hw)
    D = cfg.shapes.max_detections
    assert out.boxes.shape == (2, D, 4)
    assert out.classes.shape == (2, D)
    assert out.valid.shape == (2, D)
    assert np.isfinite(np.asarray(out.boxes)[np.asarray(out.valid)]).all()


def test_detect_thresholds(setup):
    """With random-init params, P(fg) ~ 0.5 << 0.95: no detections."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    imgs, hw = _images(cfg, np.random.default_rng(1))
    out = detect(params, stats, imgs, hw)
    # untrained network almost surely yields nothing above 0.95
    assert int(np.asarray(out.valid).sum()) == 0


def _force_fg_params(cfg, params, fg_bias=8.0):
    """Bias the anchor output convs so every cell screams foreground with a
    fixed small regression; makes the proposal path deterministic."""
    import jax.numpy as jnp

    p = jax.tree.map(lambda x: x, params)  # shallow copy via tree
    for ai in range(4):
        name = f"anchor{ai}_out"
        b = np.zeros(18, np.float32)
        for j in range(3):
            b[6 * j + 0] = fg_bias     # fg logit
            b[6 * j + 1] = 0.0
            b[6 * j + 2 :6 * j + 6] = 0.0
        k = np.zeros_like(np.asarray(params["pnet"][name]["kernel"]))
        p["pnet"][name]["kernel"] = jnp.asarray(k)
        p["pnet"][name]["bias"] = jnp.asarray(b)
    return p


def test_detect_forced_proposals(setup):
    """Forcing fg everywhere: proposals appear, NMS thins them, classifier
    (random) gates the rest — valid entries carry consistent data."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    p = _force_fg_params(cfg, params)
    imgs, hw = _images(cfg, np.random.default_rng(2))
    out = detect(p, stats, imgs, hw)
    v = np.asarray(out.valid)
    conf = np.asarray(out.confidence)
    cls = np.asarray(out.classes)
    if v.any():
        assert (conf[v] > 0.2).all()
        assert (cls[v] != cfg.class_count).all()
    # fg scores of surviving proposals exceed the 0.95 gate
    fg = np.asarray(out.fg_score)
    assert (fg[v] > 0.95).all()


def test_result_carries_stage1_survivors(setup):
    """DetectionResult.proposals is the FULL stage-1 NMS survivor set
    (recall attribution input): with forced fg it is nonempty even though
    the untrained classifier may reject everything, and every final
    detection's proposal_boxes row appears in it."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    p = _force_fg_params(cfg, params)
    imgs, hw = _images(cfg, np.random.default_rng(6))
    out = detect(p, stats, imgs, hw)
    pv = np.asarray(out.proposals_valid)
    props = np.asarray(out.proposals)
    assert pv.sum() >= 1
    # invalid survivor slots are zeroed (deterministic padding)
    assert (props[~pv] == 0).all()
    v = np.asarray(out.valid)
    pb = np.asarray(out.proposal_boxes)
    for b in range(v.shape[0]):
        for k in np.nonzero(v[b])[0]:
            d = np.abs(props[b, pv[b]] - pb[b, k]).max(axis=1)
            assert d.min() < 1e-5, (b, k)


def test_detect_fg_threshold_configurable(setup):
    """Lowering cfg.detect_fg_threshold admits more stage-1 survivors on an
    untrained net (P(fg) ~ 0.5 clears 0.3 but not the reference 0.95)."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    imgs, hw = _images(cfg, np.random.default_rng(7))
    out_ref = detect(params, stats, imgs, hw)
    assert int(np.asarray(out_ref.proposals_valid).sum()) == 0
    lo = build_detect_fn(cfg.replace(detect_fg_threshold=0.3), gen, pnet,
                         cnet)
    out_lo = lo(params, stats, imgs, hw)
    assert int(np.asarray(out_lo.proposals_valid).sum()) > 0
    fg = np.asarray(out_lo.fg_score)
    v = np.asarray(out_lo.valid)
    assert (fg[v] > 0.3).all() if v.any() else True


def test_detect_smaller_true_image(setup):
    """True image smaller than the bucket: all reported boxes must overlap
    the true image rect."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    p = _force_fg_params(cfg, params)
    H, W = cfg.shapes.image_hw
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(0.3, 0.2, size=(1, H, W, 3)), jnp.float32)
    hw = jnp.asarray([[96, 128]], jnp.int32)
    out = detect(p, stats, imgs, hw)
    v = np.asarray(out.valid)[0]
    boxes = np.asarray(out.proposal_boxes)[0]
    for b in boxes[v]:
        assert b[0] < 128 and b[2] > 0 and b[1] < 96 and b[3] > 0


def test_detect_deterministic(setup):
    cfg, gen, pnet, cnet, params, stats, detect = setup
    p = _force_fg_params(cfg, params)
    imgs, hw = _images(cfg, np.random.default_rng(4), b=1)
    o1 = detect(p, stats, imgs, hw)
    o2 = detect(p, stats, imgs, hw)
    np.testing.assert_array_equal(np.asarray(o1.boxes), np.asarray(o2.boxes))
    np.testing.assert_array_equal(np.asarray(o1.valid), np.asarray(o2.valid))


def test_select_proposals_topk_on_overflow():
    """More gate passers than K: kept set must be exactly the top-K by
    score (reference keeps everything, Detector.lua:69-85; a cap must drop
    only the worst-scored)."""
    from frcnn_tpu.detect.detector import select_proposals

    rng = np.random.default_rng(7)
    A, K = 200, 16
    score = jnp.asarray(rng.permutation(A).astype(np.float32) * -1e-3)
    keep = jnp.asarray(rng.random(A) < 0.5)[None]  # ~100 passers > K
    idx, valid = jax.jit(select_proposals, static_argnums=2)(
        keep, score[None], K
    )
    idx, valid = np.asarray(idx)[0], np.asarray(valid)[0]
    assert valid.all()
    passers = np.flatnonzero(np.asarray(keep)[0])
    expect = passers[np.argsort(-np.asarray(score)[passers])[:K]]
    assert set(idx.tolist()) == set(expect.tolist())


def test_select_proposals_underflow_keeps_all_passers():
    """<= K passers: kept set == passer set, order-independent."""
    from frcnn_tpu.detect.detector import select_proposals

    rng = np.random.default_rng(8)
    A, K = 200, 32
    score = jnp.asarray(rng.normal(size=A).astype(np.float32))
    keep = jnp.zeros(A, bool).at[jnp.asarray([3, 50, 77, 198])].set(True)[None]
    idx, valid = jax.jit(select_proposals, static_argnums=2)(
        keep, score[None], K
    )
    idx, valid = np.asarray(idx)[0], np.asarray(valid)[0]
    assert valid.sum() == 4
    assert set(idx[valid].tolist()) == {3, 50, 77, 198}


def test_pallas_detect_path_matches_xla(setup):
    """pallas_mode='interpret' runs the Pallas NMS + ROI-pool kernels in
    the full detect program; results must match the XLA path exactly."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    p = _force_fg_params(cfg, params)
    imgs, hw = _images(cfg, np.random.default_rng(6))

    cfg_k = cfg.replace(pallas_mode="interpret")
    detect_k = jax.jit(build_detect_fn(cfg_k, gen, pnet, cnet))
    o_x = detect(p, stats, imgs, hw)
    o_k = detect_k(p, stats, imgs, hw)
    np.testing.assert_array_equal(np.asarray(o_x.valid), np.asarray(o_k.valid))
    np.testing.assert_allclose(
        np.asarray(o_x.boxes), np.asarray(o_k.boxes), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(o_x.classes), np.asarray(o_k.classes)
    )


def test_detect_stop_after_cuts(setup):
    """Profiling cuts (build_detect_fn stop_after) return finite scalar
    checksums at every stage of the real program (scripts/profile_detect.py
    tailparts relies on these)."""
    cfg, gen, pnet, cnet, params, stats, detect = setup
    p = _force_fg_params(cfg, params)
    imgs, hw = _images(cfg, np.random.default_rng(7))
    for cut in ["fwd", "decode", "select", "nms", "pool", "cnet"]:
        fn = jax.jit(build_detect_fn(cfg, gen, pnet, cnet, stop_after=cut))
        out = fn(p, stats, imgs, hw)
        assert out.shape == (), cut
        assert np.isfinite(float(out)), cut
