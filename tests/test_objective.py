"""Joint objective: runs, finite, correct normalization and masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import create_models, init_params
from frcnn_tpu.train.objective import TrainBatch, build_objective, label_one_image
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    gen = AnchorGenerator(cfg)
    pnet, cnet = create_models(cfg)
    params, stats = init_params(cfg, jax.random.PRNGKey(0))
    loss_fn = build_objective(cfg, gen, pnet, cnet)
    return cfg, gen, pnet, cnet, params, stats, loss_fn


def make_batch(cfg, rng, n_gt=2):
    s = cfg.shapes
    B = s.images_per_step
    H, W = s.image_hw
    img = rng.normal(0.3, 0.2, size=(B, H, W, 3)).astype(np.float32)
    true_hw = np.tile(np.array([[H, W]], np.int32), (B, 1))
    gt_boxes = np.zeros((B, s.max_gt, 4), np.float32)
    gt_cls = np.zeros((B, s.max_gt), np.int32)
    gt_mask = np.zeros((B, s.max_gt), bool)
    for b in range(B):
        for g in range(n_gt):
            x0 = rng.uniform(5, W - 70)
            y0 = rng.uniform(5, H - 70)
            w = rng.uniform(24, 60)
            h = rng.uniform(24, 60)
            gt_boxes[b, g] = [x0, y0, min(x0 + w, W), min(y0 + h, H)]
            gt_cls[b, g] = rng.integers(0, cfg.class_count)
            gt_mask[b, g] = True
    return TrainBatch(
        image=jnp.asarray(img),
        true_hw=jnp.asarray(true_hw),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_classes=jnp.asarray(gt_cls),
        gt_mask=jnp.asarray(gt_mask),
        is_background=jnp.zeros((B,), bool),
    )


def test_label_one_image(setup):
    cfg, gen, *_ = setup
    rng = np.random.default_rng(0)
    gt = jnp.asarray([[40.0, 40.0, 80.0, 75.0], [0, 0, 0, 0]])
    labels = label_one_image(
        cfg, gen, jax.random.PRNGKey(1),
        jnp.asarray([128, 160]), gt,
        jnp.asarray([True, False]), jnp.asarray(False),
    )
    assert int(labels.pos_valid.sum()) >= 1      # a 40x35 box must match
    assert int(labels.neg_valid[: cfg.shapes.max_negatives].sum()) == 16 // 1 or True
    # negatives: exactly 16 requested on foreground images
    assert int(labels.neg_valid[: cfg.shapes.max_negatives].sum()) == min(
        16, cfg.shapes.max_negatives
    )
    # positive anchors actually overlap the gt
    from frcnn_tpu.geometry import boxes as B

    pa = np.asarray(jnp.asarray(gen.boxes)[labels.pos_anchor])
    pv = np.asarray(labels.pos_valid)
    for a in pa[pv]:
        assert (
            float(B.iou(jnp.asarray(a), gt[0])) > cfg.negative_threshold
        )


def test_loss_runs_and_is_finite(setup):
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    batch = make_batch(cfg, np.random.default_rng(1))
    total, (new_stats, metrics) = loss_fn(params, stats, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    for k in ["pcls", "preg", "dcls", "dreg", "loss"]:
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["cls_count"]) > 0
    assert float(metrics["reg_count"]) > 0
    # initial pcls should be near ln(2) for a 2-class random head
    assert 0.1 < float(metrics["pcls"]) < 5.0


def test_gradients_flow_everywhere(setup):
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    batch = make_batch(cfg, np.random.default_rng(2))

    def scalar(p):
        t, _ = loss_fn(p, stats, batch, jax.random.PRNGKey(3))
        return t

    grads = jax.grad(scalar)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert all(np.isfinite(flat))
    nonzero = sum(1 for g in flat if g > 0)
    # every layer should receive gradient (conv, prelu, heads, cnet fcs)
    assert nonzero >= 0.9 * len(flat), f"{nonzero}/{len(flat)} nonzero grads"


def test_extreme_reg_deltas_keep_objective_finite(setup):
    """An untrained head emitting huge log-size deltas must not inf the
    objective (exp overflow in the frozen-proposal decode deadlocked the
    NaN-guarded trainer at the 800x450 scale)."""
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    p = jax.tree.map(lambda x: x, params)
    for ai in range(4):
        name = f"anchor{ai}_out"
        b = np.zeros(18, np.float32)
        for j in range(3):
            b[6 * j + 0] = 5.0            # propose everywhere
            b[6 * j + 2 : 6 * j + 6] = 200.0  # absurd deltas -> exp() inf
        p["pnet"][name]["kernel"] = jnp.zeros_like(
            jnp.asarray(params["pnet"][name]["kernel"])
        )
        p["pnet"][name]["bias"] = jnp.asarray(b)
    batch = make_batch(cfg, np.random.default_rng(9))
    total, (_, metrics) = loss_fn(p, stats, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(total)), metrics
    assert np.isfinite(float(metrics["dreg"]))


def test_remat_gradients_identical(setup):
    """cfg.remat rematerializes the pnet forward (jax.checkpoint); the
    objective value and every gradient must be identical."""
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    batch = make_batch(cfg, np.random.default_rng(7))
    loss_r = build_objective(cfg.replace(remat=True), gen, pnet, cnet)
    key = jax.random.PRNGKey(11)

    def s_plain(p):
        return loss_fn(p, stats, batch, key)[0]

    def s_remat(p):
        return loss_r(p, stats, batch, key)[0]

    t0, g0 = jax.value_and_grad(s_plain)(params)
    t1, g1 = jax.value_and_grad(s_remat)(params)
    assert float(t0) == pytest.approx(float(t1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_loss_invariant_to_padded_gt_garbage(setup):
    """Garbage in masked-out GT slots must not change the objective."""
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    batch = make_batch(cfg, np.random.default_rng(3))
    t1, _ = loss_fn(params, stats, batch, jax.random.PRNGKey(4))
    garbage = batch.gt_boxes.at[:, -1].set(jnp.asarray([3.0, 7.0, 90.0, 60.0]))
    batch2 = batch._replace(
        gt_boxes=garbage,
        gt_classes=batch.gt_classes.at[:, -1].set(2),
    )
    t2, _ = loss_fn(params, stats, batch2, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)


def test_background_slot_has_no_positives(setup):
    cfg, gen, *_ = setup
    labels = label_one_image(
        cfg, gen, jax.random.PRNGKey(5),
        jnp.asarray([128, 160]),
        jnp.zeros((cfg.shapes.max_gt, 4)),
        jnp.zeros((cfg.shapes.max_gt,), bool),
        jnp.asarray(True),
    )
    assert int(labels.pos_valid.sum()) == 0
    # 5% of batch_size=64 -> 3 negatives requested
    expect = int(0.05 * cfg.batch_size)
    assert int(labels.neg_valid.sum()) == expect


def test_jit_compiles(setup):
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    batch = make_batch(cfg, np.random.default_rng(4))
    jitted = jax.jit(loss_fn)
    t1, (_, m1) = jitted(params, stats, batch, jax.random.PRNGKey(6))
    t2, (_, m2) = jitted(params, stats, batch, jax.random.PRNGKey(6))
    assert np.isfinite(float(t1))
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)


def test_pallas_pool_objective_parity(setup):
    """Training objective with the Pallas ROI pool (forward + backward
    kernels, interpret mode): loss and every gradient match the XLA pool
    path."""
    cfg, gen, pnet, cnet, params, stats, loss_fn = setup
    batch = make_batch(cfg, np.random.default_rng(21))
    loss_p = build_objective(
        cfg.replace(pallas_mode="interpret"), gen, pnet, cnet
    )
    key = jax.random.PRNGKey(13)

    t0, g0 = jax.value_and_grad(lambda p: loss_fn(p, stats, batch, key)[0])(
        params
    )
    t1, g1 = jax.value_and_grad(lambda p: loss_p(p, stats, batch, key)[0])(
        params
    )
    assert float(t0) == pytest.approx(float(t1), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
