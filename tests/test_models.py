"""Model construction + forward shape/semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.models.factory import cnet_input_dim, create_models, init_params
from frcnn_tpu.models.layers import MaskedBatchNorm, PReLU, ceil_max_pool_2x2
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def cfg():
    return tiny_config()


@pytest.fixture(scope="module")
def params_stats(cfg):
    return init_params(cfg, jax.random.PRNGKey(0))


def test_pnet_output_shapes(cfg, params_stats):
    params, _ = params_stats
    pnet, _ = create_models(cfg)
    gen = AnchorGenerator(cfg)
    H, W = cfg.shapes.image_hw
    x = jnp.zeros((2, H, W, 3))
    anchor_maps, fm = pnet.apply({"params": params["pnet"]}, x, train=False)
    assert len(anchor_maps) == 4
    for m, (h, w) in zip(anchor_maps, gen.tap_dims):
        assert m.shape == (2, h, w, 18)
    fh, fw = gen.fm_hw
    assert fm.shape == (2, fh, fw, cfg.model.layers[-1].filters)


def test_pnet_dropout_only_in_train(cfg, params_stats):
    params, _ = params_stats
    pnet, _ = create_models(cfg)
    H, W = cfg.shapes.image_hw
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, H, W, 3)), jnp.float32)
    a1, _ = pnet.apply({"params": params["pnet"]}, x, train=False)
    a2, _ = pnet.apply({"params": params["pnet"]}, x, train=False)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    k = jax.random.PRNGKey(1)
    a3, _ = pnet.apply(
        {"params": params["pnet"]}, x, train=True, rngs={"dropout": k}
    )
    assert not np.allclose(np.asarray(a1[3]), np.asarray(a3[3]))


def test_prelu_single_shared_param():
    m = PReLU()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 4)))
    assert v["params"]["slope"].shape == (1,)
    assert float(v["params"]["slope"][0]) == 0.25
    y = m.apply(v, jnp.array([-2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(y), [-0.5, 3.0])


def test_ceil_max_pool_odd_size():
    x = jnp.arange(15.0).reshape(1, 3, 5, 1)
    y = ceil_max_pool_2x2(x)
    assert y.shape == (1, 2, 3, 1)  # ceil(3/2), ceil(5/2)
    # window maxes, bottom/right remainder windows see only real cells
    expect = np.array([[6, 8, 9], [11, 13, 14]], np.float32)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], expect)


def test_cnet_shapes_and_logsoftmax(cfg, params_stats):
    params, stats = params_stats
    _, cnet = create_models(cfg)
    D = cnet_input_dim(cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, D)), jnp.float32)
    reg, logp = cnet.apply(
        {"params": params["cnet"], "batch_stats": stats["cnet"]},
        x, jnp.ones((2, 5), bool), train=False,
    )
    assert reg.shape == (2, 5, 4)
    assert logp.shape == (2, 5, cfg.class_count + 1)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), np.ones((2, 5)), rtol=1e-5
    )


def test_masked_batchnorm_ignores_padded_rows():
    bn = MaskedBatchNorm(features=3)
    rng = np.random.default_rng(2)
    x_real = rng.normal(2.0, 1.5, size=(1, 6, 3)).astype(np.float32)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x_real), jnp.ones((1, 6), bool), False)

    # pad with huge garbage rows; masked stats must not change
    x_pad = np.concatenate([x_real, 1e6 * np.ones((1, 4, 3), np.float32)], axis=1)
    mask = np.concatenate([np.ones((1, 6), bool), np.zeros((1, 4), bool)], axis=1)
    y_real, _ = bn.apply(
        v, jnp.asarray(x_real), jnp.ones((1, 6), bool), False,
        mutable=["batch_stats"],
    )
    y_pad, _ = bn.apply(
        v, jnp.asarray(x_pad), jnp.asarray(mask), False, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(y_pad)[:, :6], np.asarray(y_real), rtol=1e-4, atol=1e-4
    )


def test_masked_batchnorm_per_group_stats():
    """Two groups with different distributions both normalize to ~N(0,1) —
    per-image statistics like the reference's per-image cnet batches."""
    bn = MaskedBatchNorm(features=2)
    rng = np.random.default_rng(3)
    g0 = rng.normal(5.0, 2.0, size=(1, 50, 2))
    g1 = rng.normal(-3.0, 0.5, size=(1, 50, 2))
    x = jnp.asarray(np.concatenate([g0, g1], 0), jnp.float32)
    mask = jnp.ones((2, 50), bool)
    v = bn.init(jax.random.PRNGKey(0), x, mask, False)
    y, _ = bn.apply(v, x, mask, False, mutable=["batch_stats"])
    y = np.asarray(y)
    for g in range(2):
        assert abs(y[g].mean()) < 1e-4
        assert y[g].std() == pytest.approx(1.0, abs=1e-2)


def test_masked_batchnorm_running_stat_drift_bounded():
    """Documented divergence (models/layers.py): the reference momentum-steps
    the running stats once per IMAGE (cnet runs per image, objective.lua:164);
    we step once per BATCH with the mean of per-image statistics. Both are
    convex averagers of the same per-image stats, so on a stationary stream
    they converge to the same fixed point; this bounds the trajectory gap."""
    B, R, F = 4, 12, 3
    momentum = 0.1
    bn = MaskedBatchNorm(features=F, momentum=momentum)
    rng = np.random.default_rng(11)

    x0 = jnp.asarray(rng.normal(size=(B, R, F)), jnp.float32)
    mask = jnp.asarray(rng.random((B, R)) < 0.75)
    mask = mask.at[:, 0].set(True)  # >= 1 valid row per image
    v = bn.init(jax.random.PRNGKey(0), x0, mask, False)
    params = {"params": v["params"]}
    stats = {"batch_stats": v["batch_stats"]}

    seq_mean = np.zeros(F)
    seq_var = np.ones(F)
    for step in range(60):
        x = rng.normal(3.0, 2.0, size=(B, R, F)).astype(np.float32)
        _, upd = bn.apply(
            {**params, **stats}, jnp.asarray(x), mask, False,
            mutable=["batch_stats"],
        )
        stats = {"batch_stats": upd["batch_stats"]}
        # oracle: one sequential momentum step per image (torch semantics:
        # biased batch var in the forward, unbiased into the running var)
        for b in range(B):
            m = np.asarray(mask[b])
            rows = x[b][m]
            n = rows.shape[0]
            mu = rows.mean(0)
            var_u = rows.var(0) * n / max(n - 1, 1)
            seq_mean = (1 - momentum) * seq_mean + momentum * mu
            seq_var = (1 - momentum) * seq_var + momentum * var_u

    got_mean = np.asarray(stats["batch_stats"]["mean"])
    got_var = np.asarray(stats["batch_stats"]["var"])
    # same fixed point, trajectory gap bounded well under the stream's noise
    np.testing.assert_allclose(got_mean, seq_mean, atol=0.35)
    np.testing.assert_allclose(got_var, seq_var, rtol=0.2)
    assert np.all(np.abs(got_mean - 3.0) < 1.0)
    assert np.all(np.abs(got_var - 4.0) < 2.0)


def test_msra_init_statistics(cfg, params_stats):
    params, _ = params_stats
    k = params["pnet"]["block3_conv0"]["kernel"]
    kh, kw, cin, cout = k.shape
    expect_std = np.sqrt(2.0 / (kh * kw * cout))
    assert float(jnp.std(k)) == pytest.approx(expect_std, rel=0.2)
    assert float(jnp.abs(params["pnet"]["block3_conv0"]["bias"]).max()) == 0.0

