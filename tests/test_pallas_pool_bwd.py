"""Pallas pool-backward kernel (ops/pallas_pool_bwd.py) vs the XLA
SelectAndScatter oracle. The kernel must route every cotangent to the
FIRST window maximum in row-major window order — exactly like XLA's
reduce_window VJP and torch's SpatialMaxPooling backward — including on
ties, ceil-mode tail rows, and bf16 inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frcnn_tpu.models.layers import ceil_max_pool_2x2
from frcnn_tpu.ops.pallas_pool_bwd import (
    ceil_max_pool_2x2_firstmax,
    pool_bwd_supported,
)


def _oracle_grads(x, g):
    y, vjp = jax.vjp(ceil_max_pool_2x2, x)
    assert y.shape == g.shape
    return vjp(g)[0]


def _kernel_grads(x, g):
    y, vjp = jax.vjp(lambda v: ceil_max_pool_2x2_firstmax(v, True), x)
    assert y.shape == g.shape
    return vjp(g)[0]


def _case(shape, dtype, seed, tie_levels=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, shape).astype(np.float32)
    if tie_levels:
        # quantize to force frequent in-window ties — the routing order
        # (not just the argmax value) is what this exercises
        x = np.round(x * tie_levels) / tie_levels
    B, H, W, C = shape
    Hc, Wc = -(-H // 2), -(-W // 2)
    g = rng.normal(0, 1, (B, Hc, Wc, C)).astype(np.float32)
    return jnp.asarray(x, dtype), jnp.asarray(g, dtype)


@pytest.mark.parametrize("shape,ties", [
    ((2, 8, 16, 64), None),
    ((2, 8, 16, 64), 2),        # heavy ties
    ((1, 7, 16, 64), 3),        # odd H: ceil tail row
    ((1, 9, 8, 128), None),     # odd H, C = one full lane tile
    ((2, 16, 6, 64), 2),        # W smaller than a sublane tile
])
def test_matches_select_and_scatter(shape, ties):
    x, g = _case(shape, jnp.float32, seed=shape[1] * 31 + (ties or 0), tie_levels=ties)
    np.testing.assert_array_equal(
        np.asarray(_kernel_grads(x, g)), np.asarray(_oracle_grads(x, g))
    )


def test_bf16_exact():
    x, g = _case((2, 10, 16, 64), jnp.bfloat16, seed=5, tie_levels=2)
    k = np.asarray(_kernel_grads(x, g), np.float32)
    o = np.asarray(_oracle_grads(x, g), np.float32)
    np.testing.assert_array_equal(k, o)


def test_odd_w_falls_back_to_xla():
    assert not pool_bwd_supported((1, 8, 15, 64))
    x, g = _case((1, 8, 15, 64), jnp.float32, seed=2, tie_levels=2)
    np.testing.assert_array_equal(
        np.asarray(_kernel_grads(x, g)), np.asarray(_oracle_grads(x, g))
    )


def test_forward_values_identical():
    x, _ = _case((2, 9, 14, 64), jnp.float32, seed=9)
    np.testing.assert_array_equal(
        np.asarray(ceil_max_pool_2x2_firstmax(x, True)),
        np.asarray(ceil_max_pool_2x2(x)),
    )


def test_pnet_gradients_match_xla_pool():
    """End-to-end: a small C=64 backbone under both pool_vjp modes must
    produce identical parameter gradients (the kernel swaps only the pool
    backward implementation)."""
    from frcnn_tpu.config import (
        AnchorNetSpec,
        ClassLayerSpec,
        LayerSpec,
        ModelConfig,
    )
    from frcnn_tpu.models.pnet import ProposalNet

    model = ModelConfig(
        name="c64",
        layers=(
            LayerSpec(filters=64, conv_steps=1),
            LayerSpec(filters=64, conv_steps=1),
            LayerSpec(filters=64, conv_steps=1),
            LayerSpec(filters=64, conv_steps=1),
        ),
        anchor_nets=(
            AnchorNetSpec(kW=3, n=16, input=3),
            AnchorNetSpec(kW=3, n=16, input=4),
            AnchorNetSpec(kW=5, n=16, input=4),
            AnchorNetSpec(kW=7, n=16, input=4),
        ),
        class_layers=(ClassLayerSpec(n=32, dropout=0.0),),
    )
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(0, 1, (1, 48, 64, 3)).astype(np.float32))
    p_x = ProposalNet(model_cfg=model, pool_vjp="xla")
    p_k = ProposalNet(model_cfg=model, pool_vjp="pallas_interpret")
    params = p_x.init({"params": jax.random.PRNGKey(0)}, img)["params"]

    def loss(net, p):
        maps, fm = net.apply({"params": p}, img, train=False)
        return sum(jnp.sum(m * m) for m in maps) + jnp.sum(jnp.abs(fm))

    g_x = jax.grad(lambda p: loss(p_x, p))(params)
    g_k = jax.grad(lambda p: loss(p_k, p))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_k)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
