"""Pallas batched NMS (interpret mode) vs the XLA implementation/oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.ops.nms import nms
from frcnn_tpu.ops.pallas_nms import pallas_nms
from tests.reference_oracles import nms_oracle
from tests.test_nms import random_cluttered_boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thr", [0.1, 0.25, 0.5])
def test_pallas_nms_matches_oracle(seed, thr):
    rng = np.random.default_rng(seed)
    B, N = 3, 64
    boxes = np.stack([random_cluttered_boxes(rng, N) for _ in range(B)])
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    idx, ok = pallas_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((B, N), bool),
        thr, max_out=N, interpret=True,
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    for b in range(B):
        expect = nms_oracle(boxes[b], thr, scores[b])
        assert idx[b][ok[b]].tolist() == expect


def test_pallas_nms_max_out_and_validity():
    rng = np.random.default_rng(5)
    B, N = 2, 48
    boxes = np.stack([random_cluttered_boxes(rng, N, extent=3000) for _ in range(B)])
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[1, 20:] = False
    idx, ok = pallas_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.25, max_out=8, interpret=True,
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    expect0 = nms_oracle(boxes[0], 0.25, scores[0])[:8]
    assert idx[0][ok[0]].tolist() == expect0
    expect1 = nms_oracle(boxes[1][:20], 0.25, scores[1][:20])[:8]
    assert idx[1][ok[1]].tolist() == expect1
    assert (idx[1][ok[1]] < 20).all()


def test_pallas_nms_agrees_with_xla_nms():
    rng = np.random.default_rng(7)
    B, N = 4, 96
    boxes = np.stack([random_cluttered_boxes(rng, N) for _ in range(B)])
    scores = rng.uniform(0, 1, (B, N)).astype(np.float32)
    valid = np.ones((B, N), bool)
    i1, o1 = pallas_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.25, max_out=32, interpret=True,
    )
    i2, o2 = jax.vmap(
        lambda b, s, v: nms(b, s, v, 0.25, 32)
    )(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
