"""Property-based invariants (hypothesis) for the geometry/NMS core."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from frcnn_tpu.geometry import boxes as B
from frcnn_tpu.ops.nms import nms

settings.register_profile("ci", max_examples=25, deadline=None)
settings.load_profile("ci")


def boxes_strategy(n):
    def build(vals):
        a = np.asarray(vals, np.float32).reshape(n, 4)
        mins = a[:, :2]
        sizes = np.abs(a[:, 2:]) + 1.0
        return np.concatenate([mins, mins + sizes], axis=1)

    return st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=n * 4, max_size=n * 4,
    ).map(build)


@given(boxes_strategy(8))
def test_iou_symmetric_and_bounded(bs):
    m = np.asarray(B.iou_matrix(jnp.asarray(bs), jnp.asarray(bs)))
    np.testing.assert_allclose(m, m.T, atol=1e-5)
    assert (m >= -1e-6).all() and (m <= 1 + 1e-6).all()
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)


@given(boxes_strategy(6))
def test_clip_idempotent_and_contained(bs):
    clip_box = jnp.asarray([0.0, 0.0, 50.0, 40.0])
    c1 = B.clip(jnp.asarray(bs), clip_box)
    c2 = B.clip(c1, clip_box)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    c1 = np.asarray(c1)
    assert (c1[:, 0] >= 0).all() and (c1[:, 2] <= 50).all()
    assert (c1[:, 1] >= 0).all() and (c1[:, 3] <= 40).all()
    assert (c1[:, 2] >= c1[:, 0]).all() and (c1[:, 3] >= c1[:, 1]).all()


@given(boxes_strategy(6), boxes_strategy(6))
def test_encode_decode_inverse(anchors, targets):
    t = B.encode(jnp.asarray(anchors), jnp.asarray(targets))
    back = np.asarray(B.decode(jnp.asarray(anchors), t))
    np.testing.assert_allclose(back, targets, rtol=2e-3, atol=2e-2)


@given(boxes_strategy(16), st.integers(0, 2 ** 31 - 1))
def test_nms_output_pairwise_under_threshold(bs, seed):
    """Kept boxes must be pairwise non-suppressing; every dropped box must
    be suppressed by some kept box with a higher-or-equal score position."""
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0, 1, 16).astype(np.float32)
    thr = 0.3
    idx, ok = nms(jnp.asarray(bs), jnp.asarray(scores),
                  jnp.ones((16,), bool), thr, max_out=16)
    kept = np.asarray(idx)[np.asarray(ok)]
    iou = np.asarray(B.iou_plus_one(
        jnp.asarray(bs)[:, None, :], jnp.asarray(bs)[None, :, :]
    ))
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert iou[kept[i], kept[j]] <= thr + 1e-6
    dropped = set(range(16)) - set(kept.tolist())
    for d in dropped:
        assert any(iou[k, d] > thr for k in kept if scores[k] >= scores[d]), d
