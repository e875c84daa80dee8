"""Fixed-shape NMS vs an O(n^2) oracle with the reference's +1 area
convention and tie order (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from frcnn_tpu.ops.nms import nms, per_class_nms, resolve_nms_scores
from tests.reference_oracles import nms_oracle


def random_cluttered_boxes(rng, n, extent=200, size_lo=5, size_hi=60):
    mins = rng.uniform(0, extent, size=(n, 2))
    sizes = rng.uniform(size_lo, size_hi, size=(n, 2))
    return np.concatenate([mins, mins + sizes], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thr", [0.1, 0.25, 0.5])
def test_nms_matches_oracle(seed, thr):
    rng = np.random.default_rng(seed)
    n = 64
    boxes = random_cluttered_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.ones((n,), bool), thr, max_out=n)
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    expect = nms_oracle(boxes, thr, scores)
    assert got == expect


def test_nms_tie_order():
    """Equal scores: reference picks the larger original index first."""
    boxes = np.array(
        [[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]],
        np.float32,
    )
    scores = np.array([0.5, 0.5, 0.5], np.float32)
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.ones((3,), bool), 0.5, max_out=3)
    assert np.asarray(idx).tolist() == [2, 1, 0]
    expect = nms_oracle(boxes, 0.5, scores)
    assert np.asarray(idx).tolist() == expect


def test_nms_suppression_boundary():
    """IoU exactly equal to the threshold is NOT suppressed (nms.lua:96)."""
    # two identical boxes: IoU 1 -> suppressed; craft IoU == 1/3 pair
    a = [0, 0, 9, 9]        # +1 area 10x10
    b = [5, 0, 14, 9]       # overlap cols 5..9 = 5 wide -> inter 50, union 150
    boxes = np.array([a, b], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    iou = 50.0 / 150.0
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.ones((2,), bool), iou, max_out=2)
    assert np.asarray(ok).sum() == 2  # survives at equality
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.ones((2,), bool), iou - 1e-4, max_out=2)
    assert np.asarray(ok).sum() == 1  # suppressed just below


def test_nms_invalid_and_padding():
    rng = np.random.default_rng(9)
    boxes = random_cluttered_boxes(rng, 32)
    scores = rng.uniform(0, 1, 32).astype(np.float32)
    valid = np.zeros(32, bool)
    valid[:10] = True
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.asarray(valid), 0.3, max_out=16)
    got = np.asarray(idx)[np.asarray(ok)]
    assert all(g < 10 for g in got)
    expect = nms_oracle(boxes[:10], 0.3, scores[:10])
    assert got.tolist() == expect
    # padding slots are -1/false
    assert np.all(np.asarray(idx)[~np.asarray(ok)] == -1)


def test_nms_max_out_truncation():
    rng = np.random.default_rng(10)
    boxes = random_cluttered_boxes(rng, 64, extent=5000)  # mostly disjoint
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    idx, ok = nms(jnp.asarray(boxes), jnp.asarray(scores),
                  jnp.ones((64,), bool), 0.25, max_out=8)
    expect = nms_oracle(boxes, 0.25, scores)[:8]
    assert np.asarray(idx)[np.asarray(ok)].tolist() == expect


def test_per_class_nms_equals_independent_runs():
    rng = np.random.default_rng(11)
    n = 48
    boxes = random_cluttered_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, 4, n)
    idx, ok = per_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.ones((n,), bool), 4, 0.1, max_out=n,
    )
    got = set(np.asarray(idx)[np.asarray(ok)].tolist())
    expect = set()
    for c in range(4):
        sel = np.nonzero(classes == c)[0]
        for k in nms_oracle(boxes[sel], 0.1, scores[sel]):
            expect.add(int(sel[k]))
    assert got == expect


@pytest.mark.parametrize("variant", [None, "area", 1])
def test_nms_reference_score_variants(variant):
    """nms.lua:37-43 — scores may be omitted (max_y order), 'area', or an
    int box-column index; each must equal explicit scores resolved the
    same way (oracle order included)."""
    rng = np.random.default_rng(7)
    n = 48
    boxes = random_cluttered_boxes(rng, n)
    resolved = np.asarray(resolve_nms_scores(jnp.asarray(boxes), variant))
    idx, ok = nms(jnp.asarray(boxes), variant, jnp.ones((n,), bool), 0.3,
                  max_out=n)
    got = np.asarray(idx)[np.asarray(ok)].tolist()
    assert got == nms_oracle(boxes, 0.3, resolved)


def test_nms_rejects_unknown_score_string():
    with pytest.raises(ValueError):
        resolve_nms_scores(jnp.zeros((4, 4)), "volume")
