"""Geometry core vs brute-force oracles (SURVEY.md §4 tier 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from frcnn_tpu.geometry import boxes as B
from tests import reference_oracles as O


def random_boxes(rng, n, lo=-50, hi=150, min_size=0.5):
    mins = rng.uniform(lo, hi, size=(n, 2))
    sizes = rng.uniform(min_size, 80, size=(n, 2))
    return np.concatenate([mins, mins + sizes], axis=1).astype(np.float32)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_iou_matches_oracle(rng):
    a = random_boxes(rng, 64)
    b = random_boxes(rng, 48)
    got = np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        for j in range(8):
            assert got[i, j] == pytest.approx(O.rect_iou(a[i], b[j]), abs=1e-5)


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert float(B.iou(a, a)[0]) == pytest.approx(1.0)
    b = jnp.array([[20.0, 20.0, 30.0, 30.0]])
    assert float(B.iou(a, b)[0]) == 0.0
    # empty boxes: IoU defined as 0 (reference divides 0/0 -> nan; we return 0)
    e = jnp.array([[5.0, 5.0, 5.0, 5.0]])
    assert float(B.iou(e, e)[0]) == 0.0


def test_iou_plus_one_convention():
    # two adjacent 1-pixel boxes in +1 convention: each area (1+1)*(1+1)=4...
    # check against explicit formula from nms.lua:35,85-86
    a = np.array([0.0, 0.0, 4.0, 4.0])
    b = np.array([2.0, 0.0, 6.0, 4.0])
    aw = 4 + 1
    inter = (min(4, 6) - max(0, 2) + 1) * (min(4, 4) - max(0, 0) + 1)
    expect = inter / (aw * aw * 2 - inter)
    got = float(B.iou_plus_one(jnp.asarray(a), jnp.asarray(b)))
    assert got == pytest.approx(expect)


def test_clip_matches_oracle(rng):
    r = random_boxes(rng, 32)
    c = np.array([0.0, 0.0, 100.0, 100.0], np.float32)
    got = np.asarray(B.clip(jnp.asarray(r), jnp.asarray(c)))
    for i in range(32):
        assert tuple(got[i]) == pytest.approx(O.rect_clip(r[i], c), abs=1e-6)


def test_clip_fully_outside_collapses():
    r = jnp.array([[200.0, 200.0, 300.0, 300.0]])
    c = jnp.array([0.0, 0.0, 100.0, 100.0])
    out = np.asarray(B.clip(r, c))[0]
    assert tuple(out) == (100.0, 100.0, 100.0, 100.0)
    assert bool(B.is_empty(jnp.asarray(out))[()])


def test_encode_decode_roundtrip(rng):
    anchors = random_boxes(rng, 100, min_size=2.0)
    targets = random_boxes(rng, 100, min_size=2.0)
    t = B.encode(jnp.asarray(anchors), jnp.asarray(targets))
    back = B.decode(jnp.asarray(anchors), t)
    np.testing.assert_allclose(np.asarray(back), targets, rtol=1e-3, atol=5e-3)


def test_encode_matches_oracle(rng):
    anchors = random_boxes(rng, 20, min_size=2.0)
    targets = random_boxes(rng, 20, min_size=2.0)
    got = np.asarray(B.encode(jnp.asarray(anchors), jnp.asarray(targets)))
    for i in range(20):
        assert tuple(got[i]) == pytest.approx(O.encode_box(anchors[i], targets[i]), abs=2e-3)


def test_decode_matches_oracle(rng):
    anchors = random_boxes(rng, 20, min_size=2.0)
    t = rng.normal(0, 0.3, size=(20, 4)).astype(np.float32)
    got = np.asarray(B.decode(jnp.asarray(anchors), jnp.asarray(t)))
    for i in range(20):
        assert tuple(got[i]) == pytest.approx(O.decode_box(anchors[i], t[i]), rel=1e-4, abs=1e-3)


def test_flips_are_involutions(rng):
    b = random_boxes(rng, 16, lo=0, hi=90)
    w, h = 120.0, 100.0
    hb = B.hflip(jnp.asarray(b), w)
    vb = B.vflip(jnp.asarray(b), h)
    np.testing.assert_allclose(np.asarray(B.hflip(hb, w)), b, atol=1e-5)
    np.testing.assert_allclose(np.asarray(B.vflip(vb, h)), b, atol=1e-5)
    # flipping preserves size and stays a valid box
    hb = np.asarray(hb)
    assert np.all(hb[:, 2] >= hb[:, 0]) and np.all(hb[:, 3] >= hb[:, 1])


def test_overlaps_and_inside():
    img = jnp.array([0.0, 0.0, 100.0, 50.0])
    inside_box = jnp.array([10.0, 10.0, 20.0, 20.0])
    touching = jnp.array([100.0, 0.0, 120.0, 20.0])  # shares edge: no overlap
    assert bool(B.overlaps(inside_box, img))
    assert not bool(B.overlaps(touching, img))
    assert bool(B.inside(img, inside_box))
    at_edge = jnp.array([90.0, 40.0, 100.0, 50.0])  # max edge == img max: inside
    assert bool(B.inside(img, at_edge))
    beyond = jnp.array([90.0, 40.0, 100.5, 50.0])
    assert not bool(B.inside(img, beyond))


def test_snap_to_int():
    b = jnp.array([[1.2, -0.7, 3.1, 4.0]])
    out = np.asarray(B.snap_to_int(b))[0]
    assert tuple(out) == (1.0, -1.0, 4.0, 4.0)


def test_union_intersect():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 20.0, 8.0])
    assert np.asarray(B.union(a, b)).tolist() == [0, 0, 20, 10]
    assert np.asarray(B.intersect(a, b)).tolist() == [5, 5, 10, 8]
    # disjoint -> empty zero box (Rect.empty())
    c = jnp.array([50.0, 50.0, 60.0, 60.0])
    assert np.asarray(B.intersect(a, c)).tolist() == [0, 0, 0, 0]
