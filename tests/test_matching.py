"""Vectorized matching vs a literal transcription of the Lua loops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import duplo_config
from frcnn_tpu.geometry.anchors import AnchorGenerator
from frcnn_tpu.geometry import matching as M
from tests.reference_oracles import find_positive_oracle


@pytest.fixture(scope="module")
def gen():
    return AnchorGenerator(duplo_config())


def random_rois(rng, n, img_w=800, img_h=450, min_size=10, max_size=300):
    mins = np.stack(
        [rng.uniform(0, img_w - max_size, n), rng.uniform(0, img_h - max_size, n)],
        axis=1,
    )
    sizes = rng.uniform(min_size, max_size, size=(n, 2))
    out = np.concatenate([mins, mins + sizes], axis=1)
    out[:, 2] = np.minimum(out[:, 2], img_w)
    out[:, 3] = np.minimum(out[:, 3], img_h)
    return out.astype(np.float32)


def oracle_pairs(gen, cand, rois, pos_thr, neg_thr, best):
    return find_positive_oracle(gen.boxes, cand, rois, pos_thr, neg_thr, best)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("best", [True, False])
def test_match_positives_vs_oracle(gen, seed, best):
    rng = np.random.default_rng(seed)
    rois = random_rois(rng, 4)
    cand = np.asarray(gen.inside_image_mask(450, 800))
    pos = np.asarray(
        M.match_positives(
            jnp.asarray(gen.boxes),
            jnp.asarray(cand),
            jnp.asarray(rois),
            jnp.ones((4,), bool),
            pos_threshold=0.5,
            neg_threshold=0.25,
            include_best=best,
        )
    )
    got = {(a, g) for g in range(4) for a in np.nonzero(pos[g])[0]}
    expect = set(oracle_pairs(gen, cand, rois, 0.5, 0.25, best))
    assert got == expect


def test_best_match_small_boxes(gen):
    """Tiny ROI below every anchor's positive threshold exercises the
    best-set tie-band path."""
    # 26x20 box: too small for IoU > 0.5 with any anchor (smallest anchor
    # area 1024), but above the 0.25 negative threshold -> best-set path.
    rois = np.array([[100.0, 100.0, 126.0, 120.0]], np.float32)
    cand = np.asarray(gen.inside_image_mask(450, 800))
    pos = np.asarray(
        M.match_positives(
            jnp.asarray(gen.boxes), jnp.asarray(cand), jnp.asarray(rois),
            jnp.ones((1,), bool), 0.5, 0.25, True,
        )
    )
    got = {(a, 0) for a in np.nonzero(pos[0])[0]}
    expect = set(oracle_pairs(gen, cand, rois, 0.5, 0.25, True))
    assert got == expect
    assert len(expect) >= 1  # fallback must fire for a matchable box


def test_best_match_requires_above_negative_threshold(gen):
    """A speck no anchor reaches IoU>neg_thr with gets zero positives."""
    rois = np.array([[300.0, 200.0, 302.0, 202.0]], np.float32)
    cand = np.asarray(gen.inside_image_mask(450, 800))
    pos = np.asarray(
        M.match_positives(
            jnp.asarray(gen.boxes), jnp.asarray(cand), jnp.asarray(rois),
            jnp.ones((1,), bool), 0.5, 0.25, True,
        )
    )
    assert pos.sum() == len(oracle_pairs(gen, cand, rois, 0.5, 0.25, True))


def test_gt_mask_zeroes_rows(gen):
    rng = np.random.default_rng(3)
    rois = random_rois(rng, 3)
    cand = np.asarray(gen.inside_image_mask(450, 800))
    mask = jnp.array([True, False, True])
    pos = np.asarray(
        M.match_positives(
            jnp.asarray(gen.boxes), jnp.asarray(cand), jnp.asarray(rois),
            mask, 0.5, 0.25, True,
        )
    )
    assert pos[1].sum() == 0


def test_compact_mask():
    mask = jnp.array([False, True, False, True, True, False, True])
    idx, valid, count = M.compact_mask(mask, 3)
    np.testing.assert_array_equal(np.asarray(idx), [1, 3, 4])
    assert bool(valid.all()) and int(count) == 3
    idx, valid, count = M.compact_mask(mask, 8)
    np.testing.assert_array_equal(np.asarray(idx)[:4], [1, 3, 4, 6])
    np.testing.assert_array_equal(np.asarray(valid), [1, 1, 1, 1, 0, 0, 0, 0])
    assert int(count) == 4
    idx, valid, count = M.compact_mask(jnp.zeros((5,), bool), 3)
    assert not bool(valid.any()) and int(count) == 0


def test_select_positive_pairs_roi_major(gen):
    pos = np.zeros((2, gen.num_anchors), bool)
    pos[0, [5, 100]] = True
    pos[1, [3]] = True
    sel = M.select_positive_pairs(jnp.asarray(pos), 4)
    np.testing.assert_array_equal(np.asarray(sel.anchor_idx)[:3], [5, 100, 3])
    np.testing.assert_array_equal(np.asarray(sel.gt_idx)[:3], [0, 0, 1])
    np.testing.assert_array_equal(np.asarray(sel.valid), [1, 1, 1, 0])
    assert int(sel.count) == 3


def test_sample_negatives_no_overlap(gen):
    rng_np = np.random.default_rng(4)
    rois = random_rois(rng_np, 3)
    valid = np.asarray(gen.inside_image_mask(450, 800))
    range_id = gen.tap * 3 + gen.aspect
    idx, ok = M.sample_negatives(
        jax.random.PRNGKey(0),
        jnp.asarray(gen.boxes),
        jnp.asarray(valid),
        jnp.asarray(range_id),
        12,
        jnp.asarray(rois),
        jnp.ones((3,), bool),
        neg_threshold=0.25,
        count=16,
        requested=jnp.asarray(16),
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.sum() == 16
    from tests.reference_oracles import rect_iou
    for a in idx[ok]:
        assert valid[a]
        for r in rois:
            assert rect_iou(r, gen.boxes[a]) <= 0.25
    # distinct (we sample without replacement)
    assert len(set(idx[ok].tolist())) == 16


def test_sample_negatives_range_weighting(gen):
    """Each (scale, aspect) range should be roughly equally represented —
    the reference picks ranges uniformly (Anchors.lua:205)."""
    valid = np.asarray(gen.inside_image_mask(450, 800))
    range_id = gen.tap * 3 + gen.aspect
    counts = np.zeros(12)
    for s in range(40):
        idx, ok = M.sample_negatives(
            jax.random.PRNGKey(s),
            jnp.asarray(gen.boxes), jnp.asarray(valid), jnp.asarray(range_id), 12,
            jnp.zeros((1, 4)), jnp.zeros((1,), bool),
            neg_threshold=0.25, count=12, requested=jnp.asarray(12),
        )
        for a in np.asarray(idx)[np.asarray(ok)]:
            counts[range_id[a]] += 1
    # uniform-over-ranges would give 40 each; raw-uniform-over-anchors would
    # give tap0 (big grid) ~6x tap3. Check no range dominates badly.
    assert counts.min() > 10, counts
    assert counts.max() / max(counts.min(), 1) < 4, counts


def test_nearby_negatives(gen):
    """Candidates share both center bins with a positive, IoU < thr."""
    # choose a mid-image positive anchor on tap 0
    sel = np.nonzero((gen.tap == 0) & (gen.fy == 20) & (gen.fx == 40) & (gen.aspect == 0))[0]
    p = int(sel[0])
    pos_idx = jnp.full((4,), p, jnp.int32)
    pos_valid = jnp.array([True, False, False, False])
    fm_mask = jnp.ones((gen.num_anchors,), bool)
    idx, ok = M.nearby_negatives(
        jax.random.PRNGKey(1),
        jnp.asarray(gen.boxes), jnp.asarray(gen.bin_x), jnp.asarray(gen.bin_y),
        fm_mask, pos_idx, pos_valid,
        neg_threshold=0.25, count=32, num_positives=jnp.asarray(1),
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    # cap = num_positives = 1
    assert ok.sum() == 1
    a = idx[ok][0]
    assert gen.bin_x[a] == gen.bin_x[p] and gen.bin_y[a] == gen.bin_y[p]
    from tests.reference_oracles import rect_iou
    assert rect_iou(gen.boxes[p], gen.boxes[a]) < 0.25
