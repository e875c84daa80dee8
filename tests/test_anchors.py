"""Anchor field golden-value tests (SURVEY.md §4 tier 2)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import duplo_config
from frcnn_tpu.geometry.anchors import AnchorGenerator, aspect_dims


@pytest.fixture(scope="module")
def gen():
    # golden values below are derived for the 800x450 workload bucket; the
    # duplo DEFAULT bucket is the full 450x1000 wide-image envelope
    import dataclasses

    cfg = duplo_config()
    cfg = cfg.replace(
        shapes=dataclasses.replace(cfg.shapes, image_hw=(450, 800))
    )
    return AnchorGenerator(cfg)


def test_default_bucket_is_resize_envelope(gen):
    """duplo's default compile bucket must cover the config's landscape
    resize envelope (smaller side 450, larger capped at 1000 —
    utilities.lua:188-203), so wide images are not cropped; and anchors for
    a true 800x450 image inside the 1000-wide bucket match the dedicated
    800-bucket field."""
    cfg = duplo_config()
    assert cfg.shapes.image_hw == (450, 1000)
    gen_wide = AnchorGenerator(cfg)
    assert gen_wide.num_anchors > gen.num_anchors
    # same tap heights, wider taps
    for (h8, w8), (hw_, ww_) in zip(gen.tap_dims, gen_wide.tap_dims):
        assert hw_ == h8 and ww_ > w8
    # masking a true 800x450 image inside the wide bucket keeps exactly the
    # anchors of the 800 bucket's taps
    m = np.asarray(gen_wide.fm_valid_mask(450, 800))
    kept = int(m.sum())
    assert kept == gen.num_anchors


def test_aspect_dims_equal_area():
    for s in [32, 64, 128, 256]:
        dims = aspect_dims(s)
        assert dims[0] == (s, s)
        for (w, h) in dims:
            assert w * h == pytest.approx(s * s, rel=1e-6)
        assert dims[1][0] == 2 * dims[1][1]          # 2:1
        assert dims[2][1] == 2 * dims[2][0]          # 1:2


def test_anchor_count_800x450(gen):
    # tap output dims for 800x450 (test_localizer): 98x55,48x27,46x25,44x23
    expect = 3 * (98 * 55 + 48 * 27 + 46 * 25 + 44 * 23)
    assert gen.num_anchors == expect
    assert gen.tap_dims == [(55, 98), (27, 48), (25, 46), (23, 44)]


def test_lookup_tables_match_reference_construction(gen):
    """Rebuild the tables the slow way — evaluating featureToInputRect per
    cell exactly like ``Anchors.lua:38-57`` — and compare to the affine
    closed form."""
    w_tbl, h_tbl = gen.lookup_tables(extent=60)
    for i, loc in enumerate(gen.tap_localizers):
        for j, (bw, bh) in enumerate(aspect_dims(gen.scales[i])):
            for y in range(1, 61):  # 1-based like the Lua loop
                r = loc.feature_to_input_rect(0, y - 1, 0, y)
                cy = (r[1] + r[3]) / 2
                assert h_tbl[i, j, y - 1, 0] == pytest.approx(cy - bh / 2)
                assert h_tbl[i, j, y - 1, 1] == pytest.approx(cy + bh / 2)
            for x in range(1, 61):
                r = loc.feature_to_input_rect(x - 1, 0, x, 0)
                cx = (r[0] + r[2]) / 2
                assert w_tbl[i, j, x - 1, 0] == pytest.approx(cx - bw / 2)
                assert w_tbl[i, j, x - 1, 1] == pytest.approx(cx + bw / 2)


def test_dense_boxes_agree_with_get(gen):
    rng = np.random.default_rng(1)
    for _ in range(50):
        k = rng.integers(0, gen.num_anchors)
        box = gen.boxes[k]
        expect = gen.get(int(gen.tap[k]), int(gen.aspect[k]), int(gen.fy[k]), int(gen.fx[k]))
        np.testing.assert_allclose(box, expect, rtol=1e-5)


def test_canonical_ordering(gen):
    """Flat order must be (tap, aspect, y, x) — findRangesXY enumeration."""
    # tap ids are non-decreasing
    assert np.all(np.diff(gen.tap) >= 0)
    # within a tap, aspect ids non-decreasing
    for s, e in gen.flat_slices():
        t = gen.aspect[s:e]
        assert np.all(np.diff(t) >= 0)
        # within (tap, aspect): y-major, x-minor
        h, w = gen.tap_dims[gen.tap[s]]
        block = e - s
        per_aspect = block // 3
        fy = gen.fy[s : s + per_aspect]
        fx = gen.fx[s : s + per_aspect]
        lin = fy.astype(np.int64) * w + fx
        assert np.all(np.diff(lin) == 1)


def test_flatten_unflatten_roundtrip(gen):
    rng = np.random.default_rng(2)
    tap_outputs = [
        jnp.asarray(rng.normal(size=(h, w, 18)).astype(np.float32))
        for (h, w) in gen.tap_dims
    ]
    flat = gen.flatten_tap_outputs(tap_outputs)
    assert flat.shape == (gen.num_anchors, 6)
    back = gen.unflatten_to_tap_deltas(flat)
    for a, b in zip(tap_outputs, back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_flatten_channel_semantics(gen):
    """Channel k of anchor map cell (y,x) for aspect j lands at flat row of
    that (tap, j, y, x) anchor, column k-6j (objective.lua:104-114 layout)."""
    (h, w) = gen.tap_dims[0]
    out0 = np.zeros((h, w, 18), np.float32)
    y, x, j = 3, 5, 1
    out0[y, x, 6 * j : 6 * j + 6] = [1, 2, 3, 4, 5, 6]
    outs = [jnp.asarray(out0)] + [
        jnp.zeros((hh, ww, 18)) for (hh, ww) in gen.tap_dims[1:]
    ]
    flat = np.asarray(gen.flatten_tap_outputs(outs))
    rows = np.where(
        (gen.tap == 0) & (gen.aspect == j) & (gen.fy == y) & (gen.fx == x)
    )[0]
    assert len(rows) == 1
    np.testing.assert_allclose(flat[rows[0]], [1, 2, 3, 4, 5, 6])
    assert np.count_nonzero(flat) == 6


def test_fm_valid_mask(gen):
    """Smaller true image => anchors beyond its feature extent masked
    (cleanAnchors, objective.lua:32-43)."""
    full = np.asarray(gen.fm_valid_mask(450, 800))
    assert full.all()
    m = np.asarray(gen.fm_valid_mask(225, 400))
    # tap0 for 400x225: blocks -> 50x29 -> conv3 valid -> 48x27
    sel = gen.tap == 0
    expect = (gen.fy < 27) & (gen.fx < 48)
    np.testing.assert_array_equal(m[sel], expect[sel])
    assert m.sum() < full.sum()


def test_inside_image_mask(gen):
    m = np.asarray(gen.inside_image_mask(450, 800))
    b = gen.boxes
    expect = (b[:, 0] >= 0) & (b[:, 1] >= 0) & (b[:, 2] <= 800) & (b[:, 3] <= 450)
    np.testing.assert_array_equal(m, expect)
    assert 0 < m.sum() < gen.num_anchors


def test_center_bins(gen):
    centers = (gen.boxes[:, :2] + gen.boxes[:, 2:]) * 0.5
    np.testing.assert_array_equal(gen.bin_x, np.floor(centers[:, 0] / 16).astype(np.int32))
    np.testing.assert_array_equal(gen.bin_y, np.floor(centers[:, 1] / 16).astype(np.int32))


def test_golden_anchor_values(gen):
    """Literal golden numbers, hand-derived from the tap affines
    (test_localizer.EXPECTED_TAPS): tap0 center(c) = 8c + 12, tap1..3
    center(c) = 16c + {24, 40, 56}; scale-32 1:1 box = center +- 16."""
    # tap0, aspect 1:1, cell (0, 0): center (12, 12), 32x32
    np.testing.assert_allclose(gen.get(0, 0, 0, 0), [-4, -4, 28, 28])
    # tap0, cell (2, 5): center (8*5+12, 8*2+12) = (52, 28)
    np.testing.assert_allclose(gen.get(0, 0, 2, 5), [36, 12, 68, 44])
    # tap0 aspect 2:1 (w=2a, h=a, a=32/sqrt(2)): cell (0,0)
    a = 32 / np.sqrt(2)
    np.testing.assert_allclose(
        gen.get(0, 1, 0, 0), [12 - a, 12 - a / 2, 12 + a, 12 + a / 2], rtol=1e-6
    )
    # tap1 (scale 64), 1:1, cell (3, 7): center (16*7+24, 16*3+24) = (136, 72)
    np.testing.assert_allclose(gen.get(1, 0, 3, 7), [104, 40, 168, 104])
    # tap3 (scale 256), 1:2 aspect (w=a, h=2a, a=256/sqrt(2)), cell (1, 1):
    # center (16+56, 16+56) = (72, 72)
    a3 = 256 / np.sqrt(2)
    np.testing.assert_allclose(
        gen.get(3, 2, 1, 1), [72 - a3 / 2, 72 - a3, 72 + a3 / 2, 72 + a3],
        rtol=1e-6,
    )


def test_detect_order_permutation(gen):
    """detect_order maps the maps' native (y, x, aspect) flat order to
    canonical indices: flattening an anchor map WITHOUT the per-map
    transpose and indexing tables through the permutation must agree with
    the canonical flatten."""
    perm = gen.detect_order()
    A = gen.num_anchors
    assert sorted(perm.tolist()) == list(range(A))  # a true permutation
    # synthesize per-tap maps whose value encodes the canonical index
    rng = np.random.default_rng(0)
    maps = []
    for i, (h, w) in enumerate(gen.tap_dims):
        s, e = gen.flat_slices()[i]
        n = h * w
        canon = np.arange(s, e).reshape(3, h, w)      # canonical (j, y, x)
        m = np.transpose(canon, (1, 2, 0)).reshape(h, w, 3)
        maps.append(np.repeat(m[..., None], 6, axis=-1).astype(np.float32))
    native_flat = np.concatenate(
        [m.reshape(-1, 6) for m in maps], axis=0
    )[:, 0].astype(np.int64)
    np.testing.assert_array_equal(native_flat, perm)
    # permuted tables line up: boxes[perm][i] is the anchor of native i
    np.testing.assert_allclose(gen.boxes[perm][perm.argsort()], gen.boxes)
