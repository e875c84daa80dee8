"""Receptive-field math vs hand-derived strides/offsets (SURVEY.md §4/§7:
each conv block halves resolution -> effective strides 8,16,16,16 at the 4
pyramid taps for vgg_small)."""

import numpy as np
import jax.numpy as jnp
import pytest

from frcnn_tpu.config import duplo_config, vgg_small_model
from frcnn_tpu.geometry.localizer import (
    Localizer,
    layer_infos_for_feature_map,
    layer_infos_for_tap,
)

MODEL = vgg_small_model()

# Hand-derived by composing featureToInputRect through the vgg_small stack
# (block convs are 3x3/1/1 -> min-1/max+1; pools 2x2/2 -> min*2/max*2;
# anchor conv kxk valid -> max+(k-1); 1x1 -> identity):
#   tap: (scale, offset_min, offset_max, center_offset) with
#   center(c) = scale*c + center_offset for 0-based cell c.
EXPECTED_TAPS = [
    (8, -13, 29, 12),
    (16, -29, 61, 24),
    (16, -29, 93, 40),
    (16, -29, 125, 56),
]
EXPECTED_FM = (16, -29, 29)


@pytest.mark.parametrize("tap", range(4))
def test_tap_affine(tap):
    loc = Localizer(layer_infos_for_tap(MODEL, tap))
    s, bmin, bmax, c0 = EXPECTED_TAPS[tap]
    assert loc.scale_x == s and loc.scale_y == s
    assert loc.offset_min_x == bmin and loc.offset_min_y == bmin
    assert loc.offset_max_x == bmax and loc.offset_max_y == bmax
    # center of one-cell rect [c, c+1)
    for c in [0, 1, 7, 100]:
        r = loc.feature_to_input_rect(c, c, c + 1, c + 1)
        assert (r[0] + r[2]) / 2 == s * c + c0
        assert (r[1] + r[3]) / 2 == s * c + c0


def test_fm_affine():
    loc = Localizer(layer_infos_for_feature_map(MODEL))
    s, bmin, bmax = EXPECTED_FM
    assert loc.scale_x == s and loc.offset_min_x == bmin and loc.offset_max_x == bmax


def test_feature_map_sizes_800x450():
    loc = Localizer(layer_infos_for_feature_map(MODEL))
    assert loc.feature_map_size(800, 450) == (50, 29)
    tap_expect = [(98, 55), (48, 27), (46, 25), (44, 23)]
    for i, exp in enumerate(tap_expect):
        loc = Localizer(layer_infos_for_tap(MODEL, i))
        assert loc.feature_map_size(800, 450) == exp


def test_feature_map_size_jax_matches_static():
    for i in range(4):
        loc = Localizer(layer_infos_for_tap(MODEL, i))
        for (w, h) in [(800, 450), (127, 129), (1000, 563), (64, 64)]:
            w_s, h_s = loc.feature_map_size(w, h)
            w_j, h_j = loc.feature_map_size_jax(jnp.asarray(w), jnp.asarray(h))
            assert (int(w_j), int(h_j)) == (w_s, h_s)


def test_input_to_feature_rect_hand_case():
    # Hand-traced through the 4-block stack (see docstring arithmetic):
    # x-extent [100, 200) -> float cascade ends at (4.4375, 15) -> (4, 15).
    loc = Localizer(layer_infos_for_feature_map(MODEL))
    r = loc.input_to_feature_rect(100, 100, 200, 180)
    assert (r[0], r[2]) == (4, 15)
    # y-extent [100, 180): same min path (4.4375);
    # max: 181->... verify against the jax version below instead of by hand.


def test_input_to_feature_rect_jax_matches_scalar():
    loc = Localizer(layer_infos_for_feature_map(MODEL))
    rng = np.random.default_rng(0)
    mins = rng.uniform(-20, 700, size=(50, 2))
    sizes = rng.uniform(1, 300, size=(50, 2))
    rects = np.concatenate([mins, mins + sizes], axis=1).astype(np.float32)
    got = np.asarray(loc.input_to_feature_rect_jax(jnp.asarray(rects)))
    for i in range(50):
        exp = loc.input_to_feature_rect(*rects[i])
        assert tuple(got[i]) == pytest.approx(exp), f"rect {rects[i]}"


def test_roundtrip_growth():
    # featureToInput of inputToFeature should cover the original rect
    # (receptive-field expansion makes it strictly larger).
    loc = Localizer(layer_infos_for_feature_map(MODEL))
    fr = loc.input_to_feature_rect(160, 160, 320, 320)
    back = loc.feature_to_input_rect(*fr)
    assert back[0] <= 160 and back[1] <= 160
    assert back[2] >= 320 and back[3] >= 320
