"""Masked normalization: padded-image computation must equal the
reference's unpadded computation on the true region."""

import numpy as np
import jax.numpy as jnp
import pytest

from frcnn_tpu.ops.normalization import (
    contrastive_normalize,
    gaussian1d,
    normalize_image,
)


def np_conv1d_same(x, k, axis):
    """Zero-padded same conv, numpy oracle."""
    w = len(k)
    pad = [(0, 0), (0, 0)]
    pad[axis] = (w // 2, (w - 1) // 2)
    xp = np.pad(x, pad)
    out = np.zeros_like(x, dtype=np.float64)
    for i in range(w):
        if axis == 0:
            out += k[i] * xp[i : i + x.shape[0], :]
        else:
            out += k[i] * xp[:, i : i + x.shape[1]]
    return out


def np_contrastive(y):
    """Unpadded oracle: subtractive + divisive normalization with border
    coef correction (torch SpatialContrastiveNormalization with a 1D
    gaussian applied separably)."""
    k = gaussian1d(7).astype(np.float64)
    ones = np.ones_like(y, dtype=np.float64)
    smooth = lambda a: np_conv1d_same(np_conv1d_same(a, k, 0), k, 1)
    coef = smooth(ones)
    mean = smooth(y.astype(np.float64)) / coef
    sub = y - mean
    std = np.sqrt(np.maximum(smooth(sub * sub) / coef, 0))
    std = np.where(std <= 1e-4, 1e-4, std)
    return sub / std


def test_gaussian1d_shape_and_symmetry():
    k = gaussian1d(7)
    assert len(k) == 7
    np.testing.assert_allclose(k, k[::-1], rtol=1e-6)
    assert k[3] == pytest.approx(1.0)  # amplitude 1 at the mean
    # value at ends: exp(-(0.5^2)/(2*0.25^2)) = exp(-2)
    assert k[0] == pytest.approx(np.exp(-2), rel=1e-5)


def test_contrastive_matches_unpadded_oracle():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(37, 53)).astype(np.float32)
    mask = np.ones_like(y)
    got = np.asarray(contrastive_normalize(jnp.asarray(y), jnp.asarray(mask)))
    expect = np_contrastive(y)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_contrastive_padding_invariance():
    """Computing on a padded canvas with the validity mask must equal the
    unpadded computation — including at the true image border."""
    rng = np.random.default_rng(1)
    h, w = 30, 40
    y = rng.normal(size=(h, w)).astype(np.float32)
    pad = np.zeros((50, 64), np.float32)
    pad[:h, :w] = y
    mask = np.zeros_like(pad)
    mask[:h, :w] = 1.0
    got = np.asarray(contrastive_normalize(jnp.asarray(pad), jnp.asarray(mask)))
    expect_small = np.asarray(
        contrastive_normalize(jnp.asarray(y), jnp.asarray(np.ones_like(y)))
    )
    np.testing.assert_allclose(got[:h, :w], expect_small, rtol=1e-4, atol=1e-5)
    assert np.all(got[h:, :] == 0) and np.all(got[:, w:] == 0)


def test_normalize_image_centering_scaling():
    rng = np.random.default_rng(2)
    h, w = 40, 60
    img = rng.normal(2.0, 3.0, size=(64, 64, 3)).astype(np.float32)
    img[h:, :, :] = 0
    img[:, w:, :] = 0
    out = np.asarray(
        normalize_image(jnp.asarray(img), h, w, method="none")
    )
    region = out[:h, :w, :]
    for c in range(3):
        assert abs(region[:, :, c].mean()) < 1e-5
        assert region[:, :, c].std(ddof=1) == pytest.approx(1.0, abs=1e-3)
    assert np.all(out[h:, :, :] == 0)


def test_normalize_image_padding_invariance():
    rng = np.random.default_rng(3)
    h, w = 33, 47
    small = rng.normal(0.5, 0.2, size=(h, w, 3)).astype(np.float32)
    pad = np.zeros((64, 64, 3), np.float32)
    pad[:h, :w] = small
    got = np.asarray(normalize_image(jnp.asarray(pad), h, w))
    expect = np.asarray(normalize_image(jnp.asarray(small), h, w))
    np.testing.assert_allclose(got[:h, :w], expect, rtol=2e-4, atol=2e-5)


def test_zero_std_channel_untouched():
    """Constant channel: std guard (s > 1e-8) leaves it undivided."""
    img = np.zeros((16, 16, 3), np.float32)
    img[:, :, 1] = 5.0  # constant channel -> after centering all zeros
    out = np.asarray(normalize_image(jnp.asarray(img), 16, 16, method="none"))
    assert np.isfinite(out).all()


def test_normalize_s2d_matches_nhwc_pipeline():
    """normalize_s2d on the split s2d layout == pack_s2d(normalize_image):
    the serving path may normalize after host-side packing with no
    numerical divergence (beyond fp reassociation)."""
    from frcnn_tpu.ops.normalization import normalize_s2d
    from frcnn_tpu.ops.pallas_block0 import pack_s2d

    rng = np.random.default_rng(7)
    H, W = 32, 48
    for th, tw in [(32, 48), (26, 40)]:
        img = np.zeros((H, W, 3), np.float32)
        img[:th, :tw] = rng.normal(0.4, 0.3, (th, tw, 3)).astype(np.float32)
        wl, wc = pack_s2d(normalize_image(jnp.asarray(img), th, tw)[None])
        l4, ch = pack_s2d(jnp.asarray(img)[None])
        gl, gc = normalize_s2d(l4[0], ch[0], th, tw)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(wl)[0],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc)[0],
                                   rtol=2e-4, atol=2e-4)


def test_normalize_s2d_no_contrastive():
    from frcnn_tpu.ops.normalization import normalize_s2d
    from frcnn_tpu.ops.pallas_block0 import pack_s2d

    rng = np.random.default_rng(8)
    img = rng.normal(0.4, 0.3, (20, 24, 3)).astype(np.float32)
    wl, wc = pack_s2d(
        normalize_image(jnp.asarray(img), 20, 24, method="none")[None]
    )
    l4, ch = pack_s2d(jnp.asarray(img)[None])
    gl, gc = normalize_s2d(l4[0], ch[0], 20, 24, method="none")
    np.testing.assert_allclose(np.asarray(gl), np.asarray(wl)[0],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(wc)[0],
                               rtol=2e-4, atol=2e-4)
