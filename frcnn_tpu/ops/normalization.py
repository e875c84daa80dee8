"""Input normalization ops.

Replaces the reference's CPU-side per-image normalization
(``BatchIterator.lua:85-89, 142-161``) with masked, jit-compiled device ops.
The mask support exists because TPU batches are padded to a fixed bucket:
statistics and convolution border corrections must see only the true image
region, which reproduces exactly what the reference computes on the unpadded
image.

Pieces:
* per-channel mean centering / std scaling (``BatchIterator.lua:142-153``;
  std guard ``s > 1e-8``),
* spatial contrastive normalization of the luminance channel
  (``nn.SpatialContrastiveNormalization(1, image.gaussian1D(width))``,
  ``BatchIterator.lua:85-89, 161``): subtractive normalization followed by
  divisive normalization with a separable 1D gaussian, with the Torch border
  coefficient correction — which for a padded image is just the same
  convolution applied to the validity mask.

Torch's ``image.gaussian1D(width)`` uses amplitude 1, mean 0.5, sigma 0.25
over normalized coordinates (not renormalized): ``g[i] =
exp(-((i/(w-1) - 0.5)^2) / (2*0.25^2))``. The normalization constant cancels
in the coef division.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DIV_THRESHOLD = 1e-4  # nn.SpatialDivisiveNormalization default threshold


def gaussian1d(width: int) -> np.ndarray:
    """``image.gaussian1D(width)`` (torch/image defaults)."""
    i = np.arange(width, dtype=np.float64)
    x = i / (width - 1) - 0.5
    return np.exp(-(x ** 2) / (2 * 0.25 ** 2)).astype(np.float32)


def _smooth(x, k):
    """Separable zero-padded 'same' smoothing of [..., H, W].

    Implemented as an unrolled shift-multiply-accumulate instead of a
    1-channel conv: a [1-in, 1-out]-channel convolution occupies one lane of
    the 128x128 MXU and measured ~20ms/batch on the detect path; the shift
    form is a handful of fused VPU adds (memory-bound, ~microseconds)."""
    w = k.shape[0]
    lo, hi = w // 2, (w - 1) // 2
    H, W = x.shape[-2], x.shape[-1]
    nb = [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, nb + [(lo, hi), (0, 0)])
    x = sum(k[i] * jax.lax.slice_in_dim(xp, i, i + H, axis=-2) for i in range(w))
    xp = jnp.pad(x, nb + [(0, 0), (lo, hi)])
    x = sum(k[i] * jax.lax.slice_in_dim(xp, i, i + W, axis=-1) for i in range(w))
    return x


def contrastive_normalize(y, valid_mask, width: int = 7):
    """Spatial contrastive normalization of one channel.

    Args:
      y: [H, W] channel (luminance).
      valid_mask: [H, W] float 0/1 — true-image region.
    Returns [H, W]; padded region is zeroed.
    """
    k = jnp.asarray(gaussian1d(width))
    ym = y * valid_mask
    coef = _smooth(valid_mask, k)
    safe_coef = jnp.maximum(coef, 1e-12)
    # subtractive: x - localmean (border-corrected)
    mean = _smooth(ym, k) / safe_coef
    sub = (y - mean) * valid_mask
    # divisive: / max(localstd, threshold-floor)
    var = _smooth(sub * sub, k) / safe_coef
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    # nn.Threshold(th, val): values <= th replaced by val
    std = jnp.where(std <= DIV_THRESHOLD, DIV_THRESHOLD, std)
    return (sub / std) * valid_mask


def _smooth_phased(z, k):
    """Separable zero-padded 'same' smoothing in ORIGINAL pixel space of a
    2x2 space-to-depth phase decomposition, phase-MAJOR layout.

    ``z``: [4, Hc, Wc] where page p = 2*qy+qx holds pixels (2i+qy, 2j+qx)
    of the underlying [2*Hc, 2*Wc] grid (any fixed global offset — the
    filter is shift-invariant and out-of-array rows are zero, matching
    :func:`_smooth`'s zero padding). Returns the same layout.

    A tap at original-row offset t-3 maps, for output phase qy=a, to source
    phase (a+t-3) mod 2 at plane-row shift floor((a+t-3)/2) — so the 7-tap
    filter becomes 2x7 shifted plane adds per axis instead of a gather.
    Phases live on the OUTER dim so every term is a page-select + aligned
    2D shift (a [Hc, 4, Wc] layout put phases on sublanes: 2x tile padding
    waste + a relayout per term — measured 3.4 ms vs 1.8 for the NHWC
    smoother at batch 16; this form avoids both).
    """
    w = k.shape[0]
    assert w == 7, "phased smoothing is specialized to the reference width"
    _, Hc, Wc = z.shape
    zp = jnp.pad(z, [(0, 0), (2, 2), (0, 0)])
    rows = []
    for a in (0, 1):
        acc = 0.0
        for t in range(w):
            s = a + t - 3
            qp, shift = s % 2, s // 2
            acc = acc + k[t] * jax.lax.slice(
                zp, (2 * qp, 2 + shift, 0), (2 * qp + 2, 2 + shift + Hc, Wc)
            )
        rows.append(acc)  # pages (a, qx=0), (a, qx=1)
    z = jnp.concatenate(rows, axis=0)  # back to p = 2qy+qx
    zp = jnp.pad(z, [(0, 0), (0, 0), (2, 2)])
    cols = []
    for qy in (0, 1):
        for b in (0, 1):
            acc = 0.0
            for t in range(w):
                s = b + t - 3
                qp, shift = s % 2, s // 2
                p_src = 2 * qy + qp
                acc = acc + k[t] * jax.lax.slice(
                    zp, (p_src, 0, 2 + shift),
                    (p_src + 1, Hc, 2 + shift + Wc),
                )
            cols.append(acc)
    return jnp.concatenate(cols, axis=0)


def phase_masks(Hc: int, Wc: int, true_h, true_w, dtype=jnp.float32):
    """[4, Hc, Wc] validity masks of the s2d phase planes, where plane
    (qy,qx) covers padded-image pixels (2i+qy, 2j+qx) of pad(img, 1) —
    i.e. image pixel (2i+qy-1, 2j+qx-1)."""
    ia = jnp.arange(Hc)
    ja = jnp.arange(Wc)
    masks = []
    for qy in (0, 1):
        rv = (2 * ia + qy - 1 >= 0) & (2 * ia + qy - 1 < true_h)
        for qx in (0, 1):
            cv = (2 * ja + qx - 1 >= 0) & (2 * ja + qx - 1 < true_w)
            masks.append(rv[:, None] & cv[None, :])
    return jnp.stack(masks).astype(dtype)


def chroma_masks(Hc: int, Wc: int, true_h, true_w, dtype=jnp.float32):
    """Rank-1 validity factors of the chroma layout [Hc, 8, Wc] (channel
    ch = 2*(2qy+qx) + (c-1)): returns (rv [Hc, 8], cv [8, Wc]) with
    mask[i, ch, j] = rv[i, ch] * cv[ch, j]. Built as outer-product factors
    so XLA fuses them into consumers — materializing a full [Hc, 8, Wc]
    mask via repeat+transpose costs a relayout."""
    ia = jnp.arange(Hc)[:, None]                 # [Hc, 1]
    ja = jnp.arange(Wc)[None, :]                 # [1, Wc]
    ch = jnp.arange(8)
    qy = (ch // 2) // 2                          # phase row offset per channel
    qx = (ch // 2) % 2
    r = 2 * ia + qy[None, :] - 1
    rv = ((r >= 0) & (r < true_h)).astype(dtype)           # [Hc, 8]
    c = 2 * ja + qx[:, None] - 1
    cv = ((c >= 0) & (c < true_w)).astype(dtype)           # [8, Wc]
    return rv, cv


def normalize_s2d(lum4, chroma, true_h, true_w, method: str = "contrastive",
                  width: int = 7, centering: bool = True,
                  scaling: bool = True):
    """:func:`normalize_image` on the split space-to-depth layout of
    ops/pallas_block0.py (phase-major luminance + interleaved chroma).

    Args:
      lum4: [4, Hc, Wc] — lum4[2qy+qx, i, j] = pad(img,1)[2i+qy, 2j+qx, 0]
      chroma: [Hc, 8, Wc] — chroma[i, 2(2qy+qx)+c-1, j] = pad(...)[..., c]
    Returns (lum4', chroma') — numerically pack_s2d(normalize_image(img)).
    The layout never round-trips through NHWC on device, and the
    contrastive smoothing runs directly on the phase-major planes: the
    previous interleaved-luminance form spent 1.3 ms/batch16 in
    extract/reinsert relayouts (measured; see CLAUDE.md).
    """
    _, Hc, Wc = lum4.shape
    m4 = phase_masks(Hc, Wc, true_h, true_w, lum4.dtype)   # [4, Hc, Wc]
    rv, cv = chroma_masks(Hc, Wc, true_h, true_w, chroma.dtype)
    n = jnp.maximum(jnp.asarray(true_h * true_w).astype(lum4.dtype), 1.0)

    y = lum4 * m4
    x = chroma * rv[:, :, None] * cv[None, :, :]
    if centering:
        y = (y - jnp.sum(y) / n) * m4
        s8 = jnp.sum(x, axis=(0, 2))                       # [8]
        mean2 = jnp.stack([jnp.sum(s8[0::2]), jnp.sum(s8[1::2])]) / n
        x = (x - jnp.tile(mean2, 4)[None, :, None]) * rv[:, :, None] \
            * cv[None, :, :]
    if scaling:
        # torch std: unbiased, subtracts the channel mean itself (relevant
        # when centering is off); guard s > 1e-8
        def scale_of(ssum, ssq):
            m = ssum / n
            var = (ssq - n * m * m) / jnp.maximum(n - 1.0, 1.0)
            std = jnp.sqrt(jnp.maximum(var, 0.0))
            return jnp.where(std > 1e-8, 1.0 / jnp.maximum(std, 1e-20), 1.0)

        y = y * scale_of(jnp.sum(y), jnp.sum(y * y))
        s8 = jnp.sum(x, axis=(0, 2))
        q8 = jnp.sum(x * x, axis=(0, 2))
        sc2 = scale_of(
            jnp.stack([jnp.sum(s8[0::2]), jnp.sum(s8[1::2])]),
            jnp.stack([jnp.sum(q8[0::2]), jnp.sum(q8[1::2])]),
        )
        x = x * jnp.tile(sc2, 4)[None, :, None]
    if method == "contrastive":
        k = jnp.asarray(gaussian1d(width), y.dtype)
        coef = _smooth_phased(m4, k)
        safe_coef = jnp.maximum(coef, 1e-12)
        mean_l = _smooth_phased(y, k) / safe_coef
        sub = (y - mean_l) * m4
        var_l = _smooth_phased(sub * sub, k) / safe_coef
        std_l = jnp.sqrt(jnp.maximum(var_l, 0.0))
        std_l = jnp.where(std_l <= DIV_THRESHOLD, DIV_THRESHOLD, std_l)
        y = (sub / std_l) * m4
    return y, x


def normalize_image(img, true_h, true_w, method: str = "contrastive",
                    width: int = 7, centering: bool = True, scaling: bool = True):
    """Full normalization pipeline of ``BatchIterator:processImage``
    (``BatchIterator.lua:142-161``) on a padded image.

    Args:
      img: [H, W, 3] float, channel order = configured color space
           (channel 0 is the luminance/first channel the contrastive norm
           applies to).
      true_h, true_w: true content extent (traced scalars ok).
    """
    H, W, _ = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    mask = ((yy < true_h) & (xx < true_w)).astype(img.dtype)
    n = jnp.maximum(jnp.sum(mask), 1.0)

    x = img * mask[:, :, None]
    if centering:
        mean = jnp.sum(x, axis=(0, 1)) / n
        x = (x - mean[None, None, :]) * mask[:, :, None]
    if scaling:
        # torch std: unbiased, subtracts the channel mean itself (relevant
        # when centering is off); guard s > 1e-8
        m = jnp.sum(x, axis=(0, 1)) / n
        var = (jnp.sum(x * x, axis=(0, 1)) - n * m * m) / jnp.maximum(n - 1.0, 1.0)
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        x = jnp.where(std[None, None, :] > 1e-8, x / jnp.maximum(std, 1e-20), x)
    if method == "contrastive":
        y0 = contrastive_normalize(x[:, :, 0], mask, width)
        x = jnp.concatenate([y0[:, :, None], x[:, :, 1:]], axis=2)
    return x * mask[:, :, None]
