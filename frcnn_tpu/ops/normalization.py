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
