"""Color-space conversions matching torch/image semantics
(``utilities.lua:205-218``: rgb2yuv / rgb2lab / rgb2hsv on float RGB in
[0, 1]). Implemented as numpy functions (host pipeline) with jnp-compatible
math where useful; the YUV transform is a plain 3x3 matmul and is also safe
on device.
"""

from __future__ import annotations

import numpy as np

# torch image.rgb2yuv coefficients
_RGB2YUV = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.14713, -0.28886, 0.436],
        [0.615, -0.51499, -0.10001],
    ],
    dtype=np.float32,
)

_YUV2RGB = np.linalg.inv(_RGB2YUV).astype(np.float32)


def rgb2yuv(img: np.ndarray) -> np.ndarray:
    """img [H, W, 3] float -> YUV."""
    return img @ _RGB2YUV.T


def yuv2rgb(img: np.ndarray) -> np.ndarray:
    return img @ _YUV2RGB.T


def unwire_uint8(img, color_space: str):
    """Device-side inverse of the uint8 wire format (``Config.uint8_wire``):
    uint8 RGB -> float [0,1] -> configured color space. Pure matmul/scale,
    so it works on numpy AND jax arrays (runs inside the jitted
    objective/detector entry; XLA fuses it into the normalize stage).
    No-op on float inputs, so call sites handle both wire formats with
    one unconditional call."""
    if img.dtype != np.uint8:
        return img
    x = img.astype(np.float32) / np.float32(255.0)
    if color_space == "yuv":
        x = x @ _RGB2YUV.T.astype(np.float32)
    elif color_space not in ("rgb", "", None):
        raise ValueError(
            f"uint8 wire format supports rgb/yuv, not {color_space!r}")
    return x


def rgb2hsv(img: np.ndarray) -> np.ndarray:
    """Standard HSV with H in [0, 1] (torch convention)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.max(img, axis=-1)
    minc = np.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-20), 0.0)
    dz = np.maximum(delta, 1e-20)
    h = np.where(
        maxc == r, (g - b) / dz % 6.0,
        np.where(maxc == g, (b - r) / dz + 2.0, (r - g) / dz + 4.0),
    )
    h = np.where(delta > 0, h / 6.0, 0.0)
    return np.stack([h, s, v], axis=-1).astype(img.dtype)


def _srgb_to_linear(c):
    return np.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def rgb2lab(img: np.ndarray) -> np.ndarray:
    """CIE L*a*b* with D65 white point (torch image.rgb2lab applies the
    sRGB linearization then XYZ -> Lab)."""
    lin = _srgb_to_linear(np.clip(img, 0.0, 1.0))
    m = np.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ],
        dtype=np.float64,
    )
    xyz = lin @ m.T
    white = np.array([0.950456, 1.0, 1.088754])
    xyz = xyz / white
    eps = 0.008856
    f = np.where(xyz > eps, np.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    L = np.where(xyz[..., 1] > eps, 116.0 * f[..., 1] - 16.0, 903.3 * xyz[..., 1])
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1).astype(img.dtype)


def convert_color(img: np.ndarray, color_space: str) -> np.ndarray:
    """``load_image`` color conversion dispatch (``utilities.lua:205-218``)."""
    if color_space in ("rgb", None, ""):
        return img
    if color_space == "yuv":
        return rgb2yuv(img)
    if color_space == "lab":
        return rgb2lab(img)
    if color_space == "hsv":
        return rgb2hsv(img)
    raise ValueError(f"unknown color space: {color_space}")
