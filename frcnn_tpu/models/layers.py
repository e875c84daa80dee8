"""Shared flax building blocks mirroring the reference's Torch modules.

* :class:`PReLU` — ``nn.PReLU()`` default: ONE learnable slope shared across
  all channels, init 0.25 (``models/model_utilities.lua:9,32,86``).
* :func:`ceil_max_pool_2x2` — ``nn.SpatialMaxPooling(2,2,2,2):ceil()``
  (``models/model_utilities.lua:23``): odd extents pad one cell on the
  bottom/right; padding must not win the max, so pad with -inf.
* :class:`MaskedBatchNorm` — ``nn.BatchNormalization`` (eps 1e-5, momentum
  0.1) with an example-validity mask: the reference feeds cnet one image's
  ROIs at a time, so batch statistics are computed over *real* examples of
  the image only; padded rows must not pollute them.
* He/MSRA conv init matching ``models/model_utilities.lua:60-71``:
  normal(0, sqrt(2 / (kW*kH*nOutputPlane))) — fan-OUT, like the Lua code.
* Linear layers keep the Torch default init (the reference's init pass only
  touches SpatialConvolution): uniform(-1/sqrt(fanIn), 1/sqrt(fanIn)) for
  both weight and bias.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def msra_conv_init(key, shape, dtype=jnp.float32):
    """shape HWIO: normal with std sqrt(2 / (kh*kw*out_channels))."""
    kh, kw, _, out_ch = shape
    std = jnp.sqrt(2.0 / (kh * kw * out_ch))
    return jax.random.normal(key, shape, dtype) * std


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """shape (in, out): uniform(-1/sqrt(in), 1/sqrt(in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU() default), slope init 0.25."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", lambda k, s: jnp.full(s, 0.25, jnp.float32), (1,))
        a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


def ceil_max_pool_2x2(x):
    """2x2 stride-2 max pool with ceil-mode output size. x: [..., H, W, C].

    Backward goes through XLA's reduce_window autodiff (SelectAndScatter).
    An elementwise first-max custom VJP was tried and REVERTED: its
    stride-2 slices + interleave are relayout-bound on TPU tiled layouts
    and measured 15 ms SLOWER than SelectAndScatter across the train
    step's four pool backwards (scripts/tpu_results.log r2s8)."""
    h, w = x.shape[-3], x.shape[-2]
    pad_h = h % 2
    pad_w = w % 2
    if pad_h or pad_w:
        # max-identity padding; int dtypes (the s8-pooled serving path)
        # pad with the dtype min instead of -inf
        pad_val = (jnp.iinfo(x.dtype).min
                   if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
        pad_cfg = [(0, 0)] * (x.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
        x = jnp.pad(x, pad_cfg, constant_values=pad_val)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class MaskedBatchNorm(nn.Module):
    """BatchNorm with row validity mask and per-group statistics.

    ``x: [..., R, F]``, ``mask: [..., R]``: statistics are computed over the
    R axis *per leading group* — the reference runs cnet once per image on
    that image's ROI batch (``objective.lua:164``), so train-time batch
    statistics are per-image, not global. Torch defaults: eps 1e-5, momentum
    0.1, affine, biased batch variance (unbiased into the running estimate).

    Divergence from the reference: running stats are updated once per train
    step with the mean of the per-image batch statistics, instead of one
    sequential momentum step per image (not expressible in a parallel batch;
    affects eval-mode stats only, and only their warmup trajectory).
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[..., None]
            n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
            mean = jnp.sum(xf * m, axis=-2, keepdims=True) / n
            var = jnp.sum(m * (xf - mean) ** 2, axis=-2, keepdims=True) / n
            if not self.is_initializing():
                reduce_axes = tuple(range(x.ndim - 2))
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                g_mean = jnp.mean(mean, axis=reduce_axes + (x.ndim - 2,))
                g_var = jnp.mean(unbiased, axis=reduce_axes + (x.ndim - 2,))
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * g_mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * g_var
                )
        inv = jax.lax.rsqrt(var + self.eps)
        out = (xf - mean) * inv * gamma + beta
        return out.astype(self.dtype)
