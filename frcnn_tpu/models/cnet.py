"""Classification head: MLP over pooled ROI features, splitting into a
4-dim box-refinement head and a log-softmax class head.

Mirrors ``create_classification_net`` (``models/model_utilities.lua:76-124``):
Linear -> (BatchNorm) -> PReLU -> (Dropout) per hidden layer, then
``Linear(prev, 4)`` for regression and ``Linear(prev, C+1) + LogSoftMax``
for classification over class_count + background.

Linear init is the Torch default (the reference's MSRA init pass only
matches SpatialConvolution modules, so cnet's Linears keep
uniform(+-1/sqrt(fanIn))).

Input is a flattened pooled ROI ``[*, R, kh*kw*C]``; flattening order here
is (y, x, c) from NHWC pooling — a fixed permutation of the reference's
(c, y, x), irrelevant since weights are trained from scratch in this layout.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from frcnn_tpu.config import ModelConfig
from frcnn_tpu.models.layers import (
    MaskedBatchNorm,
    PReLU,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)


class ClassificationNet(nn.Module):
    model_cfg: ModelConfig
    num_classes_with_bg: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        """x: [..., R, D]; mask: [..., R] validity (None = all valid).

        Returns (reg [..., R, 4] fp32, log_probs [..., R, C+1] fp32).
        """
        if mask is None:
            mask = jnp.ones(x.shape[:-1], bool)
        x = x.astype(self.dtype)
        for li, spec in enumerate(self.model_cfg.class_layers):
            fan_in = x.shape[-1]
            x = nn.Dense(
                spec.n,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(fan_in),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"fc{li}",
            )(x)
            if spec.batch_norm:
                x = MaskedBatchNorm(
                    spec.n, dtype=self.dtype, name=f"bn{li}"
                )(x, mask, use_running_average=not train)
            x = PReLU(dtype=self.dtype, name=f"prelu{li}")(x)
            if spec.dropout > 0:
                x = nn.Dropout(
                    rate=spec.dropout, deterministic=not train, name=f"drop{li}"
                )(x)

        fan_in = x.shape[-1]
        reg = nn.Dense(
            4,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="reg_head",
        )(x)
        logits = nn.Dense(
            self.num_classes_with_bg,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="cls_head",
        )(x)
        log_probs = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return reg.astype(jnp.float32), log_probs
