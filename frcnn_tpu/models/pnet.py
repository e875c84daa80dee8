"""Proposal network: VGG-style backbone + 4 multi-scale anchor heads.

Mirrors ``create_proposal_net`` (``models/model_utilities.lua:3-74``):

* backbone = sequence of ConvPoolBlocks; each block is ``conv_steps`` 3x3/1/1
  convolutions with PReLU (a SpatialDropout after the FIRST conv of the
  block only — the Lua sets ``dropout = nil`` after step 1,
  ``model_utilities.lua:22``) followed by a 2x2/2 ceil-mode max pool;
* anchor head i = conv(kxk valid -> n) + PReLU + conv(1x1 -> 18), attached
  to the output of backbone block ``anchor_nets[i].input``;
* outputs: the 4 anchor maps followed by the last block's feature map
  (``model_utilities.lua:51-58``).

Layout is NHWC (TPU-native). Conv weights use the reference's MSRA fan-out
init, biases zero (``model_utilities.lua:60-71``).
"""

from __future__ import annotations

import functools
from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from frcnn_tpu.config import ModelConfig
from frcnn_tpu.models.layers import PReLU, ceil_max_pool_2x2, msra_conv_init

ANCHOR_CHANNELS = 3 * (2 + 4)  # 3 aspects x (2 cls + 4 reg) = 18


class ProposalNet(nn.Module):
    model_cfg: ModelConfig
    dtype: Any = jnp.float32
    # Backward implementation of the 2x2 ceil pools: 'xla' (SelectAndScatter
    # autodiff) | 'pallas' | 'pallas_interpret' (ops/pallas_pool_bwd.py,
    # first-max routing in VMEM — same forward values, same routed
    # gradients, 8.3 -> ~3 ms of the batch-8 train step). Forward-only
    # consumers (the detector) see identical programs either way.
    pool_vjp: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False, block0_out=None):
        """x: [B, H, W, 3] -> (anchor_maps: list of [B, Hi, Wi, 18],
        feature_map: [B, Hf, Wf, C_last]).

        ``block0_out``: precomputed output of the first ConvPoolBlock
        (e.g. from the fused s2d kernel, ops/pallas_block0.py) — block 0's
        layers are skipped and the backbone continues from block 1. The
        skipped layers' params stay in the tree untouched."""
        cfg = self.model_cfg
        if self.pool_vjp == "xla":
            pool = ceil_max_pool_2x2
        else:
            from frcnn_tpu.ops.pallas_pool_bwd import (
                ceil_max_pool_2x2_firstmax,
            )

            pool = functools.partial(
                ceil_max_pool_2x2_firstmax,
                interpret=self.pool_vjp == "pallas_interpret",
            )
        block_outputs: List = []
        if block0_out is not None:
            x = block0_out.astype(self.dtype)
            block_outputs.append(x)
        else:
            x = x.astype(self.dtype)
        for bi, spec in enumerate(cfg.layers):
            if block0_out is not None and bi == 0:
                continue
            for si in range(spec.conv_steps):
                x = nn.Conv(
                    spec.filters,
                    (spec.kH, spec.kW),
                    strides=(1, 1),
                    padding=[(spec.padH, spec.padH), (spec.padW, spec.padW)],
                    kernel_init=msra_conv_init,
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"block{bi}_conv{si}",
                )(x)
                x = PReLU(dtype=self.dtype, name=f"block{bi}_prelu{si}")(x)
                if si == 0 and spec.dropout > 0:
                    # SpatialDropout: drop whole channels per sample
                    x = nn.Dropout(
                        rate=spec.dropout,
                        broadcast_dims=(1, 2),
                        deterministic=not train,
                        name=f"block{bi}_spatialdrop",
                    )(x)
            x = pool(x)
            block_outputs.append(x)

        anchor_maps = []
        for ai, aspec in enumerate(cfg.anchor_nets):
            h = block_outputs[aspec.input - 1]  # spec.input is 1-based
            h = nn.Conv(
                aspec.n,
                (aspec.kW, aspec.kW),
                strides=(1, 1),
                padding="VALID",
                kernel_init=msra_conv_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"anchor{ai}_conv",
            )(h)
            h = PReLU(dtype=self.dtype, name=f"anchor{ai}_prelu")(h)
            h = nn.Conv(
                ANCHOR_CHANNELS,
                (1, 1),
                padding="VALID",
                kernel_init=msra_conv_init,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"anchor{ai}_out",
            )(h)
            anchor_maps.append(h)

        # Outputs stay in compute dtype; consumers cast the (small)
        # flattened prediction tensor to fp32 for box math. Keeping the
        # shared feature map in bf16 halves ROI-pool HBM traffic.
        return anchor_maps, block_outputs[-1]
