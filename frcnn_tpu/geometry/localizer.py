"""Receptive-field coordinate mapping between input-image space and
feature-map space.

The reference builds this at runtime by tracing an nngraph module chain and
collecting (kW, kH, dW, dH, padW, padH) per layer (``Localizer.lua:6-39``).
Here the model is declarative (:class:`frcnn_tpu.config.ModelConfig`), so the
layer list is derived statically — same information, no graph introspection.

Arithmetic reproduces ``Localizer.lua`` exactly on the paths the reference
exercises. Two reference quirks are handled deliberately:

* ``Localizer.lua:52-53,60,74-75`` mix up dW/dH and padW/padH in places.
  All reference models use square kernels/strides/pads, where the mixups are
  no-ops; we implement the clean per-axis version (identical results for
  square layers) and document this divergence.
* ``inputToFeatureRect`` keeps *float* coordinates through the whole layer
  cascade (divisions are real, not integer) and snaps to int only at the end
  (``Localizer.lua:41-67`` ends with ``snapToInt``). We do the same.
* In ``inputToFeatureRect`` the two branches of the ``% dW == 0`` test
  compute the same value (``exact/dW + 1`` equals ``ceil(exact/dW) + 1`` when
  the division is exact), so the whole expression reduces to
  ``max(ceil((max - k)/d) + 1, min + 1)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from frcnn_tpu.config import ModelConfig


@dataclass(frozen=True)
class LayerInfo:
    """Spatial parameters of one conv/pool layer (``Localizer.lua:29-37``)."""

    kW: int
    kH: int
    dW: int = 1
    dH: int = 1
    padW: int = 0
    padH: int = 0
    ceil_mode: bool = False  # output-size rounding (pools use ceil; convs floor)

    def out_size(self, in_w: int, in_h: int) -> Tuple[int, int]:
        """Output spatial size (W, H) of this layer."""
        def one(n, k, d, p):
            if self.ceil_mode:
                o = -(-(n + 2 * p - k) // d) + 1
                # torch SpatialMaxPooling guard: last window must start
                # inside the (padded) input
                if (o - 1) * d >= n + p:
                    o -= 1
            else:
                o = (n + 2 * p - k) // d + 1
            return o

        return one(in_w, self.kW, self.dW, self.padW), one(in_h, self.kH, self.dH, self.padH)


def _block_layers(model: ModelConfig, num_blocks: int) -> List[LayerInfo]:
    """Conv/pool LayerInfos of the first ``num_blocks`` backbone blocks, in
    forward order (each block: conv_steps 3x3/1/1 convs + 2x2/2 ceil pool,
    ``models/model_utilities.lua:17-25``)."""
    layers: List[LayerInfo] = []
    for spec in model.layers[:num_blocks]:
        for _ in range(spec.conv_steps):
            layers.append(
                LayerInfo(kW=spec.kW, kH=spec.kH, dW=1, dH=1, padW=spec.padW, padH=spec.padH)
            )
        layers.append(LayerInfo(kW=2, kH=2, dW=2, dH=2, padW=0, padH=0, ceil_mode=True))
    return layers


def layer_infos_for_tap(model: ModelConfig, tap_index: int) -> List[LayerInfo]:
    """Layer list seen from pnet output ``tap_index`` (0-based anchor-net
    output): backbone blocks up to the anchor net's input block, then the
    anchor net's own kxk valid conv and 1x1 conv (``Localizer`` traces
    through the anchor network too — it is part of the output's module
    chain, ``models/model_utilities.lua:29-35, 51-54``)."""
    spec = model.anchor_nets[tap_index]
    layers = _block_layers(model, spec.input)  # spec.input is 1-based count
    layers.append(LayerInfo(kW=spec.kW, kH=spec.kW, dW=1, dH=1, padW=0, padH=0))
    layers.append(LayerInfo(kW=1, kH=1, dW=1, dH=1, padW=0, padH=0))
    return layers


def layer_infos_for_feature_map(model: ModelConfig) -> List[LayerInfo]:
    """Layer list seen from pnet output 5, the shared conv feature map
    (all backbone blocks, no anchor net)."""
    return _block_layers(model, len(model.layers))


class Localizer:
    """Maps rects between input space and one feature-map space."""

    def __init__(self, layers: Sequence[LayerInfo]):
        self.layers = list(layers)
        # Affine coefficients of feature_to_input (it is exactly affine):
        # input = scale * feature + offset, separately for min and max edges.
        z = self.feature_to_input_rect(0.0, 0.0, 0.0, 0.0)
        o = self.feature_to_input_rect(1.0, 1.0, 1.0, 1.0)
        self.scale_x = o[0] - z[0]
        self.scale_y = o[1] - z[1]
        self.offset_min_x, self.offset_min_y = z[0], z[1]
        self.offset_max_x, self.offset_max_y = z[2], z[3]

    # -- exact reference arithmetic (host scalars) --------------------------

    def feature_to_input_rect(self, min_x, min_y, max_x, max_y,
                              layer_index: Optional[int] = None):
        """``Localizer:featureToInputRect`` (``Localizer.lua:69-79``)."""
        n = len(self.layers) if layer_index is None else layer_index
        for l in reversed(self.layers[:n]):
            min_x = min_x * l.dW - l.padW
            min_y = min_y * l.dH - l.padH
            max_x = max_x * l.dW - l.padW + l.kW - l.dW
            max_y = max_y * l.dH - l.padH + l.kH - l.dH
        return (min_x, min_y, max_x, max_y)

    def input_to_feature_rect(self, min_x, min_y, max_x, max_y,
                              layer_index: Optional[int] = None):
        """``Localizer:inputToFeatureRect`` (``Localizer.lua:41-67``):
        float cascade, valid-convolution shrink per layer, snap at the end.
        Returns integer (floor-min, ceil-max) coordinates."""
        n = len(self.layers) if layer_index is None else layer_index
        for l in self.layers[:n]:
            if l.dW < l.kW:  # overlapping windows: inflate first
                min_x -= l.kW - l.dW
                max_x += l.kW - l.dW
                min_y -= l.kH - l.dH
                max_y += l.kH - l.dH
            min_x += l.padW
            max_x += l.padW
            min_y += l.padH
            max_y += l.padH
            min_x = min_x / l.dW
            min_y = min_y / l.dH
            max_x = max(math.ceil((max_x - l.kW) / l.dW) + 1, min_x + 1)
            max_y = max(math.ceil((max_y - l.kH) / l.dH) + 1, min_y + 1)
        return (
            math.floor(min_x),
            math.floor(min_y),
            math.ceil(max_x),
            math.ceil(max_y),
        )

    # -- vectorized device version ------------------------------------------

    def input_to_feature_rect_jax(self, rects):
        """Vectorized :meth:`input_to_feature_rect` on ``[..., 4]`` float
        arrays. The static layer list unrolls at trace time into a handful of
        elementwise ops — no dynamic control flow."""
        min_x = rects[..., 0]
        min_y = rects[..., 1]
        max_x = rects[..., 2]
        max_y = rects[..., 3]
        for l in self.layers:
            if l.dW < l.kW:
                min_x = min_x - (l.kW - l.dW)
                max_x = max_x + (l.kW - l.dW)
                min_y = min_y - (l.kH - l.dH)
                max_y = max_y + (l.kH - l.dH)
            min_x = (min_x + l.padW) / l.dW
            min_y = (min_y + l.padH) / l.dH
            max_x = jnp.maximum(jnp.ceil((max_x + l.padW - l.kW) / l.dW) + 1, min_x + 1)
            max_y = jnp.maximum(jnp.ceil((max_y + l.padH - l.kH) / l.dH) + 1, min_y + 1)
        return jnp.stack(
            [jnp.floor(min_x), jnp.floor(min_y), jnp.ceil(max_x), jnp.ceil(max_y)],
            axis=-1,
        )

    # -- sizes ---------------------------------------------------------------

    def feature_map_size(self, in_w: int, in_h: int) -> Tuple[int, int]:
        """Static (W, H) of the feature map for an input of (in_w, in_h)."""
        w, h = in_w, in_h
        for l in self.layers:
            w, h = l.out_size(w, h)
        return w, h

    def feature_map_size_jax(self, in_w, in_h):
        """Traced version of :meth:`feature_map_size` for per-example true
        image sizes inside jit. Supports the reference layer shapes
        (convs floor, 2x2/2 pools ceil, no guard needed for k=2/s=2/p=0)."""
        w = jnp.asarray(in_w, jnp.float32)
        h = jnp.asarray(in_h, jnp.float32)
        for l in self.layers:
            if l.ceil_mode:
                w = jnp.ceil((w + 2 * l.padW - l.kW) / l.dW) + 1
                h = jnp.ceil((h + 2 * l.padH - l.kH) / l.dH) + 1
            else:
                w = jnp.floor((w + 2 * l.padW - l.kW) / l.dW) + 1
                h = jnp.floor((h + 2 * l.padH - l.kH) / l.dH) + 1
        return w.astype(jnp.int32), h.astype(jnp.int32)
