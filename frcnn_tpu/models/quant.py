"""Int8 quantized serving path for the proposal network.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS); the detect
benchmark is conv-roofline-bound, so an int8 backbone is the main lever
past the bf16 ceiling. This is an OPT-IN serving mode — the bf16/fp32 path
stays the default for reference parity.

Scheme: symmetric per-output-channel weight quantization (offline,
:func:`quantize_pnet_params`) x dynamic symmetric per-tensor activation
quantization (abs-max per call). Convolutions accumulate in int32 and
dequantize into the PReLU/pool epilogue. No calibration data needed.

The module consumes the standard fp32 pnet param pytree (same checkpoint)
and mirrors the eval-mode forward of :class:`ProposalNet` exactly
(block convs -> PReLU -> ceil pool; anchor heads kxk valid + 1x1).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from frcnn_tpu.config import ModelConfig
from frcnn_tpu.models.layers import ceil_max_pool_2x2


def _quantize_weight(w):
    """HWIO fp32 -> (int8 weights, per-out-channel scale)."""
    s = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_pnet_params(params: Dict, model_cfg: ModelConfig) -> Dict:
    """Quantize every conv kernel of the pnet param tree; PReLU slopes and
    biases stay fp32."""
    q: Dict[str, Any] = {}
    p = params["pnet"]

    def add_conv(name):
        wq, s = _quantize_weight(p[name]["kernel"])
        q[name] = {"w_int8": wq, "scale": s, "bias": p[name]["bias"]}

    for bi, spec in enumerate(model_cfg.layers):
        for si in range(spec.conv_steps):
            add_conv(f"block{bi}_conv{si}")
            q[f"block{bi}_prelu{si}"] = {"slope": p[f"block{bi}_prelu{si}"]["slope"]}
    for ai in range(len(model_cfg.anchor_nets)):
        add_conv(f"anchor{ai}_conv")
        add_conv(f"anchor{ai}_out")
        q[f"anchor{ai}_prelu"] = {"slope": p[f"anchor{ai}_prelu"]["slope"]}
    return q


def _qconv(x, layer: Dict, padding, act_dtype=jnp.bfloat16):
    """Dynamic per-tensor int8 activation quant -> int8 conv (int32
    accumulate on the MXU) -> dequantized fp output + bias."""
    s_x = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    s_x = jnp.maximum(s_x, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        layer["w_int8"],
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (s_x * layer["scale"]).astype(jnp.float32)
    out = y.astype(jnp.float32) * scale[None, None, None, :] + layer["bias"]
    return out.astype(act_dtype)


def _prelu(x, slope):
    a = slope.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def quant_pnet_apply(qparams: Dict, model_cfg: ModelConfig, x,
                     act_dtype=jnp.bfloat16) -> Tuple[List, Any]:
    """Eval-mode forward identical in structure to ProposalNet.__call__.
    x: [B, H, W, 3] -> (anchor_maps, feature_map)."""
    x = x.astype(act_dtype)
    block_outputs = []
    for bi, spec in enumerate(model_cfg.layers):
        for si in range(spec.conv_steps):
            pad = [(spec.padH, spec.padH), (spec.padW, spec.padW)]
            x = _qconv(x, qparams[f"block{bi}_conv{si}"], pad, act_dtype)
            x = _prelu(x, qparams[f"block{bi}_prelu{si}"]["slope"])
        x = ceil_max_pool_2x2(x)
        block_outputs.append(x)

    anchor_maps = []
    for ai, aspec in enumerate(model_cfg.anchor_nets):
        h = block_outputs[aspec.input - 1]
        h = _qconv(h, qparams[f"anchor{ai}_conv"], "VALID", act_dtype)
        h = _prelu(h, qparams[f"anchor{ai}_prelu"]["slope"])
        h = _qconv(h, qparams[f"anchor{ai}_out"], "VALID", act_dtype)
        anchor_maps.append(h)
    return anchor_maps, block_outputs[-1]


class QuantizedPNetAdapter:
    """Duck-types ``ProposalNet.apply`` for ``build_detect_fn``: the
    detector calls ``pnet.apply({'params': params['pnet']}, x, train=False)``;
    this adapter runs the int8 path from pre-quantized params instead."""

    def __init__(self, model_cfg: ModelConfig, qparams: Dict,
                 act_dtype=jnp.bfloat16):
        self.model_cfg = model_cfg
        self.qparams = qparams
        self.act_dtype = act_dtype

    def apply(self, variables, x, train: bool = False, rngs=None):
        del variables, train, rngs
        return quant_pnet_apply(self.qparams, self.model_cfg, x, self.act_dtype)
