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


def _quantize_act(x, s_x):
    """Symmetric per-tensor activation quantization at scale ``s_x``."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_x), -127, 127
    ).astype(jnp.int8)


def _qconv(x, layer: Dict, padding, act_dtype=jnp.bfloat16, s_x=None):
    """Per-tensor int8 activation quant -> int8 conv (int32 accumulate on
    the MXU) -> dequantized fp output + bias.

    ``x`` may be a ``(xq int8, scale)`` tuple — an already-quantized
    activation from the s8-pooled producer path — in which case the
    quantize step is skipped and ``scale`` overrides ``s_x``.

    ``s_x=None`` computes the activation scale dynamically (abs-max over
    the tensor — an extra full HBM reduce pass per conv, plus it blocks
    XLA from fusing the quantize into the producer's epilogue because of
    the reduce dependency). Passing a static calibrated ``s_x`` removes
    both costs; see :func:`calibrate_pnet_scales`."""
    if isinstance(x, tuple):
        xq, s_x = x
    else:
        if s_x is None:
            s_x = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
            s_x = jnp.maximum(s_x, 1e-12)
        xq = _quantize_act(x, s_x)
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
                     act_dtype=jnp.bfloat16, act_scales: Dict = None,
                     _record: Dict = None, block0_out=None,
                     pool_s8: bool = False) -> Tuple[List, Any]:
    """Eval-mode forward identical in structure to ProposalNet.__call__.
    x: [B, H, W, 3] -> (anchor_maps, feature_map).

    ``act_scales``: optional {conv_name: scalar} static activation scales
    (from :func:`calibrate_pnet_scales`); absent entries fall back to
    dynamic abs-max. ``_record``: internal — a dict the dynamically
    computed scales are written into during calibration. ``block0_out``:
    precomputed first-block output (fused s2d kernel) — block 0 skipped.

    ``pool_s8`` (static scales only): quantize each block's activation in
    the conv epilogue (where XLA fuses it) and run the 2x2 pool on int8 —
    EXACT vs the quantize-after-pool order because ``round(x/s)`` is
    monotone, so max commutes with it. Cuts the pool's HBM traffic 4x
    (bf16 -> s8) and removes the standalone quantize pass between blocks
    (docs/perf_ceiling.md "Parked gaps" #1). Consumers of a block output
    (next block conv, anchor heads) receive the s8 tensor with its scale;
    calibration records one scale per conv input, and all consumers of
    the same tensor record the same abs-max, so the dequant arithmetic is
    unchanged."""
    pool_s8 = pool_s8 and act_scales is not None and _record is None

    def qconv(x, name, pad):
        if isinstance(x, tuple):
            return _qconv(x, qparams[name], pad, act_dtype)
        s_x = None if act_scales is None else act_scales.get(name)
        if s_x is None and _record is not None:
            s_x = jnp.maximum(
                jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0, 1e-12
            )
            _record[name] = s_x
        return _qconv(x, qparams[name], pad, act_dtype, s_x=s_x)

    def next_consumer_scale(bi):
        """The calibrated scale of the conv that consumes block ``bi``'s
        pooled output: block bi+1's first conv, or (for the last block)
        the first anchor conv tapping it. None when uncalibrated."""
        if bi + 1 < len(model_cfg.layers):
            return act_scales.get(f"block{bi + 1}_conv0")
        for ai, aspec in enumerate(model_cfg.anchor_nets):
            if aspec.input - 1 == bi:
                return act_scales.get(f"anchor{ai}_conv")
        return None

    block_outputs = []
    if block0_out is not None:
        # (int8, scale) tuple from an s8-emitting fused block0 kernel
        # passes straight through to block1's conv
        x = (block0_out if isinstance(block0_out, tuple)
             else block0_out.astype(act_dtype))
        block_outputs.append(x)
    else:
        x = x.astype(act_dtype)
    for bi, spec in enumerate(model_cfg.layers):
        if block0_out is not None and bi == 0:
            continue
        for si in range(spec.conv_steps):
            pad = [(spec.padH, spec.padH), (spec.padW, spec.padW)]
            x = qconv(x, f"block{bi}_conv{si}", pad)
            x = _prelu(x, qparams[f"block{bi}_prelu{si}"]["slope"])
        s_next = next_consumer_scale(bi) if pool_s8 else None
        if s_next is not None:
            xq = ceil_max_pool_2x2(_quantize_act(x, s_next))
            x = (xq, s_next)
        else:
            x = ceil_max_pool_2x2(x)
        block_outputs.append(x)

    anchor_maps = []
    for ai, aspec in enumerate(model_cfg.anchor_nets):
        h = block_outputs[aspec.input - 1]
        h = qconv(h, f"anchor{ai}_conv", "VALID")
        h = _prelu(h, qparams[f"anchor{ai}_prelu"]["slope"])
        h = qconv(h, f"anchor{ai}_out", "VALID")
        anchor_maps.append(h)
    fm = block_outputs[-1]
    if isinstance(fm, tuple):
        xq, s = fm
        fm = (xq.astype(jnp.float32) * s).astype(act_dtype)
    return anchor_maps, fm


def calibrate_pnet_scales(qparams: Dict, model_cfg: ModelConfig, images,
                          act_dtype=jnp.bfloat16, margin: float = 1.0,
                          block0_out=None) -> Dict:
    """Run the dynamic-quant forward once over a calibration batch and
    return {conv_name: activation scale} for use as static ``act_scales``.

    Scales are computed through the QUANTIZED forward (so each layer's
    scale reflects upstream quantization error, exactly matching what the
    dynamic path would use on this data). ``margin`` > 1 leaves headroom
    against clipping on unseen inputs. ``block0_out``: precomputed
    first-block output — pass the fused s2d kernel's output here when
    calibrating for an s2d serving config, so block1's scale is recorded
    from the distribution inference actually feeds it (block0's own conv
    scales are then not recorded: s2d inference never runs them)."""
    record: Dict[str, Any] = {}
    quant_pnet_apply(qparams, model_cfg, images, act_dtype, _record=record,
                     block0_out=block0_out)
    return {k: v * margin for k, v in record.items()}


class QuantizedPNetAdapter:
    """Duck-types ``ProposalNet.apply`` for ``build_detect_fn``: the
    detector calls ``pnet.apply({'params': params['pnet']}, x, train=False)``;
    this adapter runs the int8 path from pre-quantized params instead."""

    def __init__(self, model_cfg: ModelConfig, qparams: Dict,
                 act_dtype=jnp.bfloat16, act_scales: Dict = None,
                 pool_s8: bool = False):
        self.model_cfg = model_cfg
        self.qparams = qparams
        self.act_dtype = act_dtype
        self.act_scales = act_scales
        self.pool_s8 = pool_s8

    def calibrate(self, images, block0_out=None, extra_scales: Dict = None):
        """Record static activation scales from a calibration batch (see
        :func:`calibrate_pnet_scales`); subsequent ``apply`` calls skip the
        per-conv dynamic abs-max reduce. ``block0_out``/``extra_scales``:
        s2d-serving calibration (see
        ``detect/detector.py::calibrate_quantized_pnet``)."""
        scales = calibrate_pnet_scales(
            self.qparams, self.model_cfg, images, self.act_dtype,
            block0_out=block0_out,
        )
        if extra_scales:
            scales.update(extra_scales)
        self.act_scales = scales
        return self

    def apply(self, variables, x, train: bool = False, rngs=None,
              block0_out=None):
        del variables, train, rngs
        return quant_pnet_apply(self.qparams, self.model_cfg, x,
                                self.act_dtype, act_scales=self.act_scales,
                                block0_out=block0_out,
                                pool_s8=self.pool_s8)
