"""Fused first-conv-block kernel: conv3x3(C=3->F) + PReLU + 2x2/2 ceil
max-pool in one Pallas pass.

Replaces the first ``ConvPoolBlock`` of the proposal net
(``models/model_utilities.lua:17-25`` — SpatialConvolution 3->64 + PReLU +
ceil SpatialMaxPooling) on the serving path. Measured on TPU v5e at batch
16 @450x800 this block costs 5.8 ms under XLA — half the whole detect
forward — for only 1.2 GFLOP/img (~1% MXU): a 3-channel input occupies 3
of 128 MXU contraction lanes, and the pre-pool activation is a 737 MB HBM
round-trip. No XLA formulation fixes both (measured: NHWC conv 6.8 ms,
channel-padded 6.9 ms, im2col einsum 16.2 ms, space-to-depth conv 11 ms —
the phase-max epilogue never fuses).

TPU-native fix: express pool(prelu(conv_s1(x))) as FOUR phase-shifted
stride-2 convs whose outputs are max-reduced, over a space-to-depth input
layout, with everything after the patch matmul fused in VMEM:

  out[i,j,o] = max_{p=(ry,rx)} prelu(b[o] + sum_k patch[i,j,k] W[k, 64p+o])

The 64-row patch basis k (one 16-group per 2x2 CELL offset g=(cy,cx) of
the 3x3 footprint re-tiled on 2x2 cells) is split by channel:

  k = 16*g + 2*ph + (c-1)   chroma channels c in {1,2}   (rows 0..7)
  k = 16*g + 8 + ph         luminance c = 0               (rows 8..11)
  rows 12..15               zero padding

with ph = 2*qy+qx the within-cell pixel. The split matches the two host
input arrays (see :func:`pack_s2d`):

  lum4   [B, 4, Hc, Wc]   phase-MAJOR luminance planes — the layout the
                          contrastive normalization wants (all phase ops
                          are page selects; the previous interleaved
                          layout spent 1.3 ms/batch16 on luminance
                          extract/reinsert relayouts, measured),
  chroma [B, Hc, 8, Wc]   phase-interleaved chroma — 8 sublanes, so each
                          kernel scratch write is one aligned [8, W] tile.

Per output row the kernel does four [8, W] chroma tile copies, sixteen
[1, W] luminance row copies, one [F4, 64]x[64, W] MXU matmul (contraction
64/128 lanes vs 3/128 for the naive conv), and a sublane-group max — the
[B, H, W, F] pre-pool tensor never exists.

Serving/inference only (no VJP): training keeps the XLA conv path, which
autodiff handles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(c0_ref, c1_ref, c2_ref, c3_ref, l0_ref, l1_ref, l2_ref, l3_ref,
            wt_ref, bias_ref, slope_ref, *rest, tr: int,
            f: int, nhwc_out: bool, quant_out: bool):
    if quant_out:
        inv_s_ref, out_ref, scratch = rest
    else:
        out_ref, scratch = rest
    cviews = (c0_ref, c1_ref, c2_ref, c3_ref)
    lviews = (l0_ref, l1_ref, l2_ref, l3_ref)
    wo = c0_ref.shape[3]
    ws = scratch.shape[1] // tr          # 128-aligned per-row stride
    for g in range(4):
        # basis rows 12..15 of each 16-group are padding; the matmul reads
        # all 64 scratch rows, so they must be zero, not stale VMEM
        scratch[16 * g + 12:16 * (g + 1), :] = jnp.zeros(
            (4, tr * ws), scratch.dtype
        )
    # patch columns for ALL tr rows side by side -> ONE [4f, 64] x
    # [64, tr*WS] MXU matmul per grid step (a per-row [64, W] matmul left
    # the MXU under-fed: M=256/K=64 setup and the epilogue ran 8x). Row
    # segments sit at a 128-multiple stride WS so every scratch write is
    # lane-aligned; the pad columns hold garbage the output slicing drops.
    for r in range(tr):
        sl = slice(r * ws, r * ws + wo)
        for g in range(4):
            scratch[16 * g:16 * g + 8, sl] = cviews[g][0, r]
            for p in range(4):
                scratch[16 * g + 8 + p, sl] = lviews[g][0, p, r, :]
    y = jax.lax.dot_general(
        wt_ref[:, :], scratch[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [4f, tr*WS]
    y = y + bias_ref[:, :]
    slope = slope_ref[0, 0]
    y = jnp.where(y >= 0.0, y, slope * y)
    m = jnp.maximum(
        jnp.maximum(y[0 * f:1 * f], y[1 * f:2 * f]),
        jnp.maximum(y[2 * f:3 * f], y[3 * f:4 * f]),
    )  # [f, tr*WS]
    if quant_out:
        # emit the block output already quantized at the consumer's static
        # activation scale (models/quant.py int8s scheme): the inter-block
        # bf16 write + read + standalone quantize pass never exists
        m = jnp.clip(jnp.round(m * inv_s_ref[0, 0]), -127.0, 127.0)
    for r in range(tr):
        blk = m[:, r * ws:r * ws + wo]
        if nhwc_out:
            # emit [W, F] directly: the in-VMEM transpose replaces a
            # separate [B, Ho, F, Wo] -> NHWC XLA relayout pass over HBM
            out_ref[0, r] = blk.T.astype(out_ref.dtype)
        else:
            out_ref[0, r] = blk.astype(out_ref.dtype)


def _k_index(cy, cx, qy, qx, c):
    g = 2 * cy + cx
    ph = 2 * qy + qx
    return 16 * g + (8 + ph if c == 0 else 2 * ph + (c - 1))


def block0_weights(w, b):
    """Re-tile HWIO [3,3,3,F] conv weights onto the 64-row patch basis.

    Returns (wt [4F, 64], bias [4F, 1]) as numpy float32. Row 64p+o of wt
    is output channel o of pooling phase p=(ry,rx); column k follows the
    basis documented in the module docstring.
    """
    w = np.asarray(w, np.float32)
    b = np.asarray(b, np.float32)
    kh, kw, cin, f = w.shape
    assert (kh, kw, cin) == (3, 3, 3), "block0 kernel expects 3x3, C_in=3"
    wt = np.zeros((4 * f, 64), np.float32)
    for ry in range(2):
        for rx in range(2):
            p = 2 * ry + rx
            for ky in range(3):
                for kx in range(3):
                    cy, qy = divmod(ry + ky, 2)
                    cx, qx = divmod(rx + kx, 2)
                    for c in range(3):
                        k = _k_index(cy, cx, qy, qx, c)
                        wt[f * p:f * (p + 1), k] += w[ky, kx, c]
    bias = np.tile(b, 4)[:, None].astype(np.float32)
    return wt, bias


@functools.lru_cache(maxsize=1)
def _basis_map():
    """Static 0/1 tensor A [4, 64, 27]: wt[f*p+o, k] = sum_j A[p,k,j] *
    w.reshape(27,f)[j,o] (j = (ky*3+kx)*3+c)."""
    A = np.zeros((4, 64, 27), np.float32)
    for ry in range(2):
        for rx in range(2):
            p = 2 * ry + rx
            for ky in range(3):
                for kx in range(3):
                    cy, qy = divmod(ry + ky, 2)
                    cx, qx = divmod(rx + kx, 2)
                    for c in range(3):
                        k = _k_index(cy, cx, qy, qx, c)
                        A[p, k, (ky * 3 + kx) * 3 + c] = 1.0
    return A


def block0_weights_jnp(w, b):
    """Traced variant of :func:`block0_weights` for use inside jit: the
    re-tiling is one einsum against a static 0/1 basis map."""
    f = w.shape[-1]
    A = jnp.asarray(_basis_map())
    wt = jnp.einsum("pkj,jf->pfk", A, w.reshape(27, f))
    return wt.reshape(4 * f, 64), jnp.tile(b, 4)[:, None].astype(jnp.float32)


def pack_s2d(x):
    """NHWC [B, H, W, 3] float -> (lum4, chroma) space-to-depth planes:

      lum4   [B, 4, Hc, Wc]:  lum4[b, 2qy+qx, i, j]        = P[2i+qy, 2j+qx, 0]
      chroma [B, Hc, 8, Wc]:  chroma[b, i, 2(2qy+qx)+c-1, j] = P[2i+qy, 2j+qx, c]

    with P = pad(x[b], 1) and Hc = H/2+1, Wc = W/2+1. On the serving path
    the host pipeline produces this layout directly (free host-side
    choice; a device-side repack costs ~3 ms/batch16, measured). This
    builder exists for parity tests and as a fallback. Works on numpy or
    jax arrays.
    """
    B, H, W, C = x.shape
    assert C == 3 and H % 2 == 0 and W % 2 == 0
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    Hc, Wc = (H + 2) // 2, (W + 2) // 2
    ph = xp.reshape(B, Hc, 2, Wc, 2, 3)          # [B, i, qy, j, qx, c]
    lum4 = ph[..., 0].transpose(0, 2, 4, 1, 3).reshape(B, 4, Hc, Wc)
    chroma = ph[..., 1:].transpose(0, 1, 2, 4, 5, 3).reshape(B, Hc, 8, Wc)
    return lum4, chroma


def pack_s2d_np(x):
    """Pure-numpy :func:`pack_s2d` for the HOST side of the serving path:
    the pack happens on CPU before the device transfer, so the device only
    ever sees the kernel-native layout (a device-side repack costs
    ~3 ms/batch16, measured)."""
    x = np.asarray(x)
    B, H, W, C = x.shape
    assert C == 3 and H % 2 == 0 and W % 2 == 0
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    Hc, Wc = (H + 2) // 2, (W + 2) // 2
    ph = xp.reshape(B, Hc, 2, Wc, 2, 3)
    lum4 = np.ascontiguousarray(
        ph[..., 0].transpose(0, 2, 4, 1, 3)).reshape(B, 4, Hc, Wc)
    chroma = np.ascontiguousarray(
        ph[..., 1:].transpose(0, 1, 2, 4, 5, 3)).reshape(B, Hc, 8, Wc)
    return lum4, chroma


def views_from_s2d(lum4, chroma, out_dtype=jnp.bfloat16):
    """(lum4 [B,4,Hc,Wc], chroma [B,Hc,8,Wc]) -> kernel inputs: four
    chroma views [B, Ho, 8, Wo] and four luminance views [B, 4, Ho, Wo]
    (cell offsets g=(cy,cx) of the 2-cell conv footprint)."""
    B, Hc, _, Wc = chroma.shape
    Ho, Wo = Hc - 1, Wc - 1
    c16 = chroma.astype(out_dtype)
    l16 = lum4.astype(out_dtype)
    cviews = [c16[:, cy:cy + Ho, :, cx:cx + Wo]
              for cy in range(2) for cx in range(2)]
    lviews = [l16[:, :, cy:cy + Ho, cx:cx + Wo]
              for cy in range(2) for cx in range(2)]
    return cviews, lviews


def fused_block0(cviews, lviews, wt, bias, slope, out_dtype=None,
                 tr: int = 8, interpret: bool = False,
                 out_layout: str = "cmid", compute_dtype=jnp.bfloat16,
                 out_scale=None):
    """Run the fused block0 kernel.

    Args:
      cviews: four [B, Ho, 8, Wo] chroma views (``views_from_s2d`` or
        host-packed).
      lviews: four [B, 4, Ho, Wo] luminance views.
      wt, bias: from :func:`block0_weights` (device arrays ok).
      slope: scalar PReLU slope.
      out_layout: 'cmid' -> [B, Ho, F, Wo] (channels-middle); 'nhwc' ->
        [B, Ho, Wo, F] written transposed in-kernel (saves the XLA
        relayout pass the downstream NHWC conv would otherwise trigger).
      compute_dtype: input/scratch dtype of the matmul (the config's
        compute dtype — fp32 configs must not silently degrade to bf16);
        the accumulate + epilogue are always fp32.
      out_scale: when given, the output is quantized in-kernel at this
        static activation scale (``clip(round(x / s))``) and returned as
        int8 — the layout the int8s serving path's next conv consumes
        directly (``models/quant.py::_qconv`` tuple input).
    Returns the block-0 output in the requested layout (``out_dtype``
    defaults to ``compute_dtype``; forced int8 under ``out_scale``).
    """
    B, Ho, _, Wo = cviews[0].shape
    f4 = wt.shape[0]
    f = f4 // 4
    quant_out = out_scale is not None
    if quant_out:
        out_dtype = jnp.int8
    elif out_dtype is None:
        out_dtype = compute_dtype
    nhwc_out = out_layout == "nhwc"
    grid = (B, (Ho + tr - 1) // tr)
    kern = functools.partial(_kernel, tr=tr, f=f, nhwc_out=nhwc_out,
                             quant_out=quant_out)
    cspec = pl.BlockSpec((1, tr, 8, Wo), lambda b, t: (b, t, 0, 0))
    lspec = pl.BlockSpec((1, 4, tr, Wo), lambda b, t: (b, 0, t, 0))
    out_shape = (B, Ho, Wo, f) if nhwc_out else (B, Ho, f, Wo)
    out_block = (1, tr, Wo, f) if nhwc_out else (1, tr, f, Wo)
    extra_specs = []
    extra_args = []
    if quant_out:
        extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        extra_args = [
            (1.0 / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)
        ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        grid=grid,
        in_specs=[cspec] * 4 + [lspec] * 4 + [
            pl.BlockSpec((f4, 64), lambda b, t: (0, 0)),
            pl.BlockSpec((f4, 1), lambda b, t: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec(out_block, lambda b, t: (b, t, 0, 0)),
        scratch_shapes=[pltpu.VMEM((64, tr * (-(-Wo // 128) * 128)),
                                   compute_dtype)],
        interpret=interpret,
    )(
        *[v.astype(compute_dtype) for v in cviews],
        *[v.astype(compute_dtype) for v in lviews],
        jnp.asarray(wt, compute_dtype),
        jnp.asarray(bias, jnp.float32),
        jnp.asarray(slope, jnp.float32).reshape(1, 1),
        *extra_args,
    )
    return out


def block0_nhwc(x, w, b, slope, interpret: bool = False):
    """Drop-in pool(prelu(conv3x3_same(x))) for NHWC float input; returns
    NHWC [B, H/2, W/2, F]. Parity/reference entry around the kernel."""
    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt, bias = block0_weights(w, b)
    out = fused_block0(cviews, lviews, wt, bias, slope, interpret=interpret)
    return out.transpose(0, 1, 3, 2)
