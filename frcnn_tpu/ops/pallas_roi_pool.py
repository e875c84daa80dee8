"""Pallas TPU kernel for batched adaptive-max ROI pooling.

The XLA formulation (ops/roi_pool.py) scans masked windows of width W per
(roi, bin); this kernel keeps each image's feature map resident in VMEM and
slices only a static ``MAXW``-wide window per column bin (bin width is
bounded by ceil(W/kw)+1), cutting VPU work ~W/MAXW-fold and all HBM
re-reads. Grid is one program per image; ROI rects arrive via scalar
prefetch in SMEM.

Semantics identical to ``adaptive_max_pool`` (Torch adaptive bin edges,
overlapping bins for small regions). Differentiable via custom VJP whose
backward recomputes through the XLA formulation (gradient = scatter into
the argmax cells, as the reference does with saved pool indices,
``objective.lua:182-185``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frcnn_tpu.ops import roi_pool as xla_pool


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(rects_ref, fmt_ref, out_ref, colmax_ref, *, kh: int, kw: int,
            maxw: int, maxh: int, n_rois: int):
    """fmt_ref: [1, W, H, C] (W leading so per-bin dynamic slices run along
    an UNTILED axis — Mosaic requires sublane-dim dynamic offsets to be
    8-aligned); colmax scratch: [H, kw, C] for the same reason on rows.
    rects_ref: this block's [1, n_rois, 4] int32 rects in SMEM."""
    W = fmt_ref.shape[1]
    H = fmt_ref.shape[2]

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (maxw, 1, 1), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (maxh, 1, 1), 0)
    neg = jnp.asarray(-jnp.inf, fmt_ref.dtype)

    def roi_body(rr, _):
        x0 = rects_ref[0, rr, 0]
        y0 = rects_ref[0, rr, 1]
        x1 = rects_ref[0, rr, 2]
        y1 = rects_ref[0, rr, 3]
        w = x1 - x0
        h = y1 - y0

        # column bins -> colmax[:, cb, :] = [H, C]
        for cb in range(kw):
            lo = x0 + (cb * w) // kw
            hi = x0 + _ceil_div_t(((cb + 1) * w), kw)
            lo_c = jnp.clip(lo, 0, W - maxw)
            shift = lo - lo_c
            window = fmt_ref[0, pl.ds(lo_c, maxw), :, :]      # [maxw, H, C]
            mask = (col_iota >= shift) & (col_iota < shift + (hi - lo))
            colmax_ref[:, cb, :] = jnp.max(
                jnp.where(mask, window, neg), axis=0
            )

        # row bins over colmax scratch [H, kw, C]
        for rb in range(kh):
            lo = y0 + (rb * h) // kh
            hi = y0 + _ceil_div_t(((rb + 1) * h), kh)
            lo_c = jnp.clip(lo, 0, H - maxh)
            shift = lo - lo_c
            window = colmax_ref[pl.ds(lo_c, maxh), :, :]       # [maxh, kw, C]
            mask = (row_iota >= shift) & (row_iota < shift + (hi - lo))
            out_ref[0, rr, rb, :, :] = jnp.max(
                jnp.where(mask, window, neg), axis=0
            )
        return 0

    jax.lax.fori_loop(0, n_rois, roi_body, 0)


def _ceil_div_t(a, b: int):
    return -((-a) // b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def pallas_adaptive_max_pool(fm, rects, kh: int, kw: int,
                             interpret: bool = False):
    """fm: [B, H, W, C]; rects: [B, D, 4] prepared feature rects (float,
    integer-valued). Returns [B, D, kh, kw, C]."""
    return _forward(fm, rects, kh, kw, interpret)


def _forward(fm, rects, kh: int, kw: int, interpret: bool):
    B, H, W, C = fm.shape
    D = rects.shape[1]
    maxw = min(W, _cdiv(W, kw) + 1)
    maxh = min(H, _cdiv(H, kh) + 1)
    rects_i = rects.astype(jnp.int32)
    fmt = jnp.transpose(fm, (0, 2, 1, 3))  # [B, W, H, C]

    # Split rois over the grid to bound per-program output VMEM; the fm
    # block index is unchanged across roi-blocks so Pallas keeps it resident.
    roi_block = D
    for cand in (16, 8, 4, 2, 1):
        if D % cand == 0:
            roi_block = min(cand, D)
            break
    n_blocks = D // roi_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, roi_block, 4), lambda b, rb: (b, rb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, W, H, C), lambda b, rb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, roi_block, kh, kw, C), lambda b, rb: (b, rb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((H, kw, C), fm.dtype)],
    )
    kernel = functools.partial(
        _kernel, kh=kh, kw=kw, maxw=maxw, maxh=maxh, n_rois=roi_block
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D, kh, kw, C), fm.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rects_i, fmt)


def _fwd(fm, rects, kh, kw, interpret):
    return _forward(fm, rects, kh, kw, interpret), (fm, rects)


def _bwd(kh, kw, interpret, res, g):
    fm, rects = res

    def ref_pool(fm_):
        return jax.vmap(lambda f, r: xla_pool.adaptive_max_pool(f, r, kh, kw))(
            fm_, rects
        )

    _, vjp = jax.vjp(ref_pool, fm)
    (dfm,) = vjp(g)
    return dfm, jnp.zeros_like(rects)


pallas_adaptive_max_pool.defvjp(_fwd, _bwd)
