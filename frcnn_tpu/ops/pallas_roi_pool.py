"""Pallas TPU kernel for batched adaptive-max ROI pooling.

The XLA formulation (ops/roi_pool.py) scans masked windows of width W per
(roi, bin); this kernel keeps each image's feature map resident in VMEM and
slices only a static ``MAXW``-wide window per column bin (bin width is
bounded by ceil(W/kw)+1), cutting VPU work ~W/MAXW-fold and all HBM
re-reads. Grid is one program per image; ROI rects arrive via scalar
prefetch in SMEM.

Semantics identical to ``adaptive_max_pool`` (Torch adaptive bin edges,
overlapping bins for small regions). Differentiable via custom VJP with a
Pallas BACKWARD kernel: recompute the two masked max stages in VMEM and
scatter the cotangent back through both, dividing evenly among tied
maxima per stage — the same tie rule as jax's ``max`` VJP, so the
gradient matches the XLA formulation's autodiff bit-for-tie-structure
(the reference scatters with saved pool indices,
``objective.lua:182-185``). This makes the kernel usable in TRAINING:
the previous VJP fell back to re-running the XLA forward inside the
backward, erasing the kernel's gain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(rects_ref, valid_ref, fm_ref, out_ref, rowmax_ref, *, kh: int,
            kw: int, maxh: int, maxw8: int, wal: int, n_rois: int):
    """fm_ref: [1, H, W, C] — the feature map in its NATIVE layout (no
    boundary transpose; the earlier [B, W, H, C] variant forced a full
    70 MB relayout of the conv output entering the kernel). Row bins slice
    the untiled leading H axis (arbitrary dynamic offsets are fine there);
    column bins then slice the [kh, W, C] f32 scratch along W — a TILED
    sublane axis, so offsets are aligned down to a multiple of 8 and the
    existing mask-shift mechanism absorbs the misalignment. ``maxw8`` is
    sized so W - maxw8 is a multiple of 8 (``wal`` = (W - maxw8)//8),
    which makes the clamped aligned offset always in-bounds AND the mask
    window always wide enough (shift + bin width <= maxw8).

    ALL arithmetic in f32 even for bf16 feature maps: measured on v5e the
    packed-bf16 where/max path is 1.65x slower than upcasting each VMEM
    window slice (2.45 -> 1.66 ms at B=16, D=128). Exact: bf16->f32 is
    lossless, max commutes with the upcast, and the final downcast
    restores the original bf16 values bit-for-bit.

    rects_ref: this block's [1, n_rois, 4] int32 rects in SMEM.
    valid_ref: [1, n_rois] int32 in SMEM — rois with 0 are skipped
    entirely (their output rows zero-filled). The masked losses already
    send an exactly-zero cotangent to padded roi slots, so skipping them
    changes nothing downstream while the per-roi cost here is
    size-INDEPENDENT (fixed maxh/maxw8 windows) and padding typically
    outnumbers real rois several-fold in training."""
    H = fm_ref.shape[1]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (maxh, 1, 1), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, maxw8, 1), 1)
    neg = jnp.asarray(-jnp.inf, jnp.float32)

    def roi_body(rr, _):
        @pl.when(valid_ref[0, rr, 0] > 0)
        def _pool_roi():
            x0 = rects_ref[0, rr, 0]
            y0 = rects_ref[0, rr, 1]
            x1 = rects_ref[0, rr, 2]
            y1 = rects_ref[0, rr, 3]
            w = x1 - x0
            h = y1 - y0

            # row bins -> rowmax[rb, :, :] = [W, C]
            for rb in range(kh):
                lo = y0 + (rb * h) // kh
                hi = y0 + _ceil_div_t(((rb + 1) * h), kh)
                lo_c = jnp.clip(lo, 0, H - maxh)
                shift = lo - lo_c
                window = fm_ref[0, pl.ds(lo_c, maxh), :, :].astype(jnp.float32)
                mask = (row_iota >= shift) & (row_iota < shift + (hi - lo))
                rowmax_ref[rb, :, :] = jnp.max(
                    jnp.where(mask, window, neg), axis=0
                )

            # column bins over rowmax scratch [kh, W, C] (f32); aligned slice
            for cb in range(kw):
                lo = x0 + (cb * w) // kw
                hi = x0 + _ceil_div_t(((cb + 1) * w), kw)
                lo_a = 8 * jnp.clip(lo // 8, 0, wal)
                shift = lo - lo_a
                window = rowmax_ref[:, pl.ds(lo_a, maxw8), :]  # [kh, maxw8, C]
                mask = (col_iota >= shift) & (col_iota < shift + (hi - lo))
                out_ref[0, rr, :, cb, :] = jnp.max(
                    jnp.where(mask, window, neg), axis=1
                ).astype(out_ref.dtype)

        @pl.when(valid_ref[0, rr, 0] == 0)
        def _zero_roi():
            out_ref[0, rr, :, :, :] = jnp.zeros(
                (kh, kw, out_ref.shape[-1]), out_ref.dtype
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
    return _forward(fm, rects, None, kh, kw, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_adaptive_max_pool_valid(fm, rects, valid, kh: int, kw: int,
                                   interpret: bool = False):
    """Like :func:`pallas_adaptive_max_pool` plus ``valid``: [B, D] bool or
    int roi-validity mask. Invalid rois are skipped in BOTH passes (their
    pooled rows are zero; their fm gradient contribution is zero). Only
    correct when the caller's losses mask those rois out — then their
    cotangent is exactly zero and skipping is a pure speedup (the
    training objective pads R to a static max; see objective.py)."""
    return _forward(fm, rects, valid, kh, kw, interpret)


def _forward(fm, rects, valid, kh: int, kw: int, interpret: bool):
    B, H, W, C = fm.shape
    D = rects.shape[1]
    # [B, D, 1]: Mosaic checks the LAST TWO block dims even in SMEM
    # ((roi_block, 1) passes; a 2-D (1, roi_block) block is rejected)
    if valid is None:
        valid_i = jnp.ones((B, D, 1), jnp.int32)
    else:
        valid_i = valid.astype(jnp.int32).reshape(B, D, 1)
    maxw = min(W, _cdiv(W, kw) + 1)
    maxh = min(H, _cdiv(H, kh) + 1)
    # column windows live on a tiled sublane axis: size them so that
    # W - maxw8 is a multiple of 8 — the aligned-down offset then clamps
    # to exactly W - maxw8 and the mask window still covers every bin
    # (worst shift 7 normally; hi - (W - maxw8) <= maxw8 when clamped)
    m0 = min(W, maxw + 7)
    maxw8 = W - 8 * ((W - m0) // 8)
    wal = (W - maxw8) // 8
    rects_i = rects.astype(jnp.int32)

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
            pl.BlockSpec((1, roi_block, 1), lambda b, rb: (b, rb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W, C), lambda b, rb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, roi_block, kh, kw, C), lambda b, rb: (b, rb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((kh, W, C), jnp.float32)],
    )
    kernel = functools.partial(
        _kernel, kh=kh, kw=kw, maxh=maxh, maxw8=maxw8, wal=wal,
        n_rois=roi_block
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D, kh, kw, C), fm.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rects_i, valid_i, fm)


def _bwd_kernel(rects_ref, valid_ref, fmt_ref, g_ref, dfmt_ref, colmax_ref,
                dcol_ref, *, kh: int, kw: int, maxw: int, maxh: int,
                n_rois: int):
    """Gradient of the pool: recompute the two masked max stages and
    scatter ``g`` back, dividing evenly among tied maxima per stage —
    exactly the VJP of ``jnp.max(jnp.where(mask, window, -inf))`` that the
    XLA formulation's autodiff produces (the reference scatters with
    saved pool indices, ``objective.lua:182-185``). Accumulates into the
    same [1, W, H, C] output block across all roi-blocks of one image."""
    W = fmt_ref.shape[1]
    H = fmt_ref.shape[2]
    C = fmt_ref.shape[3]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dfmt_ref[0, :, :, :] = jnp.zeros((W, H, C), dfmt_ref.dtype)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (maxw, 1, 1), 0)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (maxh, 1, 1), 0)
    # ALL kernel arithmetic in f32 regardless of the fm dtype: Mosaic
    # rejects bf16 cmpf in this kernel's layouts ('arith.cmpf ...
    # vector<8x128x2xbf16>'), and bf16 divf/accumulate are similarly
    # off its well-exercised path; a bf16->f32 upcast preserves equality
    # structure exactly, so tie recovery is unchanged. Scratches and the
    # dfmt output block are f32 (also exact accumulation across bins and
    # roi-blocks); the caller casts back to the fm dtype once, outside.
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    one = jnp.asarray(1, jnp.int32)

    def roi_body(rr, _):
        @pl.when(valid_ref[0, rr, 0] > 0)
        def _bwd_roi():
            x0 = rects_ref[0, rr, 0]
            y0 = rects_ref[0, rr, 1]
            x1 = rects_ref[0, rr, 2]
            y1 = rects_ref[0, rr, 3]
            w = x1 - x0
            h = y1 - y0

            # stage 1 recompute: colmax[:, cb, :] = [H, C]; zero dcol
            for cb in range(kw):
                lo = x0 + (cb * w) // kw
                hi = x0 + _ceil_div_t(((cb + 1) * w), kw)
                lo_c = jnp.clip(lo, 0, W - maxw)
                shift = lo - lo_c
                window = fmt_ref[0, pl.ds(lo_c, maxw), :, :].astype(jnp.float32)
                mask = (col_iota >= shift) & (col_iota < shift + (hi - lo))
                colmax_ref[:, cb, :] = jnp.max(
                    jnp.where(mask, window, neg), axis=0
                )
            dcol_ref[:, :, :] = jnp.zeros((H, kw, C), dcol_ref.dtype)

            # row stage backward: dcol[hrow, cb, :] += g[rb, cb, :] * eq/cnt
            for rb in range(kh):
                lo = y0 + (rb * h) // kh
                hi = y0 + _ceil_div_t(((rb + 1) * h), kh)
                lo_c = jnp.clip(lo, 0, H - maxh)
                shift = lo - lo_c
                window = colmax_ref[pl.ds(lo_c, maxh), :, :]       # [maxh, kw, C] f32
                mask = (row_iota >= shift) & (row_iota < shift + (hi - lo))
                masked = jnp.where(mask, window, neg)
                rowmax = jnp.max(masked, axis=0)
                # eq from the masked VALUES, not `mask & (window == rowmax)`:
                # and-ing a (maxh,1,1)-broadcast i1 with a full-shape i1 hits a
                # Mosaic relayout bug ("replicated in destination but not in
                # source" on vector<...xi1>); out-of-window lanes are -inf and
                # can never equal rowmax (bins are nonempty), so this is the
                # same predicate in one clean layout
                eq = masked == rowmax[None]                        # [maxh, kw, C]
                cnt = jnp.maximum(jnp.sum(eq.astype(jnp.int32), axis=0), one)
                contrib = (
                    eq.astype(jnp.float32)
                    * (g_ref[0, rr, rb].astype(jnp.float32)
                       / cnt.astype(jnp.float32))[None]
                )
                dcol_ref[pl.ds(lo_c, maxh), :, :] = (
                    dcol_ref[pl.ds(lo_c, maxh), :, :] + contrib
                )

            # column stage backward: dfmt[col, hrow, :] += dcol * eq/cnt
            for cb in range(kw):
                lo = x0 + (cb * w) // kw
                hi = x0 + _ceil_div_t(((cb + 1) * w), kw)
                lo_c = jnp.clip(lo, 0, W - maxw)
                shift = lo - lo_c
                window = fmt_ref[0, pl.ds(lo_c, maxw), :, :].astype(jnp.float32)
                mask = (col_iota >= shift) & (col_iota < shift + (hi - lo))
                colm = colmax_ref[:, cb, :]                        # [H, C] f32
                # same Mosaic i1-relayout workaround as the row stage above
                eq = jnp.where(mask, window, neg) == colm[None]    # [maxw, H, C]
                cnt = jnp.maximum(jnp.sum(eq.astype(jnp.int32), axis=0), one)
                contrib = (
                    eq.astype(jnp.float32)
                    * (dcol_ref[:, cb, :] / cnt.astype(jnp.float32))[None]
                )
                dfmt_ref[0, pl.ds(lo_c, maxw), :, :] = (
                    dfmt_ref[0, pl.ds(lo_c, maxw), :, :] + contrib
                )
        return 0

    jax.lax.fori_loop(0, n_rois, roi_body, 0)


def _backward(fm, rects, valid, g, kh: int, kw: int, interpret: bool):
    B, H, W, C = fm.shape
    D = rects.shape[1]
    # [B, D, 1]: Mosaic checks the LAST TWO block dims even in SMEM
    # ((roi_block, 1) passes; a 2-D (1, roi_block) block is rejected)
    if valid is None:
        valid_i = jnp.ones((B, D, 1), jnp.int32)
    else:
        valid_i = valid.astype(jnp.int32).reshape(B, D, 1)
    maxw = min(W, _cdiv(W, kw) + 1)
    maxh = min(H, _cdiv(H, kh) + 1)
    rects_i = rects.astype(jnp.int32)
    fmt = jnp.transpose(fm, (0, 2, 1, 3))  # [B, W, H, C]

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
            pl.BlockSpec((1, roi_block, 1), lambda b, rb: (b, rb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, W, H, C), lambda b, rb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, roi_block, kh, kw, C),
                         lambda b, rb: (b, rb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # every roi-block of an image revisits the SAME output block, so
        # the accumulation stays VMEM-resident across the inner grid axis
        out_specs=pl.BlockSpec((1, W, H, C), lambda b, rb: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, kw, C), jnp.float32),
            pltpu.VMEM((H, kw, C), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, kh=kh, kw=kw, maxw=maxw, maxh=maxh, n_rois=roi_block
    )
    dfmt = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W, H, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rects_i, valid_i, fmt, g.astype(fm.dtype))
    return jnp.transpose(dfmt, (0, 2, 1, 3)).astype(fm.dtype)


def _fwd(fm, rects, kh, kw, interpret):
    return _forward(fm, rects, None, kh, kw, interpret), (fm, rects)


def _bwd(kh, kw, interpret, res, g):
    fm, rects = res
    return (_backward(fm, rects, None, g, kh, kw, interpret),
            jnp.zeros_like(rects))


pallas_adaptive_max_pool.defvjp(_fwd, _bwd)


def _fwd_valid(fm, rects, valid, kh, kw, interpret):
    return (_forward(fm, rects, valid, kh, kw, interpret),
            (fm, rects, valid))


def _bwd_valid(kh, kw, interpret, res, g):
    fm, rects, valid = res
    return (_backward(fm, rects, valid, g, kh, kw, interpret),
            jnp.zeros_like(rects), jnp.zeros_like(valid))


pallas_adaptive_max_pool_valid.defvjp(_fwd_valid, _bwd_valid)
