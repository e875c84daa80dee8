"""Pallas backward kernel for the 2x2 ceil max pool (first-max routing).

Replaces XLA's SelectAndScatter for the backbone pool backwards of the
train step (the pool itself is ``layers.py::ceil_max_pool_2x2``, the
reference's ``nn.SpatialMaxPooling(2,2,2,2):ceil()`` whose backward routes
each output cotangent to the FIRST maximum of its window,
``models/model_utilities.lua:23`` / torch SpatialMaxPooling.cu). Measured
round-2 baseline to beat: SS costs 8.3 ms of the batch-8 train step on
v5e — 6.0 ms alone on block0's [8,450,800,64], ~5.5x off the bandwidth
roofline (docs/perf_ceiling.md:86-97). Two XLA reformulations already
measured WORSE (+15 ms elementwise stride-2 routing; 14.3 ms repeat-based
even-split): anything that deinterleaves/upsamples along the tiled W axis
at the XLA level is relayout-bound.

This kernel keeps every cross-column exchange inside VMEM:

- H is an untiled (major) axis: the two window rows load as one
  ``[2*HT, W, C]`` block and split with free leading-axis reshapes.
- W is the sublane axis: the window partner of column ``w`` is ``w ^ 1``,
  obtained with two single-step sublane rotations (``pltpu.roll``) and an
  even/odd column select — native vector ops, no deinterleave.
- First-max priority (row-major window order (h0,w0),(h0,w1),(h1,w0),
  (h1,w1), matching SelectAndScatter's scan order) is a handful of
  boolean lane ops on the equality masks.
- The coarse->fine cotangent upsample ``g_up[w] = g[w//2]`` — the step
  XLA cannot do cheaply — is an EXACT 0/1 matmul on the MXU:
  ``U[w, j] = (w//2 == j)``, ``g_up = U @ g``. Each output row sums
  exactly one ``1.0 * g[j]`` product, so values pass through bit-exactly
  (f32 accumulation holds bf16 exactly).

All comparisons run in f32 (bf16 where/max on packed tiles measured 1.65x
slower in the ROI-pool kernel; upcasting is bit-exact for comparisons).

Preconditions: even W (odd-W blocks — e.g. the 125-wide block3 of the
450x1000 envelope — fall back to XLA's SS; they are the cheap ones). Any
H (ceil tail rows are masked in-kernel; out-of-range writes are dropped
by Pallas). Grid is (B, ceil(Hc / HT)); HT sized to a VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from frcnn_tpu.models.layers import ceil_max_pool_2x2

NEG = float("-inf")


def _bwd_kernel(x_ref, g_ref, dx_ref, *, H, HT, W, C):
    i = pl.program_id(1)
    Wc = (W + 1) // 2
    x = x_ref[0].astype(jnp.float32).reshape(HT, 2, W, C)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (HT, 1, 1), 0)
    r0 = i * (2 * HT) + 2 * t_iota
    # ceil tail / grid padding: rows at or past H read garbage — mask to
    # -inf so they never claim a max (their writes are dropped anyway)
    a0 = jnp.where(r0 < H, x[:, 0], NEG)
    a1 = jnp.where(r0 + 1 < H, x[:, 1], NEG)

    even = (jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1) % 2) == 0

    def swap(v):
        """v[..., w ^ 1, ...]: the in-pair column partner. pltpu.roll
        requires non-negative shifts; W-1 == -1 under wrap, and wrapped
        entries land only in lanes the parity select discards."""
        return jnp.where(even, pltpu.roll(v, W - 1, 1), pltpu.roll(v, 1, 1))

    # Partner values WITHOUT rolling the bool masks (Mosaic
    # tpu.dynamic_rotate is 32-bit-only; an i1 rotate fails verification):
    # y is pair-symmetric (y[w] == y[w^1] by construction), so
    # swap(e0)[w] = (a0[w^1] == y[w^1]) = (swap(a0)[w] == y[w]). Rolling
    # the f32 operands gives bit-identical routing with f32-only rotates.
    # swap is a fixed element permutation, so it commutes with elementwise
    # max: swap(max(a0,a1)) == max(swap(a0), swap(a1)) — the window max
    # needs NO third swap (4 sublane rolls per grid step, not 6; the rolls
    # are the kernel's dominant non-HBM cost).
    s0 = swap(a0)
    s1 = swap(a1)
    y = jnp.maximum(jnp.maximum(a0, a1), jnp.maximum(s0, s1))
    e0 = a0 == y
    e1 = a1 == y
    p0 = s0 == y
    p1 = s1 == y
    odd = ~even
    # first-max routing in SelectAndScatter's window scan order
    route0 = e0 & ~(odd & p0)
    route1 = e1 & ~(e0 | p0) & ~(odd & p1)

    # exact MXU upsample: U[w, j] = (w//2 == j)
    wi = jax.lax.broadcasted_iota(jnp.int32, (W, Wc), 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (W, Wc), 1)
    U = (wi // 2 == wj).astype(g_ref.dtype)
    outs = []
    for t in range(HT):
        g_up = jax.lax.dot_general(
            U, g_ref[0, t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [W, C]
        outs.append(jnp.where(route0[t], g_up, 0.0))
        outs.append(jnp.where(route1[t], g_up, 0.0))
    dx = jnp.stack(outs, axis=0)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pick_ht(W: int, C: int, Hc: int) -> int:
    # ~2 MB of f32 x-block per grid step; clamp to [1, Hc]
    budget = 2 * 1024 * 1024 // (2 * W * C * 4)
    return max(1, min(Hc, budget, 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pool_bwd_pallas(x, g, interpret=False):
    B, H, W, C = x.shape
    Hc = (H + 1) // 2
    assert W % 2 == 0, "pallas pool backward requires even W"
    assert g.shape == (B, Hc, (W + 1) // 2, C), g.shape
    HT = _pick_ht(W, C, Hc)
    grid = (B, -(-Hc // HT))
    kern = functools.partial(_bwd_kernel, H=H, HT=HT, W=W, C=C)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2 * HT, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, HT, W // 2, C), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * HT, W, C), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, g)


def pool_bwd_supported(shape) -> bool:
    """The kernel needs an even W; everything else falls back to XLA."""
    return shape[-2] % 2 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ceil_max_pool_2x2_firstmax(x, interpret: bool = False):
    """``ceil_max_pool_2x2`` with the Pallas backward. Forward is the
    plain XLA pool (identical values); backward routes to the first
    window max exactly like SelectAndScatter, via the kernel above."""
    return ceil_max_pool_2x2(x)


def _fwd(x, interpret):
    return ceil_max_pool_2x2(x), x


def _bwd(interpret, x, g):
    if not pool_bwd_supported(x.shape):
        # odd W: XLA SelectAndScatter (cheap at these sizes)
        _, vjp = jax.vjp(ceil_max_pool_2x2, x)
        return vjp(g.astype(x.dtype))
    return (_pool_bwd_pallas(x, g.astype(x.dtype), interpret=interpret),)


ceil_max_pool_2x2_firstmax.defvjp(_fwd, _bwd)
