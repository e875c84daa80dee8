"""Fused TWO-conv first block: conv3x3(3->F) + PReLU + conv3x3(F->F) +
PReLU + 2x2/2 max-pool in one Pallas pass (vgg_large's block 0,
``models/vgg_large.lua:5-10`` — conv_steps=2 — built by ``ConvPoolBlock``,
``models/model_utilities.lua:17-25``).

Why: under XLA (int8 static-scale convs) this block costs 9.6 ms of the
26.5 ms vgg_large detect at batch 16 @450x800 — 36% of the whole forward
(docs/perf_ceiling.md). Two full-resolution [B,450,800,64] activations
round-trip HBM (~737 MB each at bf16) and conv0's 3-channel contraction
starves the MXU. The single-conv s2d kernel (ops/pallas_block0.py) fixes
exactly this for vgg_small; this module generalizes it to 2-conv blocks so
neither full-res activation ever exists in HBM.

Decomposition (same s2d input planes as the 1-conv kernel):

* conv0: the 64-row phase-matmul basis of ops/pallas_block0.py, but
  keeping all four phase planes y0[p] = prelu0(conv0(x))[2i+qy, 2j+qx]
  instead of max-reducing them (the pool happens after conv1 here).
* conv1 + pool: for pooled output (i, j) and pool phase p=(ry, rx), the
  3x3 tap (dy, dx) reads fine pixel (2i+ry+dy-1, 2j+rx+dx-1), i.e. phase
  plane (qy, qx) at coarse offset (ay, ax) where 2*a+q = r+d-1. Over all
  (ry, dy) only FOUR row-groups (ay, qy) occur — (-1,1),(0,0),(0,1),(1,0)
  — and the same four column-groups (ax, qx). Per output row we build one
  K-stacked tap scratch S[16*F, WS] (row-group-major x column-group) with
  lane rolls into a zero-padded y0 buffer, and consume it with TWO MXU
  matmuls [2F, 12F] x [12F, WS] — one per ry, reading the overlapping
  768-row windows [0:12F] and [4F:16F]. Stacking both rx phases in M
  makes M = 128 (the full MXU width; a per-phase formulation caps at
  M=64 = 50%), K = 768 (fully fed); each matmul carries 3 zero weight
  blocks (the column-group its rx never uses) -> 4/3 FLOP overhead at
  ~full utilization, i.e. ~75% effective — vs the <=50% ceiling of any
  direct 64-channel formulation (docs/perf_ceiling.md:60-74).
* bias + PReLU + 4-phase max = the 2x2 pool (H, W even, so no ceil edge).

zg layout (default): the per-row tap-scratch assembly above (the "roll"
layout) turned out to dominate the kernel on TPU — the f32 lane rolls
are pure VPU/relayout traffic (~3 ms/batch-16 at 450x800), and the int8
conv1 matmul only bought 0.7 ms over bf16 because the matmuls were never
the bottleneck. But the three lane shifts (0/+1/+2) are STATIC column
offsets, so the conv0 epilogue can write each phase block directly into
a group-ordered scratch ZG[(tr+2)*8F, ws]: ZG row r2 holds, per phase
pair qy at qy*4F, the stack slots [shift0 p(2qy+1) @cols 1.., shift1
p(2qy) @0.., shift1 p(2qy+1) @0.., shift2 p(2qy) @0.. (data x>=1)]. In
that order the K-stack [12F, WS] of output row r, pool phase ry is the
CONTIGUOUS sublane window ZG[8F*r + 4F*(1+ry) :][:12F] — groups
(ry..ry+2) == (row r qy=1 | row r+1 qy=0 | row r+1 qy=1 | row r+2 qy=0)
interleave exactly as GROUPS orders them. The row loop is then just two
MXU matmuls per row: zero copies, zero rolls, no S scratch.

Halo: conv1 at strip rows [s, s+tr) needs y0 rows [s-1, s+tr+1); conv0
recomputes the two halo rows per strip (conv0 is ~5% of the block's
FLOPs). Halo view rows arrive as single-row BlockSpecs with clamped index
maps; the out-of-image rows (coarse -1 and Ho) are zeroed in-kernel —
only their qy=1 / qy=0 phases are ever read and both are genuine conv1
zero padding.

Serving/inference only (no VJP): training keeps the XLA conv path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (offset a, phase q) groups of 2*a + q = r + d - 1 for r in {0,1}, d in
# {0,1,2}; identical for rows and columns. Order is ascending in r+d-1 so
# the ry=0 matmul reads groups [0:3) and ry=1 reads [1:4).
GROUPS = ((-1, 1), (0, 0), (0, 1), (1, 0))


def _group_index(r, d):
    a, q = divmod(r + d - 1, 2)  # Python floor divmod: -1 -> (-1, 1)
    return GROUPS.index((a, q))


def block0_2conv_weights(w1):
    """HWIO [3, 3, F, F] conv1 weights -> W1T [2, 2F, 12F] numpy f32.

    W1T[ry][rx*F + o, (g - ry)*4F... : row rx*F+o, col ((rgi - ry)*4 +
    cgi)*F + c holds w1[dy, dx, c, o] for the (dy, dx) tap mapping to
    row-group rgi / col-group cgi under phase (ry, rx). Groups a phase
    never uses stay zero.
    """
    w1 = np.asarray(w1, np.float32)
    kh, kw, cin, f = w1.shape
    assert (kh, kw) == (3, 3) and cin == f, "2conv kernel expects 3x3 FxF"
    out = np.zeros((2, 2 * f, 12 * f), np.float32)
    for ry in range(2):
        for rx in range(2):
            for dy in range(3):
                rgi = _group_index(ry, dy)
                for dx in range(3):
                    cgi = _group_index(rx, dx)
                    g = (rgi - ry) * 4 + cgi
                    out[ry, rx * f:(rx + 1) * f, g * f:(g + 1) * f] += (
                        w1[dy, dx].T
                    )
    return out


@functools.lru_cache(maxsize=1)
def _tap_map():
    """Static 0/1 tensor T[ry, rx, g, dy, dx] marking which conv1 tap
    lands in stack group g of phase (ry, rx)."""
    T = np.zeros((2, 2, 12, 3, 3), np.float32)
    for ry in range(2):
        for rx in range(2):
            for dy in range(3):
                for dx in range(3):
                    g = (_group_index(ry, dy) - ry) * 4 + _group_index(rx, dx)
                    T[ry, rx, g, dy, dx] = 1.0
    return T


def block0_2conv_weights_jnp(w1):
    """Traced :func:`block0_2conv_weights` for use under jit."""
    f = w1.shape[-1]
    T = jnp.asarray(_tap_map())
    wt = jnp.einsum("rxgde,deco->rxogc", T, w1)
    return wt.reshape(2, 2 * f, 12 * f)


def block0_2conv_weights_q_jnp(w1q):
    """int8 conv1 weights -> int8 [2, 2F, 12F] stack. Exact: the 0/1 tap
    map only places values, and int8 magnitudes are exactly representable
    in the f32 einsum."""
    wt = block0_2conv_weights_jnp(w1q.astype(jnp.float32))
    return jnp.round(wt).astype(jnp.int8)


def _kernel(*refs, tr: int, f: int, wo: int, nsteps: int,
            quant: bool = False, zg: bool = True, quant_out: bool = False):
    (cm, ct, cb, lm, lt, lb) = (refs[0:4], refs[4:8], refs[8:12],
                                refs[12:16], refs[16:20], refs[20:24])
    wt0_ref, b0_ref, w1t_ref, b1_ref, slopes_ref = refs[24:29]
    rest = refs[29:]
    if quant:
        # int8 conv1: per-(rx,out-channel) dequant scale column [2F, 1]
        # (= s_y * s_w[o]) and 1/s_y in SMEM for the conv0 epilogue quant
        wscale_ref, inv_sy_ref = rest[0:2]
        rest = rest[2:]
    if quant_out:
        # in-kernel output quantization at the next conv's static scale
        inv_out_ref = rest[0]
        rest = rest[1:]
    if zg:
        # Group-ordered y0 scratch (see the module docstring's "zg layout"
        # note): ZG[(tr+2)*8F, ws]; no Y/S, no rolls.
        out_ref, P, ZG = rest
    else:
        out_ref, P, Y, S = rest
    ws = P.shape[1] // (tr + 2)
    t = pl.program_id(1)

    # ---- conv0 for tr+2 coarse rows (strip + one halo row each side) ----
    for g in range(4):
        # basis rows 12..15 of each 16-group are padding; zero, not stale
        P[16 * g + 12:16 * (g + 1), :] = jnp.zeros(
            (4, (tr + 2) * ws), P.dtype
        )
    for r2 in range(tr + 2):
        sl = slice(r2 * ws, r2 * ws + wo)
        for g in range(4):
            # lum views arrive ROW-major [B, rows, 4, Wo] (not the packed
            # phase-major [B, 4, rows, Wo]): Mosaic requires the last two
            # block dims be 8-divisible or full, which a 1-row halo block
            # (or tr=9 strips) can't satisfy with rows on the sublane axis
            if r2 == 0:
                crow, lslab = ct[g][0, 0], lt[g][0, 0]
            elif r2 == tr + 1:
                crow, lslab = cb[g][0, 0], lb[g][0, 0]
            else:
                crow, lslab = cm[g][0, r2 - 1], lm[g][0, r2 - 1]
            P[16 * g:16 * g + 8, sl] = crow
            # one [4, Wo] slab store at the 8-aligned offset 16g+8 — four
            # 1-sublane stores here wasted 7/8 of VPU store bandwidth and
            # dominated conv0's non-matmul cost (docs/perf_ceiling.md,
            # imagenet-envelope analysis)
            P[16 * g + 8:16 * g + 12, sl] = lslab
    # conv0 matmul + epilogue in 4-row chunks: one [4f, (tr+2)*ws] f32
    # result (~6 MB at tr=9) as a live vector value blew the Mosaic stack
    # budget (18.1M > 16M scoped vmem); 4-row chunks keep N long enough
    # for the MXU while bounding live temporaries to ~2 MB.
    # Y (the y0 buffer) holds data at lane offset 1 with zero pad columns
    # 0 / wo+1, in compute dtype (an f32 Y at tr=9 pushed the kernel's
    # scoped vmem to 18.1M > 16M).
    s0 = slopes_ref[0, 0]
    CH = 4
    for c0 in range(0, tr + 2, CH):
        c1 = min(c0 + CH, tr + 2)
        y = jax.lax.dot_general(
            wt0_ref[:, :], P[:, c0 * ws:c1 * ws], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4f, (c1-c0)*ws]
        y = y + b0_ref[:, :]
        y = jnp.where(y >= 0.0, y, s0 * y)
        if quant:
            # symmetric per-tensor activation quant (models/quant.py
            # scheme): y0 enters conv1 as int8, scale s_y static
            y = jnp.clip(jnp.round(y * inv_sy_ref[0, 0]), -127.0, 127.0)
        for r2 in range(c0, c1):
            o = (r2 - c0) * ws
            if not zg:
                for p in range(4):
                    Y[r2, p * f:(p + 1) * f, 1:1 + wo] = (
                        y[p * f:(p + 1) * f, o:o + wo].astype(Y.dtype)
                    )
                Y[r2, :, 0:1] = jnp.zeros((4 * f, 1), Y.dtype)
                Y[r2, :, 1 + wo:2 + wo] = jnp.zeros((4 * f, 1), Y.dtype)
                continue
            # zg layout: the three lane shifts of the roll layout are
            # STATIC column offsets, so write each phase straight into its
            # group slots — the row loop then needs no copies or rolls at
            # all. Within ZG row r2 (8F sublanes at r2*8F), phase-pair qy
            # occupies [qy*4F, (qy+1)*4F) in the original stack order:
            #   +0: shift-0 slot, phase 2qy+1, data at cols [1, 1+wo)
            #   +F: shift+1 slot, phase 2qy,   data at cols [0, wo)
            #  +2F: shift+1 slot, phase 2qy+1, data at cols [0, wo)
            #  +3F: shift+2 slot, phase 2qy,   data x>=1 at cols [0, wo-1)
            # Out-of-window columns (>= wo per slot) stay garbage: the
            # matmul's columns >= wo are discarded by out[:, :wo], and a
            # matmul never mixes lanes, so garbage cannot leak left.
            base = r2 * 8 * f
            for p in range(4):
                yp = y[p * f:(p + 1) * f, o:o + wo]
                qy = p // 2
                if p % 2:  # odd phase: shift-0 slot + shift+1 odd slot
                    d0 = base + qy * 4 * f
                    ZG[d0:d0 + f, 1:1 + wo] = yp.astype(ZG.dtype)
                    ZG[d0:d0 + f, 0:1] = jnp.zeros((f, 1), ZG.dtype)
                    d2 = d0 + 2 * f
                    ZG[d2:d2 + f, 0:wo] = yp.astype(ZG.dtype)
                else:      # even phase: shift+1 even slot + shift+2 slot
                    d1 = base + qy * 4 * f + f
                    ZG[d1:d1 + f, 0:wo] = yp.astype(ZG.dtype)
                    d3 = d1 + 2 * f
                    if wo > 1:
                        ZG[d3:d3 + f, 0:wo - 1] = y[
                            p * f:(p + 1) * f, o + 1:o + wo
                        ].astype(ZG.dtype)
                    ZG[d3:d3 + f, wo - 1:wo] = jnp.zeros((f, 1), ZG.dtype)

    # out-of-image halo rows are conv1 zero padding (fine rows -1 and H)
    @pl.when(t == 0)
    def _():
        if zg:
            ZG[0:8 * f, :] = jnp.zeros((8 * f, ZG.shape[1]), ZG.dtype)
        else:
            Y[0] = jnp.zeros_like(Y[0])

    @pl.when(t == nsteps - 1)
    def _():
        if zg:
            ZG[(tr + 1) * 8 * f:(tr + 2) * 8 * f, :] = jnp.zeros(
                (8 * f, ZG.shape[1]), ZG.dtype
            )
        else:
            Y[tr + 1] = jnp.zeros_like(Y[tr + 1])

    # ---- conv1 + PReLU + pool, one output row at a time ----
    s1 = slopes_ref[0, 1]
    for r in range(tr):
        if not zg:
            WS = Y.shape[2]
            for rgi, (ay, qy) in enumerate(GROUPS):
                row = r + 1 + ay
                base = rgi * 4 * f
                # col-group 0: (ax=-1, qx=1) -> phase 2qy+1, lane shift 0
                S[base:base + f, :] = Y[
                    row, (2 * qy + 1) * f:(2 * qy + 2) * f, :
                ]
                # Mosaic's lane rotate is 32-bit-only ("Rotate with
                # non-32-bit data" on bf16): upcast, roll f32, cast back.
                # col-groups 1,2: (ax=0, qx=0/1) -> adjacent phases, +1
                S[base + f:base + 3 * f, :] = pltpu.roll(
                    Y[row, 2 * qy * f:(2 * qy + 2) * f, :].astype(
                        jnp.float32
                    ),
                    WS - 1, 1,
                ).astype(S.dtype)
                # col-group 3: (ax=1, qx=0) -> phase 2qy, shift +2
                S[base + 3 * f:base + 4 * f, :] = pltpu.roll(
                    Y[row, 2 * qy * f:(2 * qy + 1) * f, :].astype(
                        jnp.float32
                    ),
                    WS - 2, 1,
                ).astype(S.dtype)
        m = None
        for ry in range(2):
            if zg:
                # the K-stack for (r, ry) is a CONTIGUOUS 12F window of
                # ZG: groups [ry, ry+3) == ZG rows starting at row r's
                # qy=1 block (ry=0) or row r+1's qy=0 block (ry=1)
                off = 8 * f * r + 4 * f * (1 + ry)
                rhs = ZG[off:off + 12 * f, :]
            else:
                rhs = S[ry * 4 * f:ry * 4 * f + 12 * f, :]
            z = jax.lax.dot_general(
                w1t_ref[ry], rhs,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )  # [2f, WS]: rows [0:f] = phase (ry,0), [f:2f] = (ry,1)
            if quant:
                z = z.astype(jnp.float32) * wscale_ref[:, :] + b1_ref[:, :]
            else:
                z = z + b1_ref[:, :]
            z = jnp.where(z >= 0.0, z, s1 * z)
            zm = jnp.maximum(z[:f], z[f:])
            m = zm if m is None else jnp.maximum(m, zm)
        if quant_out:
            m = jnp.clip(jnp.round(m * inv_out_ref[0, 0]), -127.0, 127.0)
        out_ref[0, r] = m[:, :wo].astype(out_ref.dtype)


def _pick_tr(ho: int, cap: int = 10) -> int:
    for tr in range(min(cap, ho), 0, -1):
        if ho % tr == 0:
            return tr
    return 1


def fused_block0_2conv(cviews, lviews, wt0, bias0, slope0, w1t, bias1,
                       slope1, out_dtype=None, tr: int = None,
                       interpret: bool = False,
                       compute_dtype=jnp.bfloat16,
                       w1_scales=None, act_scale=None,
                       layout: str = "zg", out_scale=None):
    """Run the fused 2-conv block0 kernel.

    Args:
      cviews / lviews: the four [B, Ho, 8, Wo] chroma and [B, 4, Ho, Wo]
        luminance views (``ops.pallas_block0.views_from_s2d``).
      wt0, bias0: conv0 on the 64-row patch basis
        (``ops.pallas_block0.block0_weights``), [4F, 64] / [4F, 1].
      slope0 / slope1: scalar PReLU slopes of the two convs.
      w1t: [2, 2F, 12F] from :func:`block0_2conv_weights` — int8 when
        ``w1_scales``/``act_scale`` are given (int8 conv1 mode).
      bias1: conv1 bias [F].
      tr: strip height (must divide Ho; default: largest divisor <= 10).
      w1_scales / act_scale: per-out-channel conv1 weight scales [F] and
        the static y0 activation scale (models/quant.py int8s scheme).
        When both are given, conv0 runs bf16 as usual but its output is
        quantized to int8 in-register and conv1 runs on the int8 MXU
        (2x the bf16 rate on v5e), dequantized in the epilogue.
      layout: "zg" (default) writes conv0 output straight into the
        group-ordered conv1 stack — the three lane shifts become static
        column offsets at store time, each conv1 matmul reads a
        contiguous 12F-sublane window, and the row loop does ZERO
        copies/rolls (TPU-measured round 3: the roll-layout row loop's
        f32 lane rolls, not the matmuls, dominated the kernel — int8
        conv1 only bought 0.7 ms over bf16). "roll" keeps the original
        Y+S formulation for comparison.
    Returns [B, Ho, F, Wo] (channels-middle) in ``out_dtype``
    (default ``compute_dtype``).
    """
    assert layout in ("zg", "roll"), layout
    B, Ho, _, Wo = cviews[0].shape
    f4 = wt0.shape[0]
    f = f4 // 4
    quant = w1_scales is not None and act_scale is not None
    quant_out = out_scale is not None
    if quant_out:
        out_dtype = jnp.int8
    elif out_dtype is None:
        out_dtype = compute_dtype
    if tr is None:
        # roll layout: bf16 conv1 doubles the Y/S scratch footprint vs
        # int8; at tr=9/f=64/ws=512 the non-quant mode overflows Mosaic's
        # 16M scoped-vmem budget by 1.1M (TPU-measured, round 3). The zg
        # layout has no S scratch and no f32 roll temporaries, so both
        # modes keep the tall strip.
        cap = 10 if (quant or layout == "zg") else 5
        tr = _pick_tr(Ho, cap=cap)
    assert Ho % tr == 0, f"strip height {tr} must divide Ho={Ho}"
    nsteps = Ho // tr
    ws = -(-(Wo + 2) // 128) * 128
    # row-major lum views [B, rows, 4, Wo] (see the kernel's layout note);
    # one small XLA relayout per frame, AFTER normalization (whose phase
    # ops want the packed phase-major lum4)
    lviews_rm = [v.astype(compute_dtype).transpose(0, 2, 1, 3)
                 for v in lviews]
    kern = functools.partial(_kernel, tr=tr, f=f, wo=Wo, nsteps=nsteps,
                             quant=quant, zg=(layout == "zg"),
                             quant_out=quant_out)

    cmain = pl.BlockSpec((1, tr, 8, Wo), lambda b, t: (b, t, 0, 0))
    lmain = pl.BlockSpec((1, tr, 4, Wo), lambda b, t: (b, t, 0, 0))
    # halo rows: single-row blocks -> block index == row index, so the
    # clamped element-level maps are expressible. The clamped duplicates
    # (t=0 top, t=last bottom) feed rows the kernel zero-masks.
    ctop = pl.BlockSpec(
        (1, 1, 8, Wo), lambda b, t: (b, jnp.maximum(t * tr - 1, 0), 0, 0)
    )
    cbot = pl.BlockSpec(
        (1, 1, 8, Wo),
        lambda b, t: (b, jnp.minimum((t + 1) * tr, Ho - 1), 0, 0),
    )
    ltop = pl.BlockSpec(
        (1, 1, 4, Wo), lambda b, t: (b, jnp.maximum(t * tr - 1, 0), 0, 0)
    )
    lbot = pl.BlockSpec(
        (1, 1, 4, Wo),
        lambda b, t: (b, jnp.minimum((t + 1) * tr, Ho - 1), 0, 0),
    )
    const = lambda b, t: (0, 0)
    yq_dtype = jnp.int8 if quant else compute_dtype
    extra_specs = []
    extra_args = []
    if quant:
        # dequant column s_y * s_w[o], tiled over both rx phases like b1
        wscale = (jnp.tile(
            jnp.asarray(w1_scales, jnp.float32).reshape(-1), 2
        )[:, None] * jnp.asarray(act_scale, jnp.float32).reshape(()))
        extra_specs = [
            pl.BlockSpec((2 * f, 1), const),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        extra_args = [
            wscale,
            (1.0 / jnp.asarray(act_scale, jnp.float32)).reshape(1, 1),
        ]
    if quant_out:
        extra_specs = extra_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        extra_args = extra_args + [
            (1.0 / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)
        ]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Ho, f, Wo), out_dtype),
        grid=(B, nsteps),
        in_specs=(
            [cmain] * 4 + [ctop] * 4 + [cbot] * 4
            + [lmain] * 4 + [ltop] * 4 + [lbot] * 4
            + [
                pl.BlockSpec((f4, 64), const),
                pl.BlockSpec((f4, 1), const),
                pl.BlockSpec((2, 2 * f, 12 * f), lambda b, t: (0, 0, 0)),
                pl.BlockSpec((2 * f, 1), const),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
            + extra_specs
        ),
        out_specs=pl.BlockSpec((1, tr, f, Wo), lambda b, t: (b, t, 0, 0)),
        scratch_shapes=(
            [
                pltpu.VMEM((64, (tr + 2) * ws), compute_dtype),  # P
                pltpu.VMEM(((tr + 2) * 8 * f, ws), yq_dtype),    # ZG
            ]
            if layout == "zg"
            else [
                pltpu.VMEM((64, (tr + 2) * ws), compute_dtype),  # P
                pltpu.VMEM((tr + 2, 4 * f, ws), yq_dtype),       # Y
                pltpu.VMEM((16 * f, ws), yq_dtype),              # S
            ]
        ),
        interpret=interpret,
    )(
        *[v.astype(compute_dtype) for v in cviews],
        *[v.astype(compute_dtype) for v in cviews],
        *[v.astype(compute_dtype) for v in cviews],
        *lviews_rm,
        *lviews_rm,
        *lviews_rm,
        jnp.asarray(wt0, compute_dtype),
        jnp.asarray(bias0, jnp.float32),
        jnp.asarray(w1t, jnp.int8 if quant else compute_dtype),
        # [2F, 1]: both rx phases of a matmul share the conv1 bias
        jnp.tile(jnp.asarray(bias1, jnp.float32).reshape(-1), 2)[:, None],
        jnp.stack(
            [jnp.asarray(slope0, jnp.float32).reshape(()),
             jnp.asarray(slope1, jnp.float32).reshape(())]
        ).reshape(1, 2),
        *extra_args,
    )
    return out


def block0_2conv_nhwc(x, w0, b0, slope0, w1, b1, slope1,
                      interpret: bool = False):
    """Drop-in pool(prelu(conv1(prelu(conv0(x))))) for NHWC float input;
    returns NHWC [B, H/2, W/2, F]. Parity/reference entry."""
    from frcnn_tpu.ops.pallas_block0 import (
        block0_weights,
        pack_s2d,
        views_from_s2d,
    )

    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights(w1)
    out = fused_block0_2conv(cviews, lviews, wt0, bias0, slope0, w1t, b1,
                             slope1, interpret=interpret)
    return out.transpose(0, 1, 3, 2)


def block0_2conv_nhwc_q(x, w0, b0, slope0, w1q, w1_scales, act_scale, b1,
                        slope1, interpret: bool = False):
    """NHWC entry for the int8-conv1 mode (models/quant.py int8s scheme):
    conv0 bf16, y0 quantized at ``act_scale``, conv1 on int8 weights
    ``w1q`` with per-out-channel ``w1_scales``. Parity/reference entry."""
    from frcnn_tpu.ops.pallas_block0 import (
        block0_weights,
        pack_s2d,
        views_from_s2d,
    )

    lum4, chroma = pack_s2d(x)
    cviews, lviews = views_from_s2d(lum4, chroma)
    wt0, bias0 = block0_weights(w0, b0)
    w1t = block0_2conv_weights_q_jnp(jnp.asarray(w1q))
    out = fused_block0_2conv(cviews, lviews, wt0, bias0, slope0, w1t, b1,
                             slope1, interpret=interpret,
                             w1_scales=w1_scales, act_scale=act_scale)
    return out.transpose(0, 1, 3, 2)
