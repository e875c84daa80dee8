"""Pallas TPU kernel for batched greedy NMS.

One program processes ALL images of the batch at once: box coordinates
live as four [B, N] planes in VMEM (clean lane tiling vs a [B, N, 4]
layout), and each while-loop trip picks the first still-alive box of every
image simultaneously and suppresses via an on-the-fly row IoU — no [N, N]
matrix is ever materialized. Loop trips = max picks over the batch; each
trip is ~a dozen [B, N] VPU ops with none of the XLA while-loop
per-iteration machinery.

Semantics: identical to ops/nms.py (+1-pixel-area IoU, sorted processing
order, suppression strictly > threshold, max_out cap per image). Input
boxes must already be sorted (descending score, reference tie order);
returns a keep-MASK over the sorted order — pick order is recovered by
index order.

The "first alive" pick is found without argmax: priority = alive * (N -
iota) is unique among alive entries, so (priority == rowmax) & alive is
exactly the leftmost alive one-hot; rowmax == 0 (no alive) yields an
all-false row, which also terminates that image cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x0_ref, y0_ref, x1_ref, y1_ref, valid_ref, keep_ref, *,
            iou_threshold: float, max_out: int):
    B, N = x0_ref.shape
    x0 = x0_ref[:, :]
    y0 = y0_ref[:, :]
    x1 = x1_ref[:, :]
    y1 = y1_ref[:, :]
    area = (x1 - x0 + 1.0) * (y1 - y0 + 1.0)
    # Mosaic's tpu.iota is integer-only (f32 iota fails verification on
    # real TPU even though interpret mode accepts it) — generate int32
    # and convert.
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1).astype(jnp.float32)
    pri_base = jnp.float32(N) - iota

    def cond(state):
        alive, _ = state
        return jnp.max(alive) > 0.0

    def body(state):
        alive, keep = state
        pri = alive * pri_base
        rowmax = jnp.max(pri, axis=1, keepdims=True)          # [B, 1]
        onehot = jnp.where((pri == rowmax) & (alive > 0), 1.0, 0.0)

        px0 = jnp.sum(onehot * x0, axis=1, keepdims=True)
        py0 = jnp.sum(onehot * y0, axis=1, keepdims=True)
        px1 = jnp.sum(onehot * x1, axis=1, keepdims=True)
        py1 = jnp.sum(onehot * y1, axis=1, keepdims=True)
        parea = (px1 - px0 + 1.0) * (py1 - py0 + 1.0)

        iw = jnp.maximum(jnp.minimum(x1, px1) - jnp.maximum(x0, px0) + 1.0, 0.0)
        ih = jnp.maximum(jnp.minimum(y1, py1) - jnp.maximum(y0, py0) + 1.0, 0.0)
        inter = iw * ih
        iou = inter / (area + parea - inter)

        keep = keep + onehot
        count = jnp.sum(keep, axis=1, keepdims=True)          # [B, 1]
        active = jnp.where(count < max_out, 1.0, 0.0)
        alive = alive * jnp.where(iou <= iou_threshold, 1.0, 0.0)
        alive = alive * (1.0 - onehot) * active
        return alive, keep

    alive0 = valid_ref[:, :]
    keep0 = jnp.zeros((B, N), jnp.float32)
    _, keep = jax.lax.while_loop(cond, body, (alive0, keep0))
    keep_ref[:, :] = keep


def pallas_nms_keep_mask(boxes_sorted, valid_sorted, iou_threshold: float,
                         max_out: int, interpret: bool = False):
    """boxes_sorted: [B, N, 4] in processing order; valid_sorted: [B, N].
    Returns keep mask [B, N] bool over the sorted order."""
    B, N, _ = boxes_sorted.shape
    planes = [boxes_sorted[:, :, i].astype(jnp.float32) for i in range(4)]
    valid = valid_sorted.astype(jnp.float32)
    kernel = functools.partial(
        _kernel, iou_threshold=iou_threshold, max_out=max_out
    )
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*planes, valid)
    return keep > 0.5


def pallas_nms(boxes, scores, valid, iou_threshold: float, max_out: int,
               interpret: bool = False):
    """Batched drop-in for vmap(ops.nms.nms): [B, N, 4]/[B, N] inputs,
    returns (indices [B, max_out] into the original order, -1 padded;
    keep_valid [B, max_out]). Sort + compaction run in XLA around the
    kernel."""
    from frcnn_tpu.geometry.matching import compact_mask
    from frcnn_tpu.ops.nms import _sort_desc_with_ref_ties

    perm = jax.vmap(_sort_desc_with_ref_ties)(scores, valid)
    boxes_sorted = jnp.take_along_axis(boxes, perm[:, :, None], axis=1)
    valid_sorted = jnp.take_along_axis(valid, perm, axis=1)
    keep_mask = pallas_nms_keep_mask(
        boxes_sorted, valid_sorted, iou_threshold, max_out, interpret
    )
    slots, slot_valid, _ = jax.vmap(
        lambda m: compact_mask(m, max_out)
    )(keep_mask)
    indices = jnp.where(
        slot_valid, jnp.take_along_axis(perm, jnp.maximum(slots, 0), axis=1), -1
    )
    return indices, slot_valid
