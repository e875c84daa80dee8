"""Fixed-shape greedy non-maximum suppression.

Replaces ``nms.lua:23-102`` (host tensor loops) with a jit-compiled,
fixed-shape device implementation:

* IoU uses the legacy **+1 pixel** area convention (``nms.lua:35, 85-86``) —
  distinct from the matching IoU.
* Processing order is descending score; the reference sorts ascending and
  pops from the back (``nms.lua:45, 58-60``), so score ties resolve toward
  the **larger original index** — reproduced here with a composite sort key.
* Boxes with IoU strictly greater than the threshold are suppressed; equal
  IoU survives (``I[IoU:le(overlap)]``, ``nms.lua:96``).

The output is a fixed-size index list plus a validity mask (the reference
returns a dynamic pick list).

Algorithm: sort once, precompute the pairwise IoU matrix, then a
``fori_loop`` over output slots — each trip picks the first still-alive box
(the highest-scoring survivor, since boxes are sorted) and suppresses its
neighbors with one vector op. O(K·N) work on top of one O(N²) IoU matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from frcnn_tpu.geometry import boxes as B


def _sort_desc_with_ref_ties(scores, valid):
    """Order = descending score; ties -> larger original index first;
    invalid entries last. Returns permutation indices."""
    n = scores.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    s = jnp.where(valid, scores, -jnp.inf)
    # lexsort: last key is primary
    return jnp.lexsort((-idx, -s)).astype(jnp.int32)


NMS_BLOCK = 8


def nms_indices_sorted(boxes_sorted, valid_sorted, iou_threshold: float,
                       max_out: int, block: int = NMS_BLOCK):
    """Greedy NMS over boxes already in processing order — EXACT greedy
    semantics, processed ``block`` candidates per loop trip.

    Each trip takes the first ``block`` still-alive boxes (the highest
    scoring survivors, since boxes are sorted), resolves the suppression
    chain within the block by an unrolled scan (only *kept* members
    suppress later members — identical to one-at-a-time greedy), appends
    the kept ones, and masks everything the kept set suppresses. Loop
    trips ~ picks/block instead of picks, cutting serial loop overhead.

    Returns (keep_slots [max_out] int32 — positions in the *sorted* order,
    -1 padded; keep_valid [max_out] bool).
    """
    n = boxes_sorted.shape[0]
    block = min(block, n)
    iou = B.iou_plus_one(boxes_sorted[:, None, :], boxes_sorted[None, :, :])
    neg_pos = -jnp.arange(n, dtype=jnp.float32)  # priority: earlier = higher

    def cond(state):
        count, alive, _, _ = state
        return (count < max_out) & jnp.any(alive)

    def body(state):
        count, alive, keep, keep_valid = state
        # first `block` alive positions, in order
        pri = jnp.where(alive, neg_pos, -jnp.inf)
        _, idx = jax.lax.top_k(pri, block)          # ascending positions
        present = jnp.take(alive, idx)              # padding -> False
        sub = iou[idx][:, idx]                      # [block, block]

        kept_list = [present[0]]
        for j in range(1, block):
            suppressed = jnp.zeros((), bool)
            for m in range(j):
                suppressed = suppressed | (
                    kept_list[m] & (sub[m, j] > iou_threshold)
                )
            kept_list.append(present[j] & ~suppressed)
        kept = jnp.stack(kept_list)                 # [block]

        # write kept picks in order
        rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
        dest = jnp.where(kept & (count + rank < max_out), count + rank, max_out)
        keep = keep.at[dest].set(idx.astype(jnp.int32), mode="drop")
        keep_valid = keep_valid.at[dest].set(True, mode="drop")
        count = jnp.minimum(count + jnp.sum(kept.astype(jnp.int32)), max_out)

        # kept members suppress (incl. themselves via the IoU=1 diagonal);
        # non-kept present members were suppressed by a kept one above
        rows = iou[idx]                              # [block, n]
        suppress = jnp.any(kept[:, None] & (rows > iou_threshold), axis=0)
        alive = alive & ~suppress
        alive = alive & ~jnp.zeros_like(alive).at[idx].set(present)
        return count, alive, keep, keep_valid

    state0 = (
        jnp.asarray(0, jnp.int32),
        valid_sorted,
        jnp.full((max_out + 1,), -1, jnp.int32),
        jnp.zeros((max_out + 1,), bool),
    )
    _, _, keep, keep_valid = jax.lax.while_loop(cond, body, state0)
    return keep[:max_out], keep_valid[:max_out]


def resolve_nms_scores(boxes, scores=None):
    """The reference's score-argument semantics (``nms.lua:37-43``): an
    ``int`` selects a box column (0-based here, vs Lua's 1-based), the
    string ``'area'`` orders by +1-pixel box area, ``None`` orders by
    ``max_y`` (the reference's default branch), and anything else is used
    as the score tensor directly. Dead code at the reference's own call
    sites (``Detector.lua:82,133`` always pass score tensors) — ported for
    API completeness."""
    if scores is None:
        return boxes[..., 3]
    if isinstance(scores, str):
        if scores != "area":
            raise ValueError(f"unknown nms scores string: {scores!r}")
        return ((boxes[..., 2] - boxes[..., 0] + 1.0)
                * (boxes[..., 3] - boxes[..., 1] + 1.0))
    if isinstance(scores, int):
        return boxes[..., scores]
    return scores


def nms(boxes, scores, valid, iou_threshold: float, max_out: int):
    """Full NMS: sort (reference tie order) + greedy suppress.

    Args:
      boxes: [N, 4]; scores: [N] (or ``None`` / ``'area'`` / int column,
        resolved per ``nms.lua:37-43``); valid: [N] bool.
    Returns:
      (indices [max_out] int32 into the ORIGINAL order, -1 padded;
       keep_valid [max_out] bool). Picks are in descending score order like
       the reference's pick list.
    """
    scores = resolve_nms_scores(boxes, scores)
    perm = _sort_desc_with_ref_ties(scores, valid)
    boxes_sorted = jnp.take(boxes, perm, axis=0)
    valid_sorted = jnp.take(valid, perm)
    keep_slots, keep_valid = nms_indices_sorted(
        boxes_sorted, valid_sorted, iou_threshold, max_out
    )
    indices = jnp.where(keep_valid, jnp.take(perm, jnp.maximum(keep_slots, 0)), -1)
    return indices, keep_valid


def class_offset_boxes(boxes, classes, valid):
    """The per-class-NMS coordinate-offset trick (``Detector.lua:124-136``):
    translate each class's boxes into a disjoint coordinate region so ONE
    joint NMS equals independent per-class runs. Shape-polymorphic — works
    on ``[N, 4]`` or ``[B, D, 4]`` boxes with matching ``[N]``/``[B, D]``
    classes/valid; the span is global over all valid boxes (batched callers
    share one span, which is fine: disjointness is all that matters)."""
    span = (
        jnp.max(jnp.where(valid, jnp.max(boxes, axis=-1), 0.0))
        - jnp.min(jnp.where(valid, jnp.min(boxes, axis=-1), 0.0))
        + 2.0
    )
    return boxes + (classes.astype(boxes.dtype) * span)[..., None]


def per_class_nms(boxes, scores, classes, valid, num_classes: int,
                  iou_threshold: float, max_out: int):
    """Per-class NMS in one pass via the coordinate-offset trick
    (``Detector.lua:124-136``)."""
    shifted = class_offset_boxes(boxes, classes, valid)
    return nms(shifted, scores, valid, iou_threshold, max_out)
