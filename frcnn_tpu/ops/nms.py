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


def nms_indices_sorted(boxes_sorted, valid_sorted, iou_threshold: float, max_out: int):
    """Greedy NMS over boxes already in processing order.

    Returns (keep_slots [max_out] int32 — positions in the *sorted* order,
    -1 padded; keep_valid [max_out] bool).
    """
    n = boxes_sorted.shape[0]
    iou = B.iou_plus_one(boxes_sorted[:, None, :], boxes_sorted[None, :, :])
    idx_range = jnp.arange(n)

    # while_loop with early exit: trip count = number of picks actually
    # made (<< max_out on typical scenes), not the static bound.
    def cond(state):
        k, alive, _, _ = state
        return (k < max_out) & jnp.any(alive)

    def body(state):
        k, alive, keep, keep_valid = state
        pick = jnp.argmax(alive)  # first alive (highest score remaining)
        keep = keep.at[k].set(pick.astype(jnp.int32))
        keep_valid = keep_valid.at[k].set(True)
        alive = alive & (iou[pick] <= iou_threshold) & (idx_range != pick)
        return k + 1, alive, keep, keep_valid

    state0 = (
        jnp.asarray(0, jnp.int32),
        valid_sorted,
        jnp.full((max_out,), -1, jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, _, keep, keep_valid = jax.lax.while_loop(cond, body, state0)
    return keep, keep_valid


def nms(boxes, scores, valid, iou_threshold: float, max_out: int):
    """Full NMS: sort (reference tie order) + greedy suppress.

    Args:
      boxes: [N, 4]; scores: [N]; valid: [N] bool.
    Returns:
      (indices [max_out] int32 into the ORIGINAL order, -1 padded;
       keep_valid [max_out] bool). Picks are in descending score order like
       the reference's pick list.
    """
    perm = _sort_desc_with_ref_ties(scores, valid)
    boxes_sorted = jnp.take(boxes, perm, axis=0)
    valid_sorted = jnp.take(valid, perm)
    keep_slots, keep_valid = nms_indices_sorted(
        boxes_sorted, valid_sorted, iou_threshold, max_out
    )
    indices = jnp.where(keep_valid, jnp.take(perm, jnp.maximum(keep_slots, 0)), -1)
    return indices, keep_valid


def per_class_nms(boxes, scores, classes, valid, num_classes: int,
                  iou_threshold: float, max_out: int):
    """Per-class NMS in one pass via the coordinate-offset trick: boxes of
    different classes are translated to disjoint regions, so one joint NMS
    equals independent per-class NMS runs (``Detector.lua:124-136``)."""
    span = (
        jnp.max(jnp.where(valid, jnp.max(boxes, axis=-1), 0.0))
        - jnp.min(jnp.where(valid, jnp.min(boxes, axis=-1), 0.0))
        + 2.0
    )
    offs = classes.astype(boxes.dtype) * span
    shifted = boxes + offs[:, None]
    return nms(shifted, scores, valid, iou_threshold, max_out)
