"""Vectorized anchor/ground-truth matching and example sampling.

Device-side replacements for the reference's host Lua loops:

* :func:`match_positives` — ``Anchors:findPositive`` (``Anchors.lua:147-195``):
  IoU > pos_threshold positives plus the order-dependent best-match fallback
  with its 0.025 tie band, reproduced exactly via a prefix-max scan over the
  canonical anchor order.
* :func:`sample_negatives` — ``Anchors:sampleNegative`` (``Anchors.lua:197-235``):
  random anchors inside the image whose IoU with every ROI is <= threshold.
  The reference samples ranges (scale x aspect) uniformly and then a cell
  uniformly within the range, with replacement and a 500-retry bound; we draw
  a fixed count without replacement via Gumbel top-k with the same per-range
  marginal weighting (each of the 12 ranges equally likely).
* :func:`nearby_negatives` — the nearby-aversion pass of
  ``BatchIterator:nextTraining`` (``BatchIterator.lua:206-225``) built on
  ``Anchors:findNearby`` (``Anchors.lua:69-84``): anchors sharing a 16px
  center hash bin with a positive anchor (in both axes) whose IoU with that
  positive is below the negative threshold.
* :func:`compact_mask` — turns a boolean mask into a fixed-size index list
  (first-K in canonical order) with an O(N) scatter instead of a sort.

All functions are jit-safe with fixed shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from frcnn_tpu.geometry import boxes as B

BEST_MATCH_TIE_BAND = 0.025  # ``Anchors.lua:176``


def compact_mask(mask, k, fill=-1):
    """Indices of the first ``k`` True entries of ``mask`` (in order), padded
    with ``fill``. Returns (indices [k], valid [k], count).

    Scatter-free: the obvious rank-scatter (``.at[rank].set(iota)``) is an
    O(n) serialized scatter on TPU — ~30 ms for the 850k-element mask of
    select_positive_pairs. Instead, block the mask into rows, row-cumsum
    the ranks (fast lane-axis ``lax.cumsum``), and for each of the k
    OUTPUT slots gather its covering block (searchsorted over the block
    offsets) and match its within-block rank — O(k·block) work.
    """
    n = mask.shape[0]
    block = 1024
    nb = -(-n // block)
    m = jnp.pad(mask, (0, nb * block - n)).reshape(nb, block)
    mi = m.astype(jnp.int32)
    counts = jnp.sum(mi, axis=1)                             # [nb]
    cum = jnp.cumsum(counts)
    offsets = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    ranks = jax.lax.cumsum(mi, axis=1) - 1                   # [nb, block]
    total = cum[-1]

    j = jnp.arange(k, dtype=jnp.int32)
    # covering block: the LAST block with offset <= j (empty blocks share
    # their successor's offset and sort before it, so 'right' is correct)
    c = jnp.searchsorted(offsets, j, side="right").astype(jnp.int32) - 1
    within = j - offsets[c]
    hit = m[c] & (ranks[c] == within[:, None])               # [k, block]
    col = jnp.sum(
        jnp.where(hit, jnp.arange(block, dtype=jnp.int32)[None, :], 0),
        axis=1,
    )
    valid = j < total
    out = jnp.where(valid, c * block + col, fill).astype(jnp.int32)
    count = jnp.minimum(total, k).astype(jnp.int32)
    return out, valid, count


def match_positives(
    anchor_boxes,      # [A, 4] canonical order
    candidate_mask,    # [A] bool — anchors fully inside image AND in true fm
    gt_boxes,          # [G, 4]
    gt_mask,           # [G] bool
    pos_threshold: float,
    neg_threshold: float,
    include_best: bool,
    iou=None,          # optional precomputed [G, A] IoU matrix
):
    """Per-ROI positive anchor masks.

    Returns ``pos [G, A]`` bool: anchor a is a positive example for ROI g.
    Matches ``Anchors:findPositive`` semantics:

    - candidates are anchors overlapping the ROI (IoU > 0) and fully inside
      the clip rect (``findRangesXY`` bounds);
    - IoU > pos_threshold -> positive;
    - otherwise, if ``include_best``, the running-best scan: an anchor enters
      the best set when its IoU is >= the running maximum (and > neg_threshold)
      and the set is flushed whenever an anchor beats the running maximum by
      more than 0.025 (``Anchors.lua:169-181``). The set is only used when the
      ROI produced no direct positive. Assumes neg_threshold >= 0 (so any
      inserted anchor satisfies the final ``best_iou > 0`` check,
      ``Anchors.lua:184``).
    """
    if iou is None:
        iou = B.iou_matrix(gt_boxes, anchor_boxes)        # [G, A]
    cand = candidate_mask[None, :] & (iou > 0.0)
    direct = cand & (iou > pos_threshold)
    has_direct = jnp.any(direct, axis=1, keepdims=True)   # [G, 1]

    if include_best:
        v = jnp.where(cand & (iou > neg_threshold), iou, -1.0)
        # lax.cummax, not associative_scan: the scan's odd/even strided
        # slices relayout on the TPU lane axis (measured 9.7 vs 1.2 ms
        # on [8,32,26544], scripts/bench_scan.py)
        run_max = jax.lax.cummax(v, axis=1)
        m_before = jnp.concatenate(
            [jnp.full((v.shape[0], 1), -1.0), run_max[:, :-1]], axis=1
        )
        inserted = (v >= m_before) & (v > neg_threshold)
        resets = v > m_before + BEST_MATCH_TIE_BAND
        resets_after = jnp.sum(resets, axis=1, keepdims=True) - jnp.cumsum(
            resets.astype(jnp.int32), axis=1
        )
        best = inserted & (resets_after == 0)
        pos = jnp.where(has_direct, direct, best)
    else:
        pos = direct

    return pos & gt_mask[:, None]


def sample_negatives(
    rng,
    anchor_boxes,      # [A, 4]
    valid_mask,        # [A] bool — inside image and in true fm
    range_id,          # [A] int — scale*3+aspect id, for range weighting
    num_ranges: int,
    gt_boxes,          # [G, 4]
    gt_mask,           # [G]
    neg_threshold: float,
    count: int,        # static max count
    requested,         # traced actual count to draw (<= count)
    iou=None,          # optional precomputed [G, A] IoU matrix
):
    """Random negative anchors. Returns (indices [count], valid [count])."""
    if iou is None:
        iou = B.iou_matrix(gt_boxes, anchor_boxes)        # [G, A]
    iou = jnp.where(gt_mask[:, None], iou, 0.0)
    clean = valid_mask & ~jnp.any(iou > neg_threshold, axis=0)

    # Per-range weighting: reference picks one of the (scale, aspect) ranges
    # uniformly, then a cell uniformly inside it (``Anchors.lua:205-207``).
    per_range = jax.ops.segment_sum(
        clean.astype(jnp.float32), range_id, num_segments=num_ranges
    )
    weight = jnp.where(clean, 1.0 / jnp.maximum(per_range[range_id], 1.0), 0.0)
    gumbel = jax.random.gumbel(rng, (anchor_boxes.shape[0],))
    score = jnp.where(clean, jnp.log(jnp.maximum(weight, 1e-20)) + gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(score, count)
    valid = jnp.take(clean, idx) & (
        jnp.arange(count) < jnp.minimum(requested, jnp.sum(clean.astype(jnp.int32)))
    )
    return idx.astype(jnp.int32), valid


def nearby_negatives(
    rng,
    anchor_boxes,      # [A, 4]
    bin_x, bin_y,      # [A] int — 16px center hash bins
    fm_mask,           # [A] bool — in true fm (cleanAnchors; NOT inside-image:
                       #   findNearby candidates skip the image-bounds check)
    pos_idx,           # [P] int — selected positive anchor indices
    pos_valid,         # [P] bool
    neg_threshold: float,
    count: int,        # static max count
    num_positives,     # traced — cap: min(#positives, available)
):
    """Nearby-aversion negatives. Returns (indices [count], valid [count]).

    An anchor qualifies if it shares its center hash bin (both axes) with any
    selected positive anchor and its IoU with that positive is below the
    negative threshold (``BatchIterator.lua:206-225``). The reference then
    shuffles and keeps at most #positives of them; we pick uniformly at
    random via Gumbel top-k. (Divergence: the reference list may contain the
    same anchor once per matching positive — duplicates; we sample unique
    anchors.)
    """
    pbx = jnp.take(bin_x, pos_idx)
    pby = jnp.take(bin_y, pos_idx)
    pboxes = jnp.take(anchor_boxes, pos_idx, axis=0)
    same_bin = (bin_x[None, :] == pbx[:, None]) & (bin_y[None, :] == pby[:, None])
    iou = B.iou_matrix(pboxes, anchor_boxes)              # [P, A]
    cand = same_bin & (iou < neg_threshold) & pos_valid[:, None] & fm_mask[None, :]
    cand_any = jnp.any(cand, axis=0)

    gumbel = jax.random.gumbel(rng, (anchor_boxes.shape[0],))
    score = jnp.where(cand_any, gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(score, count)
    cap = jnp.minimum(num_positives, jnp.sum(cand_any.astype(jnp.int32)))
    valid = jnp.take(cand_any, idx) & (jnp.arange(count) < cap)
    return idx.astype(jnp.int32), valid


class PositiveSelection(NamedTuple):
    anchor_idx: jnp.ndarray  # [P]
    gt_idx: jnp.ndarray      # [P]
    valid: jnp.ndarray       # [P] bool
    count: jnp.ndarray       # scalar


def select_positive_pairs(pos_matrix, max_positives: int) -> PositiveSelection:
    """Flatten the [G, A] positive mask to at most ``max_positives``
    (anchor, gt) index pairs, ROI-major like the reference match list."""
    g_count, a_count = pos_matrix.shape
    flat = pos_matrix.reshape(-1)
    idx, valid, count = compact_mask(flat, max_positives)
    safe = jnp.maximum(idx, 0)
    return PositiveSelection(
        anchor_idx=(safe % a_count).astype(jnp.int32),
        gt_idx=(safe // a_count).astype(jnp.int32),
        valid=valid,
        count=count,
    )
