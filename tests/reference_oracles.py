"""Scalar, loop-based re-implementations of reference semantics, used as
oracles by the test suite. Deliberately written in the same step-by-step
style as the Lua (``Rect.lua``, ``nms.lua``, ``Anchors.lua``) so the
vectorized device code is checked against an independent formulation."""

import math

import numpy as np


# --- Rect oracle (Rect.lua) -------------------------------------------------

def rect_intersect_area(a, b):
    minx = max(a[0], b[0])
    miny = max(a[1], b[1])
    maxx = min(a[2], b[2])
    maxy = min(a[3], b[3])
    if maxx >= minx and maxy >= miny:
        return (maxx - minx) * (maxy - miny)
    return 0.0


def rect_iou(a, b):
    i = rect_intersect_area(a, b)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    u = area_a + area_b - i
    return i / u if u != 0 else 0.0


def rect_clip(r, c):
    return (
        min(max(r[0], c[0]), c[2]),
        min(max(r[1], c[1]), c[3]),
        max(min(r[2], c[2]), c[0]),
        max(min(r[3], c[3]), c[1]),
    )


def encode_box(anchor, rect):
    """Anchors.inputToAnchor (Anchors.lua:237-243)."""
    aw = anchor[2] - anchor[0]
    ah = anchor[3] - anchor[1]
    return (
        (rect[0] - anchor[0]) / aw,
        (rect[1] - anchor[1]) / ah,
        math.log((rect[2] - rect[0]) / aw),
        math.log((rect[3] - rect[1]) / ah),
    )


def decode_box(anchor, t):
    """Anchors.anchorToInput (Anchors.lua:245-252)."""
    aw = anchor[2] - anchor[0]
    ah = anchor[3] - anchor[1]
    x = t[0] * aw + anchor[0]
    y = t[1] * ah + anchor[1]
    w = math.exp(t[2]) * aw
    h = math.exp(t[3]) * ah
    return (x, y, x + w, y + h)


# --- NMS oracle (nms.lua) ---------------------------------------------------

def nms_oracle(boxes, overlap, scores):
    """Greedy NMS with the +1 area convention, processing in descending
    score order with the reference's tie behavior (ascending stable sort,
    picked from the back => ties broken toward the LARGER original index).
    Returns picked indices (0-based) in pick order."""
    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64)
    n = len(boxes)
    if n == 0:
        return []
    order = sorted(range(n), key=lambda i: (scores[i], i))  # ascending, stable
    remaining = list(order)
    area = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    pick = []
    while remaining:
        i = remaining.pop()  # back = highest score, largest index on ties
        pick.append(i)
        keep = []
        for j in remaining:
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + 1
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + 1
            inter = max(iw, 0.0) * max(ih, 0.0)
            iou = inter / (area[i] + area[j] - inter)
            if iou <= overlap:
                keep.append(j)
        remaining = keep
    return pick


# --- best-match scan oracle (Anchors.lua:147-195) ----------------------------

def find_positive_oracle(anchor_boxes, candidate_mask, roi_boxes,
                         pos_threshold, neg_threshold, include_best):
    """Literal transcription of the findPositive loops. Returns a list of
    (anchor_index, roi_index) pairs in reference order."""
    matches = []
    for g, roi in enumerate(roi_boxes):
        best_set = None
        best_iou = -1.0
        if include_best:
            best_set = []
        for a, box in enumerate(anchor_boxes):
            if not candidate_mask[a]:
                continue
            v = rect_iou(roi, box)
            if v <= 0.0:
                continue  # non-overlapping anchors are never enumerated
            if v > pos_threshold:
                matches.append((a, g))
                best_set = None
            elif v > neg_threshold and best_set is not None and v >= best_iou:
                if v - 0.025 > best_iou:
                    best_set = []
                best_set.append(a)
                best_iou = v
        if best_set is not None and best_iou > 0:
            for a in best_set:
                matches.append((a, g))
    return matches


# --- adaptive max pool oracle (torch SpatialAdaptiveMaxPooling) --------------

def adaptive_max_pool_oracle(x, kh, kw):
    """x: [H, W, C] -> [kh, kw, C]; torch bin edges: floor(i*H/kh) to
    ceil((i+1)*H/kh)."""
    H, W, C = x.shape
    out = np.zeros((kh, kw, C), x.dtype)
    for i in range(kh):
        y0 = (i * H) // kh
        y1 = -((-(i + 1) * H) // kh)
        for j in range(kw):
            x0 = (j * W) // kw
            x1 = -((-(j + 1) * W) // kw)
            out[i, j] = x[y0:y1, x0:x1].reshape(-1, C).max(axis=0)
    return out
