"""Vectorized box algebra on ``[..., 4]`` arrays of ``(minx, miny, maxx, maxy)``.

Replaces the reference's scalar ``Rect`` class (``Rect.lua``) with dense
device-side ops. Conventions carried over deliberately:

* Boxes are half-open intervals ``[min, max)`` in screen coordinates
  (``Rect.lua:5-10``): a pixel-tight box around one pixel at (x, y) is
  ``(x, y, x+1, y+1)``.
* Two IoU definitions coexist in the reference and both are kept:
  :func:`iou` is the plain geometric IoU used for anchor matching
  (``Rect.lua:138-141``), while :func:`iou_plus_one` adds the +1-pixel area
  convention used only inside greedy NMS (``nms.lua:35, 85-86``).
* Box regression encoding is the reference's *corner-offset* parameterization
  (``Anchors.lua:237-252``): offsets of the top-left corner normalized by
  anchor size plus log size ratios — NOT the standard center-offset
  Faster R-CNN encoding.

All functions are pure jnp and jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


# --- basic accessors -------------------------------------------------------

def width(b):
    return b[..., 2] - b[..., 0]


def height(b):
    return b[..., 3] - b[..., 1]


def area(b):
    """Signed area; matches ``Rect:area`` (``Rect.lua:60-62``)."""
    return width(b) * height(b)


def center(b):
    """Center (cx, cy), stacked on the last axis (``Rect.lua:64-66``)."""
    return jnp.stack(
        [(b[..., 0] + b[..., 2]) * 0.5, (b[..., 1] + b[..., 3]) * 0.5], axis=-1
    )


def from_xywh(x, y, w, h):
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def from_center_wh(cx, cy, w, h):
    """``Rect.fromCenterWidthHeight`` (``Rect.lua:34-36``)."""
    return from_xywh(cx - w * 0.5, cy - h * 0.5, w, h)


# --- transforms ------------------------------------------------------------

def scale(b, sx, sy=None):
    if sy is None:
        sy = sx
    return b * jnp.stack(
        [jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sx), jnp.asarray(sy)], axis=-1
    )


def offset(b, dx, dy):
    return b + jnp.stack(
        [jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(dy)], axis=-1
    )


def inflate(b, ix, iy):
    return b + jnp.stack(
        [-jnp.asarray(ix), -jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(iy)], axis=-1
    )


def clip(b, clip_box):
    """Clamp all four edges into ``clip_box``; matches ``Rect:clip``
    (``Rect.lua:73-80``) including its clamp-both-edges behavior (a box fully
    outside collapses onto the nearest clip edge)."""
    cminx, cminy, cmaxx, cmaxy = (
        clip_box[..., 0], clip_box[..., 1], clip_box[..., 2], clip_box[..., 3]
    )
    return jnp.stack(
        [
            jnp.minimum(jnp.maximum(b[..., 0], cminx), cmaxx),
            jnp.minimum(jnp.maximum(b[..., 1], cminy), cmaxy),
            jnp.maximum(jnp.minimum(b[..., 2], cmaxx), cminx),
            jnp.maximum(jnp.minimum(b[..., 3], cmaxy), cminy),
        ],
        axis=-1,
    )


def hflip(b, image_w):
    """Mirror horizontally inside an image of width ``image_w``
    (``BatchIterator.lua:58-62``)."""
    return jnp.stack(
        [image_w - b[..., 2], b[..., 1], image_w - b[..., 0], b[..., 3]], axis=-1
    )


def vflip(b, image_h):
    return jnp.stack(
        [b[..., 0], image_h - b[..., 3], b[..., 2], image_h - b[..., 1]], axis=-1
    )


def snap_to_int(b):
    """Floor the min corner, ceil the max corner (``Rect.lua:147-149``)."""
    return jnp.stack(
        [
            jnp.floor(b[..., 0]),
            jnp.floor(b[..., 1]),
            jnp.ceil(b[..., 2]),
            jnp.ceil(b[..., 3]),
        ],
        axis=-1,
    )


# --- predicates ------------------------------------------------------------

def is_empty(b):
    """``Rect:isEmpty`` (``Rect.lua:69-71``): both extents collapsed."""
    return (b[..., 0] == b[..., 2]) & (b[..., 1] == b[..., 3])


def overlaps(a, b):
    """Strict open-interval overlap test (``Rect:overlaps``, ``Rect.lua:90-93``)."""
    return (
        (a[..., 0] < b[..., 2])
        & (a[..., 2] > b[..., 0])
        & (a[..., 1] < b[..., 3])
        & (a[..., 3] > b[..., 1])
    )


def contains(outer, inner):
    """All four corners of ``inner`` inside half-open ``outer``; matches
    ``Rect:contains`` built on ``containsPt`` (``Rect.lua:82-88``)."""
    return (
        (outer[..., 0] <= inner[..., 0])
        & (inner[..., 0] < outer[..., 2])
        & (outer[..., 1] <= inner[..., 1])
        & (inner[..., 1] < outer[..., 3])
        & (outer[..., 0] <= inner[..., 2])
        & (inner[..., 2] < outer[..., 2])
        & (outer[..., 1] <= inner[..., 3])
        & (inner[..., 3] < outer[..., 3])
    )


def inside(outer, inner):
    """Closed-interval containment used for anchor validity: every vertex of
    ``inner`` lies in ``outer`` including its max edge. This is what
    ``Anchors:findRangesXY`` enforces with its binary-search bounds
    (``Anchors.lua:105-110``): a.minX >= r.minX and a.maxX <= r.maxX (etc.)."""
    return (
        (inner[..., 0] >= outer[..., 0])
        & (inner[..., 1] >= outer[..., 1])
        & (inner[..., 2] <= outer[..., 2])
        & (inner[..., 3] <= outer[..., 3])
    )


def union(a, b):
    """Bounding box of two boxes (``Rect.union``, ``Rect.lua:118-124``)."""
    return jnp.stack(
        [
            jnp.minimum(a[..., 0], b[..., 0]),
            jnp.minimum(a[..., 1], b[..., 1]),
            jnp.maximum(a[..., 2], b[..., 2]),
            jnp.maximum(a[..., 3], b[..., 3]),
        ],
        axis=-1,
    )


def intersect(a, b):
    """Intersection box; the all-zero empty box when disjoint
    (``Rect.intersect``, ``Rect.lua:126-136``)."""
    minx = jnp.maximum(a[..., 0], b[..., 0])
    miny = jnp.maximum(a[..., 1], b[..., 1])
    maxx = jnp.minimum(a[..., 2], b[..., 2])
    maxy = jnp.minimum(a[..., 3], b[..., 3])
    ok = (maxx >= minx) & (maxy >= miny)
    out = jnp.stack([minx, miny, maxx, maxy], axis=-1)
    return jnp.where(ok[..., None], out, jnp.zeros_like(out))


# --- intersection / IoU ----------------------------------------------------

def intersect_area(a, b):
    """Area of intersection; 0 when disjoint (``Rect.intersect``,
    ``Rect.lua:126-136``)."""
    iw = jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0])
    ih = jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1])
    return jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)


def iou(a, b):
    """Plain IoU used for anchor/ROI matching (``Rect.IoU``,
    ``Rect.lua:138-141``). Broadcasts; returns 0 for two empty boxes."""
    i = intersect_area(a, b)
    u = area(a) + area(b) - i
    return jnp.where(u > 0, i / jnp.where(u > 0, u, 1.0), 0.0)


def iou_matrix(a, b):
    """Pairwise IoU of ``a [N,4]`` x ``b [M,4]`` -> ``[N, M]``."""
    return iou(a[:, None, :], b[None, :, :])


def iou_plus_one(a, b):
    """NMS IoU with the legacy +1-pixel area convention: widths/heights are
    computed as ``max - min + 1`` (``nms.lua:35, 85-86``)."""
    aw = a[..., 2] - a[..., 0] + 1.0
    ah = a[..., 3] - a[..., 1] + 1.0
    bw = b[..., 2] - b[..., 0] + 1.0
    bh = b[..., 3] - b[..., 1] + 1.0
    iw = jnp.maximum(
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + 1.0, 0.0
    )
    ih = jnp.maximum(
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + 1.0, 0.0
    )
    inter = iw * ih
    union = aw * ah + bw * bh - inter
    return inter / jnp.where(union > 0, union, 1.0)


# --- regression encoding ---------------------------------------------------

def encode(anchor, target):
    """``Anchors.inputToAnchor`` (``Anchors.lua:237-243``): corner offsets of
    the target's min corner relative to the anchor's min corner, normalized
    by anchor size, plus log size ratios. Returns ``[..., 4] = (tx, ty, tw, th)``.
    """
    aw = width(anchor)
    ah = height(anchor)
    tx = (target[..., 0] - anchor[..., 0]) / aw
    ty = (target[..., 1] - anchor[..., 1]) / ah
    tw = jnp.log(width(target) / aw)
    th = jnp.log(height(target) / ah)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode(anchor, t):
    """``Anchors.anchorToInput`` (``Anchors.lua:245-252``): inverse of
    :func:`encode`."""
    aw = width(anchor)
    ah = height(anchor)
    x = t[..., 0] * aw + anchor[..., 0]
    y = t[..., 1] * ah + anchor[..., 1]
    w = jnp.exp(t[..., 2]) * aw
    h = jnp.exp(t[..., 3]) * ah
    return from_xywh(x, y, w, h)
