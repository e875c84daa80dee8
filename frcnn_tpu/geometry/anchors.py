"""Dense multi-scale anchor generation.

The reference builds per-(scale, aspect, coordinate) min/max lookup tables by
walking a Localizer per pyramid tap (``Anchors.lua:7-58``): for each feature
cell the one-cell rect ``[c, c+1)`` is mapped to input space, its center
taken, and a box of the aspect's (w, h) centered there. Because
``featureToInputRect`` is affine, centers are an affine function of the cell
index; we exploit that to emit the whole anchor field as dense arrays.

Aspect ratios are 3 equal-area variants of scale ``s`` (``Anchors.lua:32-35``):
``a = s / sqrt(2)``; dims ``{s, s}, {2a, a}, {a, 2a}`` (1:1, 2:1, 1:2).

Canonical flat ordering is (tap, aspect, y, x) — the enumeration order of
``Anchors:findRangesXY``/``findPositive`` (``Anchors.lua:86-195``), which
matters for exact parity of the order-dependent best-match tie band.

Channel layout of a pnet anchor map (18 channels): for 0-based aspect ``j``,
channels ``[6j, 6j+6)`` hold ``(cls_fg, cls_bg, x, y, w, h)``
(``models/model_utilities.lua:33``, ``objective.lua:104-114``).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from frcnn_tpu.config import Config
from frcnn_tpu.geometry.localizer import (
    Localizer,
    layer_infos_for_feature_map,
    layer_infos_for_tap,
)

BIN_SIZE = 16  # nearby-anchor center hash granularity (``Anchors.lua:5``)


def aspect_dims(scale: float) -> List[Tuple[float, float]]:
    """(w, h) of the 3 equal-area aspects of ``scale`` (``Anchors.lua:32-35``)."""
    a = scale / math.sqrt(2)
    return [(float(scale), float(scale)), (2 * a, a), (a, 2 * a)]


class AnchorGenerator:
    """Static anchor field for a fixed padded image bucket.

    Attributes (all numpy, computed once at construction):
      boxes      [A, 4] float32 — anchor boxes in input coordinates
      tap        [A] int32 — pyramid tap (0..3)
      aspect     [A] int32 — aspect index (0..2)
      fy, fx     [A] int32 — feature-map cell coordinates (0-based)
      bin_x/bin_y[A] int32 — center 16px hash bins (``Anchors.lua:5, 24-30``)
      tap_dims   list of (H, W) anchor-map spatial dims for the padded bucket
    """

    def __init__(self, cfg: Config, image_hw: Tuple[int, int] = None):
        """``image_hw`` overrides the bucket (default: the config's primary
        bucket); used for the portrait bucket's anchor field."""
        self.cfg = cfg
        model = cfg.model
        self.scales = cfg.scales
        H, W = image_hw if image_hw is not None else cfg.shapes.image_hw
        self.image_hw = (H, W)

        self.tap_localizers = [
            Localizer(layer_infos_for_tap(model, i)) for i in range(len(cfg.scales))
        ]
        self.fm_localizer = Localizer(layer_infos_for_feature_map(model))
        self.fm_hw = tuple(reversed(self.fm_localizer.feature_map_size(W, H)))  # (H, W)

        self.tap_dims: List[Tuple[int, int]] = []
        boxes, taps, aspects, fys, fxs = [], [], [], [], []
        for i, loc in enumerate(self.tap_localizers):
            w_cells, h_cells = loc.feature_map_size(W, H)
            self.tap_dims.append((h_cells, w_cells))
            cx = self._centers(loc, w_cells, axis="x")
            cy = self._centers(loc, h_cells, axis="y")
            for j, (bw, bh) in enumerate(aspect_dims(self.scales[i])):
                gx, gy = np.meshgrid(cx, cy)  # [h, w]
                b = np.stack(
                    [gx - bw / 2, gy - bh / 2, gx + bw / 2, gy + bh / 2], axis=-1
                )
                boxes.append(b.reshape(-1, 4))
                taps.append(np.full(h_cells * w_cells, i, np.int32))
                aspects.append(np.full(h_cells * w_cells, j, np.int32))
                yy, xx = np.meshgrid(
                    np.arange(h_cells, dtype=np.int32),
                    np.arange(w_cells, dtype=np.int32),
                    indexing="ij",
                )
                fys.append(yy.reshape(-1))
                fxs.append(xx.reshape(-1))

        self.boxes = np.concatenate(boxes).astype(np.float32)
        self.tap = np.concatenate(taps)
        self.aspect = np.concatenate(aspects)
        self.fy = np.concatenate(fys)
        self.fx = np.concatenate(fxs)
        centers = (self.boxes[:, :2] + self.boxes[:, 2:]) * 0.5
        self.bin_x = np.floor(centers[:, 0] / BIN_SIZE).astype(np.int32)
        self.bin_y = np.floor(centers[:, 1] / BIN_SIZE).astype(np.int32)
        self.num_anchors = self.boxes.shape[0]

    @staticmethod
    def _centers(loc: Localizer, n_cells: int, axis: str) -> np.ndarray:
        """Input-space center of each one-cell feature rect ``[c, c+1)``,
        matching ``Anchors.lua:40-55`` (which evaluates the localizer per
        cell; we use the affine closed form: center(c) = S*c + C0)."""
        if axis == "x":
            s, bmin, bmax = loc.scale_x, loc.offset_min_x, loc.offset_max_x
        else:
            s, bmin, bmax = loc.scale_y, loc.offset_min_y, loc.offset_max_y
        c0 = (s + bmin + bmax) / 2.0
        return s * np.arange(n_cells, dtype=np.float64) + c0

    # -- parity with the reference lookup tables ----------------------------

    def lookup_tables(self, extent: int = 200):
        """Rebuild the reference's ``self.w`` / ``self.h`` tables of shape
        [num_scales, 3, extent, 2] (``Anchors.lua:15-19, 38-57``); used by
        parity tests. Entry [i, j, c, :] is the (min, max) extent of the
        anchor at 1-based feature coordinate c+1."""
        ns = len(self.scales)
        w = np.zeros((ns, 3, extent, 2))
        h = np.zeros((ns, 3, extent, 2))
        for i, loc in enumerate(self.tap_localizers):
            cx = self._centers(loc, extent, "x")
            cy = self._centers(loc, extent, "y")
            for j, (bw, bh) in enumerate(aspect_dims(self.scales[i])):
                w[i, j, :, 0] = cx - bw / 2
                w[i, j, :, 1] = cx + bw / 2
                h[i, j, :, 0] = cy - bh / 2
                h[i, j, :, 1] = cy + bh / 2
        return w, h

    def get(self, tap: int, aspect: int, y: int, x: int) -> np.ndarray:
        """Single anchor box by (tap, aspect, feature y, feature x), all
        0-based — ``Anchors:get`` is the 1-based equivalent (``Anchors.lua:60-67``)."""
        cx = self._centers(self.tap_localizers[tap], x + 1, "x")[x]
        cy = self._centers(self.tap_localizers[tap], y + 1, "y")[y]
        bw, bh = aspect_dims(self.scales[tap])[aspect]
        return np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2])

    # -- device-side helpers --------------------------------------------------

    def flat_slices(self) -> List[Tuple[int, int]]:
        """[start, end) ranges of each tap's anchors in the flat ordering."""
        out, start = [], 0
        for (h, w) in self.tap_dims:
            n = 3 * h * w
            out.append((start, start + n))
            start += n
        return out

    def flatten_tap_outputs(self, tap_outputs: Sequence) -> "jnp.ndarray":
        """Rearrange pnet anchor maps (NHWC ``[H, W, 18]`` each) into the
        canonical flat ``[A, 6]`` layout: per tap, channels split as
        ``[H, W, 3, 6] -> [3, H, W, 6]`` so aspect is outermost within the
        tap, matching the (tap, aspect, y, x) anchor order."""
        flats = []
        for out, (h, w) in zip(tap_outputs, self.tap_dims):
            x = out.reshape(h, w, 3, 6)
            x = jnp.transpose(x, (2, 0, 1, 3))
            flats.append(x.reshape(-1, 6))
        return jnp.concatenate(flats, axis=0)

    def detect_order(self) -> np.ndarray:
        """Permutation mapping the anchor maps' NATIVE flat order (per tap:
        y, x, aspect — i.e. ``[H, W, 18].reshape(-1, 6)`` with no
        transpose) to canonical indices: ``perm[native_idx] =
        canonical_idx``. The serving path flattens maps without the
        per-map [H, W, 3, 6] -> [3, H, W, 6] relayout and instead indexes
        anchor tables through this (host-precomputed) permutation —
        ordering is irrelevant to detection, only pred[i] <-> anchor[i]
        consistency matters."""
        parts, off = [], 0
        for (h, w) in self.tap_dims:
            n = h * w
            yy, xx, jj = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            canon = off + jj * n + yy * w + xx          # [h, w, 3]
            parts.append(canon.reshape(-1))
            off += 3 * n
        return np.concatenate(parts).astype(np.int32)

    def unflatten_to_tap_deltas(self, flat):
        """Inverse of :meth:`flatten_tap_outputs` for tests/debug."""
        outs, start = [], 0
        for (h, w) in self.tap_dims:
            n = 3 * h * w
            x = flat[start : start + n].reshape(3, h, w, 6)
            outs.append(jnp.transpose(x, (1, 2, 0, 3)).reshape(h, w, 18))
            start += n
        return outs

    def fm_valid_mask(self, true_h, true_w, fy=None, fx=None):
        """Anchors whose feature cell exists in the *true-size* anchor map —
        the vectorized ``cleanAnchors`` (``objective.lua:32-43``). Returns a
        [A] bool mask; true_h/true_w may be traced scalars. ``fy``/``fx``
        override the per-anchor cell tables (e.g. permuted to
        :meth:`detect_order`; tap extents are order-invariant since the
        permutation only shuffles within tap blocks)."""
        slices = self.flat_slices()
        fy = jnp.asarray(self.fy if fy is None else fy)
        fx = jnp.asarray(self.fx if fx is None else fx)
        mask = jnp.zeros((self.num_anchors,), bool)
        for i, loc in enumerate(self.tap_localizers):
            w_t, h_t = loc.feature_map_size_jax(true_w, true_h)
            s, e = slices[i]
            sl = slice(s, e)
            m = (fy[sl] < h_t) & (fx[sl] < w_t)
            mask = mask.at[sl].set(m)
        return mask

    def inside_image_mask(self, true_h, true_w):
        """Anchors fully inside the true image rect (closed max edge) — the
        clip-rect constraint of ``findRangesXY`` (``Anchors.lua:105-110``)."""
        b = jnp.asarray(self.boxes)
        return (
            (b[:, 0] >= 0)
            & (b[:, 1] >= 0)
            & (b[:, 2] <= true_w)
            & (b[:, 3] <= true_h)
        )
