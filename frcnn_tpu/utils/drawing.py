"""Box overlay drawing — ``draw_rectangle`` (``utilities.lua:149-177``):
1-pixel box outlines drawn into a float image, clipped at the borders."""

from __future__ import annotations

import numpy as np

RED = (1.0, 0.0, 0.0)
GREEN = (0.0, 1.0, 0.0)
BLUE = (0.0, 0.0, 1.0)
WHITE = (1.0, 1.0, 1.0)


def draw_rectangle(img: np.ndarray, rect, color=GREEN) -> np.ndarray:
    """Draw the outline of ``rect`` (minx, miny, maxx, maxy) in-place on
    ``img`` [H, W, 3] float. Returns img."""
    h, w = img.shape[:2]
    x0, y0, x1, y1 = (int(round(v)) for v in rect)
    c = np.asarray(color, img.dtype)
    cx0, cx1 = max(x0, 0), min(x1, w)
    cy0, cy1 = max(y0, 0), min(y1, h)
    if cx1 > cx0:
        if 0 <= y0 < h:
            img[y0, cx0:cx1] = c
        if 0 <= y1 - 1 < h:
            img[y1 - 1, cx0:cx1] = c
    if cy1 > cy0:
        if 0 <= x0 < w:
            img[cy0:cy1, x0] = c
        if 0 <= x1 - 1 < w:
            img[cy0:cy1, x1 - 1] = c
    return img


def save_image(img: np.ndarray, path: str):
    """Save a float [0,1]-ish RGB image as JPEG/PNG."""
    from PIL import Image

    arr = np.clip(img, 0.0, 1.0)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)
