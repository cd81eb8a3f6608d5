"""Rasterization helpers (reference: rten-imageproc/src/drawing.rs)."""

from __future__ import annotations

import numpy as np


def draw_line(image, p0, p1, value=1):
    """Bresenham line between (y, x) points, in place."""
    y0, x0 = int(round(p0[0])), int(round(p0[1]))
    y1, x1 = int(round(p1[0])), int(round(p1[1]))
    dy, dx = abs(y1 - y0), abs(x1 - x0)
    sy = 1 if y0 < y1 else -1
    sx = 1 if x0 < x1 else -1
    err = dx - dy
    h, w = image.shape[:2]
    while True:
        if 0 <= y0 < h and 0 <= x0 < w:
            image[y0, x0] = value
        if (y0, x0) == (y1, x1):
            return image
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x0 += sx
        if e2 < dx:
            err += dx
            y0 += sy


def draw_polygon(image, points, value=1, fill=False):
    pts = np.asarray(points)
    if fill:
        return _fill_polygon(image, pts, value)
    for i in range(len(pts)):
        draw_line(image, pts[i], pts[(i + 1) % len(pts)], value)
    return image


def _fill_polygon(image, pts, value):
    h, w = image.shape[:2]
    ys = pts[:, 0]
    for row in range(max(0, int(np.floor(ys.min()))),
                     min(h, int(np.ceil(ys.max())) + 1)):
        xs = []
        for i in range(len(pts)):
            y0, x0 = pts[i]
            y1, x1 = pts[(i + 1) % len(pts)]
            if (y0 <= row < y1) or (y1 <= row < y0):
                t = (row - y0) / (y1 - y0)
                xs.append(x0 + t * (x1 - x0))
        xs.sort()
        for j in range(0, len(xs) - 1, 2):
            lo = max(0, int(np.ceil(xs[j])))
            hi = min(w - 1, int(np.floor(xs[j + 1])))
            if hi >= lo:
                image[row, lo:hi + 1] = value
    return image


def fill_rect(image, rect, value=1):
    top = max(0, int(rect.top))
    left = max(0, int(rect.left))
    bottom = min(image.shape[0], int(rect.bottom))
    right = min(image.shape[1], int(rect.right))
    image[top:bottom, left:right] = value
    return image
