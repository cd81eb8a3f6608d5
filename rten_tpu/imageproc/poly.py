"""Polygon algorithms: Douglas-Peucker simplification, Andrew-monotone
convex hull, rotating-calipers min-area rect
(reference: rten-imageproc/src/poly_algos.rs)."""

from __future__ import annotations

import numpy as np

from .shapes import RotatedRect


def simplify_polygon(points, epsilon: float) -> np.ndarray:
    """Douglas-Peucker: drop vertices within ``epsilon`` of the chord."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 3:
        return pts

    def dp(start, end):
        if end <= start + 1:
            return []
        a, b = pts[start], pts[end]
        seg = b - a
        seg_len = np.hypot(*seg)
        mid_pts = pts[start + 1:end] - a
        if seg_len == 0:
            dists = np.hypot(*mid_pts.T)
        else:
            # 2-D cross product by hand (np.cross on 2-vectors is
            # deprecated in numpy 2)
            dists = np.abs(seg[0] * mid_pts[:, 1]
                           - seg[1] * mid_pts[:, 0]) / seg_len
        idx = int(np.argmax(dists))
        if dists[idx] > epsilon:
            mid = start + 1 + idx
            return dp(start, mid) + [mid] + dp(mid, end)
        return []

    keep = [0] + dp(0, len(pts) - 1) + [len(pts) - 1]
    return pts[keep]


def convex_hull(points) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices counterclockwise."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # sort by (x, y) i.e. (col, row)
    order = np.lexsort((pts[:, 0], pts[:, 1]))
    pts = pts[order]

    def cross(o, a, b):
        return ((a[1] - o[1]) * (b[0] - o[0])
                - (a[0] - o[0]) * (b[1] - o[1]))

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def min_area_rect(points) -> RotatedRect:
    """Minimum-area enclosing rotated rect via rotating calipers over
    hull edges."""
    hull = convex_hull(points)
    if len(hull) == 1:
        return RotatedRect((hull[0][0], hull[0][1]), (0.0, 0.0), 0.0)
    if len(hull) == 2:
        center = hull.mean(0)
        d = hull[1] - hull[0]
        return RotatedRect(tuple(center), (0.0, float(np.hypot(*d))),
                           float(np.arctan2(d[0], d[1])))
    best = None
    for i in range(len(hull)):
        edge = hull[(i + 1) % len(hull)] - hull[i]
        angle = np.arctan2(edge[0], edge[1])
        c, s = np.cos(-angle), np.sin(-angle)
        rot = np.array([[c, -s], [s, c]])
        rotated = hull @ rot.T
        mins, maxs = rotated.min(0), rotated.max(0)
        size = maxs - mins
        area = size[0] * size[1]
        if best is None or area < best[0]:
            center_rot = (mins + maxs) / 2
            center = center_rot @ np.linalg.inv(rot).T
            best = (area, RotatedRect(tuple(center),
                                      (float(size[0]), float(size[1])),
                                      float(angle)))
    return best[1]
