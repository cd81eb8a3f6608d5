"""Shape primitives (reference: rten-imageproc/src/shapes.rs)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Rect:
    """Axis-aligned rect in (top, left, bottom, right) row/col coords."""
    top: float
    left: float
    bottom: float
    right: float

    @property
    def width(self):
        return self.right - self.left

    @property
    def height(self):
        return self.bottom - self.top

    @property
    def area(self):
        return max(0.0, self.width) * max(0.0, self.height)

    def contains(self, point) -> bool:
        y, x = point
        return self.top <= y < self.bottom and self.left <= x < self.right

    def intersection(self, other: "Rect") -> "Rect":
        return Rect(max(self.top, other.top), max(self.left, other.left),
                    min(self.bottom, other.bottom),
                    min(self.right, other.right))

    def union(self, other: "Rect") -> "Rect":
        return Rect(min(self.top, other.top), min(self.left, other.left),
                    max(self.bottom, other.bottom),
                    max(self.right, other.right))

    def iou(self, other: "Rect") -> float:
        inter = self.intersection(other).area
        union = self.area + other.area - inter
        return inter / union if union > 0 else 0.0


@dataclass(frozen=True)
class RotatedRect:
    """Oriented rect: center (y, x), (height, width), angle in radians."""
    center: tuple
    size: tuple
    angle: float

    def corners(self) -> np.ndarray:
        cy, cx = self.center
        h, w = self.size
        c, s = np.cos(self.angle), np.sin(self.angle)
        half = np.array([[-h / 2, -w / 2], [-h / 2, w / 2],
                         [h / 2, w / 2], [h / 2, -w / 2]])
        rot = np.array([[c, -s], [s, c]])
        return half @ rot.T + np.array([cy, cx])

    @property
    def area(self):
        return self.size[0] * self.size[1]


def bounding_rect(points) -> Rect:
    pts = np.asarray(points, dtype=np.float64)
    return Rect(pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max())
