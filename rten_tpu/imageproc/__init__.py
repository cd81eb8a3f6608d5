"""Geometry + CV post-processing (host-side numpy).

The analog of rten-imageproc: contour tracing (Suzuki border following),
polygon simplification (Douglas-Peucker), convex hull, min-area rect,
shape types, drawing. Used by detection/OCR-style pipelines downstream of
TPU inference.
"""

from .contours import find_contours
from .poly import simplify_polygon, convex_hull, min_area_rect
from .shapes import Rect, RotatedRect, bounding_rect
from .drawing import draw_polygon, fill_rect

__all__ = ["find_contours", "simplify_polygon", "convex_hull",
           "min_area_rect", "Rect", "RotatedRect", "bounding_rect",
           "draw_polygon", "fill_rect"]
