"""Contour tracing: Suzuki-Abe style border following on binary masks
(reference: rten-imageproc/src/contours.rs). Returns outer contours as
(y, x) point arrays in clockwise order."""

from __future__ import annotations

import numpy as np

# Moore neighborhood in clockwise order starting from "west".
_NEIGHBORS = [(0, -1), (-1, -1), (-1, 0), (-1, 1),
              (0, 1), (1, 1), (1, 0), (1, -1)]


def find_contours(mask) -> list[np.ndarray]:
    """Outer contours of connected components of ``mask`` (nonzero =
    foreground). Border-following with Moore neighborhood."""
    mask = np.asarray(mask) != 0
    h, w = mask.shape
    padded = np.zeros((h + 2, w + 2), bool)
    padded[1:-1, 1:-1] = mask
    visited = np.zeros_like(padded)
    contours = []

    for y in range(1, h + 1):
        for x in range(1, w + 1):
            # Start at a foreground pixel whose left neighbor is background
            # and that hasn't been traced yet.
            if not padded[y, x] or padded[y, x - 1] or visited[y, x]:
                continue
            contour = _trace(padded, visited, y, x)
            contours.append(np.asarray(contour) - 1)  # unpad
    return contours


def _trace(mask, visited, y0, x0):
    contour = [(y0, x0)]
    visited[y0, x0] = True
    # Entered from the west.
    prev_dir = 0
    y, x = y0, x0
    while True:
        found = False
        # Scan clockwise starting just after the direction we came from.
        for i in range(1, 9):
            d = (prev_dir + i) % 8
            dy, dx = _NEIGHBORS[d]
            ny, nx = y + dy, x + dx
            if mask[ny, nx]:
                if (ny, nx) == (y0, x0) and len(contour) > 2:
                    return contour
                contour.append((ny, nx))
                visited[ny, nx] = True
                # Next scan starts from the reverse of where we came from.
                prev_dir = (d + 5) % 8
                y, x = ny, nx
                found = True
                break
        if not found:
            return contour  # isolated pixel
        if len(contour) > mask.size:
            return contour  # safety bound
