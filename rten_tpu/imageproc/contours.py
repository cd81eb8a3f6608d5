"""Contour tracing: the Suzuki-Abe border-following algorithm on binary
masks (reference: rten-imageproc/src/contours.rs:86-330, which follows
the same paper/OpenCV ``findContours``; this implementation also keeps
the paper's NBD labels, so hole borders AND the full border hierarchy
come out — the reference labels outer/hole sides but skips hierarchy).

Suzuki & Abe, "Topological structural analysis of digitized binary
images by border following", CVGIP 30 (1985).
"""

from __future__ import annotations

import numpy as np

# Moore neighborhood in CLOCKWISE order starting from "west".
_NB = [(0, -1), (-1, -1), (-1, 0), (-1, 1),
       (0, 1), (1, 1), (1, 0), (1, -1)]
_NB_INDEX = {d: i for i, d in enumerate(_NB)}


def _find_nonzero(f, cy, cx, start_dir, clockwise, skip_first):
    """Scan the 8-neighborhood of (cy, cx) from ``start_dir`` for a
    nonzero pixel. Returns (dir_index, examined_east) where
    ``examined_east`` is True if the east neighbor was inspected while
    zero BEFORE the hit (the paper's step 3.3 condition that decides
    -NBD labeling)."""
    step = 1 if clockwise else -1
    idx = (start_dir + step) % 8 if skip_first else start_dir
    examined_east = False
    for _ in range(8):
        dy, dx = _NB[idx]
        if f[cy + dy, cx + dx] != 0:
            return idx, examined_east
        if idx == 4:                      # east examined and was zero
            examined_east = True
        idx = (idx + step) % 8
    return None, examined_east


def find_contours_hierarchy(mask):
    """Full Suzuki-Abe analysis. Returns ``(contours, kinds, parents)``:

    * ``contours``: list of (y, x) int arrays — border points in trace
      order (outer borders counter-clockwise, hole borders clockwise,
      matching OpenCV/the reference);
    * ``kinds``: "outer" or "hole" per contour;
    * ``parents``: parent contour index per contour (-1 = top level).
      An outer border's parent is its enclosing hole border (or none);
      a hole border's parent is its enclosing outer border.
    """
    mask = np.asarray(mask)
    if mask.size == 0:
        return [], [], []
    h, w = mask.shape
    # i16 working image: 1 = object, ±NBD = border labels; padding lets
    # components touch the frame edge (frame = border 1 in the paper).
    f = np.zeros((h + 2, w + 2), np.int32)
    f[1:-1, 1:-1] = (mask != 0)

    contours: list[np.ndarray] = []
    kinds: list[str] = []
    parents: list[int] = []
    # Border bookkeeping: index 0 ≙ NBD 2 (NBD 1 is the frame).
    # border_kind[i] / border_parent[i] align with contours[i].
    nbd = 1

    for y in range(1, h + 1):
        lnbd = 1                       # frame border
        for x in range(1, w + 1):
            fyx = f[y, x]
            if fyx == 0:
                continue
            start_dir = None
            if fyx == 1 and f[y, x - 1] == 0:
                outer = True
                start_dir = _NB_INDEX[(0, -1)]       # west
            elif fyx >= 1 and f[y, x + 1] == 0:
                outer = False
                start_dir = _NB_INDEX[(0, 1)]        # east
                if fyx > 1:
                    lnbd = fyx
            if start_dir is None:
                if fyx != 1:
                    lnbd = abs(fyx)
                continue

            nbd += 1
            this_idx = len(contours)
            # Parent decision (paper table 1): relative to border LNBD.
            if lnbd <= 1:
                parent = -1
            else:
                p = lnbd - 2           # contour index of border LNBD
                same = (kinds[p] == "hole") == (not outer)
                parent = parents[p] if same else p
            kinds.append("outer" if outer else "hole")
            parents.append(parent)

            border = []
            hit, _ = _find_nonzero(f, y, x, start_dir, clockwise=True,
                                   skip_first=False)
            if hit is None:
                # Single-pixel border.
                f[y, x] = -nbd
                border.append((y, x))
            else:
                dy, dx = _NB[hit]
                i1 = (y + dy, x + dx)
                i2, i3 = i1, (y, x)
                while True:
                    # CCW search around i3 starting just after i2.
                    start = _NB_INDEX[(i2[0] - i3[0], i2[1] - i3[1])]
                    hit, east0 = _find_nonzero(f, i3[0], i3[1], start,
                                               clockwise=False,
                                               skip_first=True)
                    dy, dx = _NB[hit]
                    i4 = (i3[0] + dy, i3[1] + dx)
                    border.append(i3)
                    if east0:
                        f[i3] = -nbd
                    elif f[i3] == 1:
                        f[i3] = nbd
                    if i4 == (y, x) and i3 == i1:
                        break
                    i2, i3 = i3, i4
            contours.append(np.asarray(border, np.int64) - 1)  # unpad
            if f[y, x] != 1:           # paper step (4)
                lnbd = abs(f[y, x])
    return contours, kinds, parents


def find_contours(mask, mode: str = "external") -> list[np.ndarray]:
    """Contours of connected components of ``mask`` (nonzero =
    foreground), Suzuki-Abe border following.

    ``mode``: "external" — outer-most borders only (the reference's
    ``RetrievalMode::External``); "list" — all borders, outer and hole,
    without hierarchy (``RetrievalMode::List``). Use
    :func:`find_contours_hierarchy` for kinds + parent tree.
    """
    contours, kinds, parents = find_contours_hierarchy(mask)
    if mode == "list":
        return contours
    if mode == "external":
        return [c for c, k, p in zip(contours, kinds, parents)
                if k == "outer" and p == -1]
    raise ValueError(f"unknown retrieval mode {mode!r}")
