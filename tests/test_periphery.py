"""Tests for imageproc / imageio / CTC periphery."""

import numpy as np
import pytest

from rten_tpu.ctc import ctc_beam_search_decode, ctc_greedy_decode
from rten_tpu.imageproc import (Rect, bounding_rect, convex_hull,
                                find_contours, min_area_rect,
                                simplify_polygon)
from rten_tpu.imageproc.drawing import draw_polygon, fill_rect


def test_rect_geometry():
    a = Rect(0, 0, 4, 4)
    b = Rect(2, 2, 6, 6)
    assert a.area == 16
    assert a.intersection(b).area == 4
    assert a.union(b) == Rect(0, 0, 6, 6)
    assert abs(a.iou(b) - 4 / 28) < 1e-9
    assert a.contains((1, 1)) and not a.contains((5, 5))


def test_bounding_rect():
    r = bounding_rect([(1, 2), (5, 3), (0, 7)])
    assert (r.top, r.left, r.bottom, r.right) == (0, 2, 5, 7)


def test_find_contours_square():
    mask = np.zeros((10, 10), np.uint8)
    mask[2:7, 3:8] = 1
    contours = find_contours(mask)
    assert len(contours) == 1
    pts = contours[0]
    r = bounding_rect(pts)
    assert (r.top, r.left, r.bottom, r.right) == (2, 3, 6, 7)


def test_find_contours_two_components():
    mask = np.zeros((10, 10), np.uint8)
    mask[1:3, 1:3] = 1
    mask[6:9, 5:9] = 1
    contours = find_contours(mask)
    assert len(contours) == 2


def test_find_contours_hollow_rect():
    """Suzuki-Abe on a rect outline: one outer border + one hole border
    (reference semantics: rten-imageproc/src/contours.rs hollow-rect
    test)."""
    from rten_tpu.imageproc.contours import find_contours_hierarchy
    mask = np.zeros((20, 20), np.uint8)
    mask[5:12, 5:12] = 1
    mask[7:10, 7:10] = 0
    contours, kinds, parents = find_contours_hierarchy(mask)
    assert kinds == ["outer", "hole"]
    assert parents[0] == -1 and parents[1] == 0
    # Outer border covers the rect boundary; hole border rings the hole.
    r = bounding_rect(contours[0])
    assert (r.top, r.left, r.bottom, r.right) == (5, 5, 11, 11)
    rh = bounding_rect(contours[1])
    assert (rh.top, rh.left, rh.bottom, rh.right) == (6, 6, 10, 10)
    # External mode hides the hole; list mode keeps both.
    assert len(find_contours(mask, "external")) == 1
    assert len(find_contours(mask, "list")) == 2


def test_find_contours_nested_hierarchy():
    """Island inside a hole inside a component: outer → hole → outer
    parent chain; external retrieval returns only the outermost."""
    from rten_tpu.imageproc.contours import find_contours_hierarchy
    mask = np.zeros((16, 16), np.uint8)
    mask[2:13, 2:13] = 1
    mask[4:11, 4:11] = 0
    mask[6:9, 6:9] = 1
    contours, kinds, parents = find_contours_hierarchy(mask)
    assert kinds == ["outer", "hole", "outer"]
    assert parents == [-1, 0, 1]
    assert len(find_contours(mask, "external")) == 1
    assert len(find_contours(mask, "list")) == 3


def test_find_contours_touching_frame():
    mask = np.ones((5, 5), np.uint8)
    contours = find_contours(mask, "list")
    assert len(contours) == 1
    r = bounding_rect(contours[0])
    assert (r.top, r.left, r.bottom, r.right) == (0, 0, 4, 4)


def test_find_contours_single_pixel_and_line():
    mask = np.zeros((5, 5), np.uint8)
    mask[2, 2] = 1
    contours = find_contours(mask, "list")
    assert len(contours) == 1 and contours[0].tolist() == [[2, 2]]
    mask = np.zeros((5, 5), np.uint8)
    mask[2, 1:4] = 1
    (c,) = find_contours(mask, "list")
    # 1-px line traces out and back.
    assert c.tolist() == [[2, 1], [2, 2], [2, 3], [2, 2]]


def test_simplify_polygon():
    # Points on a line collapse to endpoints.
    line = [(0, 0), (1, 1.01), (2, 2), (3, 2.99), (4, 4)]
    out = simplify_polygon(line, epsilon=0.1)
    assert len(out) == 2
    # A real corner survives.
    corner = [(0, 0), (0, 5), (5, 5)]
    out = simplify_polygon(corner, epsilon=0.1)
    assert len(out) == 3


def test_convex_hull():
    pts = [(0, 0), (0, 4), (4, 0), (4, 4), (2, 2), (1, 3)]
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert set(map(tuple, hull)) == {(0, 0), (0, 4), (4, 0), (4, 4)}


def test_min_area_rect_axis_aligned():
    pts = [(0, 0), (0, 4), (2, 0), (2, 4)]
    rr = min_area_rect(pts)
    assert abs(rr.area - 8) < 1e-6


def test_min_area_rect_rotated():
    # A thin diagonal strip: min-area rect must be much smaller than the
    # axis-aligned bounding box.
    t = np.linspace(0, 10, 30)
    pts = np.stack([t, t], 1) + np.random.RandomState(0).randn(30, 2) * 0.05
    rr = min_area_rect(pts)
    bb = bounding_rect(pts)
    assert rr.area < 0.3 * bb.area


def test_drawing():
    img = np.zeros((8, 8), np.uint8)
    draw_polygon(img, [(1, 1), (1, 6), (6, 6), (6, 1)])
    assert img[1, 1] and img[1, 6] and img[6, 6]
    assert img[3, 3] == 0
    img2 = np.zeros((8, 8), np.uint8)
    draw_polygon(img2, [(1, 1), (1, 6), (6, 6), (6, 1)], fill=True)
    assert img2[3, 3] == 1
    img3 = np.zeros((8, 8), np.uint8)
    fill_rect(img3, Rect(2, 2, 5, 5))
    assert img3[2:5, 2:5].all() and img3.sum() == 9


def test_ctc_greedy():
    # classes: 0=blank, 1='a', 2='b'
    logp = np.log(np.asarray([
        [0.1, 0.8, 0.1],
        [0.1, 0.8, 0.1],   # repeat of 'a' collapses
        [0.8, 0.1, 0.1],   # blank
        [0.1, 0.1, 0.8],   # 'b'
    ], np.float32))
    hyp = ctc_greedy_decode(logp)
    assert hyp.labels() == [1, 2]


def test_ctc_greedy_repeat_after_blank():
    logp = np.log(np.asarray([
        [0.1, 0.8, 0.1],
        [0.8, 0.1, 0.1],
        [0.1, 0.8, 0.1],
    ], np.float32))
    assert ctc_greedy_decode(logp).labels() == [1, 1]


def test_ctc_beam_matches_greedy_on_peaked_dist():
    rng = np.random.RandomState(0)
    probs = rng.dirichlet([0.2] * 4, size=6).astype(np.float32)
    # Make it peaked so best-path == best-prefix.
    probs = probs ** 4
    probs /= probs.sum(1, keepdims=True)
    logp = np.log(probs)
    greedy = ctc_greedy_decode(logp).labels()
    beams = ctc_beam_search_decode(logp, beam_size=8)
    assert beams[0].labels() == greedy


def test_ctc_beam_sums_paths():
    # Distribution where greedy picks blank everywhere but summing paths
    # prefers label 1: p(blank)=0.4, p(1)=0.6 split across paths.
    logp = np.log(np.asarray([
        [0.4, 0.6],
        [0.4, 0.6],
    ], np.float32))
    beams = ctc_beam_search_decode(logp, beam_size=4)
    assert beams[0].labels() == [1]


def test_imageio_roundtrip(tmp_path):
    from rten_tpu.imageio import read_image, write_image, normalize
    rng = np.random.RandomState(0)
    chw = rng.rand(3, 8, 8).astype(np.float32)
    path = tmp_path / "img.png"
    write_image(path, chw)
    back = read_image(path)
    assert back.shape == (3, 8, 8)
    assert np.abs(back - chw).max() < 2 / 255
    norm = normalize(back, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    assert norm.min() >= -1.01 and norm.max() <= 1.01
