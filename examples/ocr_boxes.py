"""Text-detection post-processing demo: probability mask → contours →
rotated boxes (the ocrs-style pipeline the reference's imageproc crate
serves; reference: rten-imageproc contours/min_area_rect).

    python examples/ocr_boxes.py [mask.png]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from rten_tpu.imageproc import find_contours, min_area_rect, simplify_polygon

    if len(sys.argv) > 1:
        from rten_tpu.imageio import read_image
        mask = (read_image(sys.argv[1]).mean(0) > 0.5)
    else:
        # Synthetic "text lines": three rotated bars.
        from rten_tpu.imageproc.drawing import draw_polygon
        mask = np.zeros((120, 200), np.uint8)
        for i, (y, ang) in enumerate([(20, 0.0), (55, 0.1), (95, -0.15)]):
            length, height = 150, 12
            c, s = np.cos(ang), np.sin(ang)
            pts = []
            for dy, dx in [(-height / 2, -length / 2), (-height / 2, length / 2),
                           (height / 2, length / 2), (height / 2, -length / 2)]:
                pts.append((y + dy * c + dx * s, 100 + dx * c - dy * s))
            draw_polygon(mask, pts, value=1, fill=True)
        print("using synthetic 3-line mask")

    contours = find_contours(mask)
    print(f"{len(contours)} word/line regions")
    for i, contour in enumerate(contours):
        poly = simplify_polygon(contour, epsilon=2.0)
        rect = min_area_rect(contour)
        print(f"  region {i}: {len(contour)} boundary px → "
              f"{len(poly)}-gon; rotated box center=({rect.center[0]:.0f},"
              f"{rect.center[1]:.0f}) size=({rect.size[0]:.0f},"
              f"{rect.size[1]:.0f}) angle={np.degrees(rect.angle):.1f}°")


if __name__ == "__main__":
    main()
