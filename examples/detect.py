"""Object detection with DETR + box drawing
(reference examples: detr.rs + rten-imageproc drawing).

    python examples/detect.py [image.jpg] [--out annotated.png]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("image", nargs="?", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from rten_tpu.models.detr import Detr, DetrConfig, postprocess

    cfg = DetrConfig.tiny_test()
    model = Detr(cfg)
    params = model.init_params(None)
    print("random weights (pipeline demo; convert real DETR weights for "
          "actual detections)")

    if args.image:
        from rten_tpu.imageio import read_image
        chw = read_image(args.image)
        h = (chw.shape[1] // 32) * 32 or 32
        w = (chw.shape[2] // 32) * 32 or 32
        chw = chw[:, :h, :w]
    else:
        chw = np.random.RandomState(0).rand(3, 96, 96).astype(np.float32)

    logits, boxes = jax.jit(model.forward)(params, jnp.asarray(chw[None]))
    dets = postprocess(logits, boxes, score_threshold=args.threshold)[0]
    print(f"{len(dets)} detections above {args.threshold}")
    for label, score, (cx, cy, bw, bh) in dets[:10]:
        print(f"  class {label}  score {score:.2f}  "
              f"box cxcywh=({cx:.2f},{cy:.2f},{bw:.2f},{bh:.2f})")

    if args.out:
        from rten_tpu.imageio import write_image
        from rten_tpu.imageproc.drawing import draw_polygon
        img = np.ascontiguousarray(chw.transpose(1, 2, 0))
        h, w = img.shape[:2]
        for _, _, (cx, cy, bw, bh) in dets:
            y0, y1 = (cy - bh / 2) * h, (cy + bh / 2) * h
            x0, x1 = (cx - bw / 2) * w, (cx + bw / 2) * w
            for c in range(3):
                draw_polygon(img[:, :, c],
                             [(y0, x0), (y0, x1), (y1, x1), (y1, x0)],
                             value=1.0 if c == 0 else 0.0)
        write_image(args.out, img.transpose(2, 0, 1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
