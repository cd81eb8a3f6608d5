"""Promptable segmentation, Segment-Anything-class
(reference example: rten-examples/src/segment_anything.rs).

    python examples/segment_anything.py [--image photo.jpg] \
        [--point 0.5,0.5] [--out mask.png]

Pipeline: image → ViT encoder (run once per image) → point prompts →
two-way-attention mask decoder → mask logits + IoU quality score. The
decoder is tiny, so new prompts re-run only it against the cached image
embedding — the interactive-segmentation serving pattern.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None)
    parser.add_argument("--point", action="append", default=None,
                        help="x,y in [0,1] (repeatable); prefix '-' for "
                             "a background point")
    parser.add_argument("--out", default=None)
    parser.add_argument("--size", type=int, default=224)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from rten_tpu.models.sam import SAM, SAMConfig
    from rten_tpu.models.vit import ViTConfig

    size = args.size
    cfg = SAMConfig(vit=ViTConfig(image_size=size, patch_size=16,
                                  d_model=384, n_layers=12, n_heads=6,
                                  d_ff=1536, use_cls_token=False))
    model = SAM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    print("random weights (architecture/pipeline demo)")

    if args.image:
        from rten_tpu.imageio import read_image
        img = np.asarray(jax.image.resize(
            jnp.asarray(read_image(args.image)), (3, size, size),
            method="bilinear"))[None]
    else:
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([yy, xx, (yy + xx) / 2])[None]
        print("no image given; using a synthetic gradient")

    raw_points = args.point or ["0.5,0.5"]
    pts = np.zeros((1, cfg.max_points, 2), np.float32)
    labels = np.zeros((1, cfg.max_points), np.int32)
    for i, p in enumerate(raw_points[:cfg.max_points]):
        fg = not p.startswith("-")
        x, y = map(float, p.lstrip("-").split(","))
        pts[0, i] = [x, y]
        labels[0, i] = int(fg)
    n_points = np.asarray([len(raw_points)], np.int32)

    predict = jax.jit(model.predict)
    t0 = time.perf_counter()
    mask_logits, iou = predict(params, jnp.asarray(img), jnp.asarray(pts),
                               jnp.asarray(labels), jnp.asarray(n_points))
    mask = np.asarray(mask_logits)[0] > 0
    print(f"mask covers {mask.mean() * 100:.1f}% of the image; "
          f"predicted IoU {float(iou[0]):.3f} "
          f"({time.perf_counter() - t0:.2f}s incl. compile)")

    if args.out:
        from PIL import Image
        Image.fromarray((mask * 255).astype(np.uint8)).save(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
