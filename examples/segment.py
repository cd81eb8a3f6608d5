"""Semantic segmentation with a ResNet+ASPP (DeepLab-class) network
(reference example: rten-examples/src/deeplab.rs).

    python examples/segment.py [--image photo.jpg] [--out mask.png]

Outputs a per-pixel class map; with --out, writes a color-coded mask.
Random weights demonstrate the pipeline (the mask is arbitrary); load
trained weights via models/checkpoint.py for real segmentation.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# PASCAL-VOC-style color table (class -> RGB), reference deeplab.rs.
PALETTE = np.array(
    [[0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0], [0, 0, 128],
     [128, 0, 128], [0, 128, 128], [128, 128, 128], [64, 0, 0],
     [192, 0, 0], [64, 128, 0], [192, 128, 0], [64, 0, 128],
     [192, 0, 128], [64, 128, 128], [192, 128, 128], [0, 64, 0],
     [128, 64, 0], [0, 192, 0], [128, 192, 0], [0, 64, 128]], np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--weights", default=None,
                        help="npz checkpoint from models/checkpoint.py")
    parser.add_argument("--depth", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from rten_tpu.models.resnet import ResNetConfig
    from rten_tpu.models.segmentation import SegmentationConfig, Segmenter

    size = args.size
    cfg = SegmentationConfig(backbone=ResNetConfig(args.depth))
    model = Segmenter(cfg)
    if args.weights:
        from rten_tpu.models.checkpoint import load_params
        params = load_params(args.weights)
    else:
        print("using random weights (pass --weights for real masks)")
        params = model.init_params(jax.random.PRNGKey(0))

    if args.image:
        from rten_tpu.imageio import read_image
        img = np.asarray(jax.image.resize(
            jnp.asarray(read_image(args.image)), (3, size, size),
            method="bilinear"))[None]
    else:
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([yy, xx, (yy + xx) / 2])[None]
        print("no image given; using a synthetic gradient")

    predict = jax.jit(model.predict)
    t0 = time.perf_counter()
    mask = np.asarray(predict(params, jnp.asarray(img)))[0]
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    mask = np.asarray(predict(params, jnp.asarray(img)))[0]
    t_steady = time.perf_counter() - t0

    classes, counts = np.unique(mask, return_counts=True)
    print(f"mask {mask.shape}; classes present: "
          f"{dict(zip(classes.tolist(), counts.tolist()))}")
    print(f"first (incl. compile) {t_first:.2f}s; steady {t_steady*1e3:.1f}ms")

    if args.out:
        from PIL import Image
        rgb = PALETTE[mask % len(PALETTE)]
        Image.fromarray(rgb).save(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
