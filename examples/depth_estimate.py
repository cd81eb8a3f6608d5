"""Monocular depth estimation with the ViT+DPT family
(reference example: rten-examples/src/depth_anything.rs).

    python examples/depth_estimate.py [--image photo.jpg] [--out depth.png]

Without --image a synthetic gradient image is used (architecture demo —
random weights produce relative-depth-shaped output, not real depth).
With trained weights loaded via models/checkpoint.py this is the full
depth-anything-class pipeline: image → ViT patches → encoder → DPT head
→ per-pixel relative depth, normalized for visualization.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--weights", default=None,
                        help="npz checkpoint from models/checkpoint.py")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.models.vit import DepthConfig, DepthEstimator, ViTConfig

    size = args.size
    cfg = DepthConfig(vit=ViTConfig(image_size=size, patch_size=16,
                                    d_model=384, n_layers=12, n_heads=6,
                                    d_ff=1536, use_cls_token=False))
    model = DepthEstimator(cfg)
    if args.weights:
        from rten_tpu.models.checkpoint import load_params
        params = load_params(args.weights)
    else:
        print("using random weights (pass --weights for real depth)")
        params = model.init_params(jax.random.PRNGKey(0))

    if args.image:
        from rten_tpu.imageio import read_image
        img = read_image(args.image)
        img = np.asarray(jax.image.resize(
            jnp.asarray(img), (3, size, size), method="bilinear"))[None]
    else:
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([yy, xx, (yy + xx) / 2])[None]

    predict = jax.jit(model.predict)
    t0 = time.perf_counter()
    depth = np.asarray(predict(params, jnp.asarray(img)))[0]
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    depth = np.asarray(predict(params, jnp.asarray(img)))[0]
    t_steady = time.perf_counter() - t0

    lo, hi = float(depth.min()), float(depth.max())
    print(f"depth map {depth.shape}, range [{lo:.3f}, {hi:.3f}]; "
          f"{t_steady * 1000:.1f} ms/image steady "
          f"({t_first:.1f} s incl. compile)")
    if args.out:
        from PIL import Image
        norm = ((depth - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        Image.fromarray(norm).save(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
