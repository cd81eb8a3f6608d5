"""ImageNet classification through the `.rten` graph runtime
(reference example: rten-examples/src/imagenet.rs).

    python examples/imagenet_classify.py image.jpg \
        [--model resnet50.rten] [--emit-model resnet50.rten]

Without --model, a random-weight ResNet-50 is built and (optionally)
saved as a `.rten` file — demonstrating the full container→IR→XLA path.
Real classification needs converted weights (see rten_tpu.convert for
ONNX→rten conversion).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("image", nargs="?", default=None)
    parser.add_argument("--model", default=None)
    parser.add_argument("--emit-model", default=None)
    parser.add_argument("--topk", type=int, default=5)
    args = parser.parse_args()

    from rten_tpu import Model
    from rten_tpu.imageio import (IMAGENET_MEAN, IMAGENET_STD, normalize,
                                  read_image)

    if args.model:
        model = Model.load_file(args.model)
    else:
        import jax
        from rten_tpu.models.resnet import ResNet, ResNetConfig
        print("building random-weight ResNet-50 (.rten path demo)")
        net = ResNet(ResNetConfig(depth=50))
        mb = net.build_rten(net.init_params(jax.random.PRNGKey(0)))
        if args.emit_model:
            mb.save(args.emit_model)
            print(f"wrote {args.emit_model}")
        model = Model.load(mb.to_bytes())
    print(f"model: {model.num_params():,} params")

    if args.image:
        chw = read_image(args.image)
        # center-crop/resize to 224 via simple numpy ops
        from rten_tpu.ops.resize import resize as _  # noqa: F401
        import jax.numpy as jnp
        import jax.image
        img = jax.image.resize(jnp.asarray(chw), (3, 224, 224), "bilinear")
        x = normalize(np.asarray(img), IMAGENET_MEAN, IMAGENET_STD)
    else:
        print("no image given; using random input")
        x = np.random.RandomState(0).randn(3, 224, 224).astype(np.float32)

    logits = np.asarray(model.run({"input": x[None]})[0])[0]
    top = np.argsort(-logits)[:args.topk]
    for i, cls in enumerate(top):
        print(f"  #{i + 1}: class {cls} (logit {logits[cls]:.3f})")


if __name__ == "__main__":
    main()
