"""Image captioning with a ViT-patch encoder + autoregressive decoder
(reference example: rten-examples/src/distilvit.rs).

    python examples/caption.py [--image photo.jpg] [--max-tokens 16]

The image is cut into 16x16 patches whose flattened pixels feed the
encoder-decoder's source projection (the same bidirectional encoder +
KV-cached cross-attention decoder that serves Whisper); the decoder
generates caption tokens greedily. Random weights demonstrate the
pipeline; trained distilvit-class weights make it a real captioner.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def patchify(img, patch=16):
    """[3, H, W] -> [n_patches, patch*patch*3] raster-order patches."""
    c, h, w = img.shape
    gh, gw = h // patch, w // patch
    img = img[:, :gh * patch, :gw * patch]
    x = img.reshape(c, gh, patch, gw, patch)
    return x.transpose(1, 3, 2, 4, 0).reshape(gh * gw, patch * patch * c)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", default=None)
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--max-tokens", type=int, default=16)
    args = parser.parse_args()

    import jax
    from rten_tpu.models.encoder_decoder import (EncoderDecoderConfig,
                                                 EncoderDecoderLM)

    size, patch = args.size, 16
    n_patches = (size // patch) ** 2
    cfg = EncoderDecoderConfig(
        vocab_size=1000, n_enc_layers=4, n_dec_layers=4, n_heads=8,
        d_model=256, d_ff=1024, n_mels=patch * patch * 3,
        max_source_len=n_patches, max_target_len=64)
    model = EncoderDecoderLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    print("random weights (architecture/pipeline demo)")

    if args.image:
        from rten_tpu.imageio import read_image
        img = read_image(args.image)
        img = np.asarray(jax.image.resize(
            img, (3, size, size), method="bilinear"))
    else:
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([yy, xx, (yy + xx) / 2])
        print("no image given; using a synthetic gradient")

    patches = patchify(img, patch)
    print(f"patch features: {patches.shape}")

    tokens = model.generate(params, patches[None], start_token=1,
                            max_tokens=args.max_tokens, eos_token=2)
    print("caption token ids:", tokens[0].tolist())


if __name__ == "__main__":
    main()
