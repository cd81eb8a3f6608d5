"""Image ↔ tensor IO (reference: rten-imageio/src/lib.rs): read an image
as CHW float32 in [0, 1], write back. Uses PIL (baked into the image)."""

from __future__ import annotations

import numpy as np


def read_image(path, dtype=np.float32):
    """Load an image file → CHW float tensor scaled to [0, 1]."""
    from PIL import Image
    with Image.open(path) as img:
        img = img.convert("RGB")
        arr = np.asarray(img, dtype=dtype) / 255.0
    return arr.transpose(2, 0, 1)


def write_image(path, chw):
    from PIL import Image
    arr = np.asarray(chw)
    if arr.ndim != 3:
        raise ValueError("expected CHW tensor")
    hwc = np.clip(arr.transpose(1, 2, 0) * 255.0, 0, 255).astype(np.uint8)
    if hwc.shape[2] == 1:
        hwc = hwc[:, :, 0]
    Image.fromarray(hwc).save(path)


def normalize(chw, mean, std):
    """Channel-wise (x - mean) / std, e.g. ImageNet normalization."""
    mean = np.asarray(mean, dtype=chw.dtype).reshape(-1, 1, 1)
    std = np.asarray(std, dtype=chw.dtype).reshape(-1, 1, 1)
    return (chw - mean) / std

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
