"""Compare two saved tensors and print abs-diff statistics
(reference: tools/compare-tensors.py — the debugging trio in
docs/debugging.md). Accepts .npy/.npz files and the binary ``.bin``
dump format written by tools/debug_utils.py / tools/rten_infer.py.

    python tools/compare_tensors.py a.npy b.bin [--rtol 1e-4]
"""

import argparse
import sys

import numpy as np


def load(path):
    if path.endswith(".bin"):
        import os
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.debug_utils import read_tensor
        return read_tensor(path)
    arr = np.load(path, allow_pickle=False)
    if hasattr(arr, "files"):  # npz: first array
        arr = arr[arr.files[0]]
    return np.asarray(arr)


def compare(a, b, rtol=1e-4, atol=1e-5):
    print(f"A: shape {a.shape} dtype {a.dtype}")
    print(f"B: shape {b.shape} dtype {b.dtype}")
    if a.shape != b.shape:
        print("SHAPE MISMATCH")
        return 1
    diff = np.abs(a.astype(np.float64) - b.astype(np.float64))
    denom = np.maximum(np.abs(b.astype(np.float64)), 1e-12)
    rel = diff / denom
    print(f"max abs diff: {diff.max():.6g}  mean: {diff.mean():.6g}")
    print(f"max rel diff: {rel.max():.6g}  mean: {rel.mean():.6g}")
    n_bad = int((diff > atol + rtol * np.abs(b)).sum())
    print(f"elements out of tolerance (rtol={rtol}, atol={atol}): "
          f"{n_bad} / {a.size}")
    if n_bad:
        worst = np.unravel_index(diff.argmax(), diff.shape)
        print(f"worst at {worst}: A={a[worst]!r} B={b[worst]!r}")
    return 1 if n_bad else 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("a")
    parser.add_argument("b")
    parser.add_argument("--rtol", type=float, default=1e-4)
    parser.add_argument("--atol", type=float, default=1e-5)
    args = parser.parse_args()
    return compare(load(args.a), load(args.b), args.rtol, args.atol)


if __name__ == "__main__":
    sys.exit(main())
