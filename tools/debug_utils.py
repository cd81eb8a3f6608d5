"""Binary tensor dump format helpers (reference: tools/debug_utils.py —
part of the debugging trio in docs/debugging.md).

Wire format (little-endian, interoperable with the reference's tooling so
dumps can be exchanged across frameworks):

    [rank: u32] [dims: u32 * rank] [data: f32 * prod(dims)]

Non-f32 arrays are converted to f32 on write (the format carries no dtype
tag), matching the reference tool's f32-only contract.
"""

import math
import struct

import numpy as np


def read_tensor(path: str) -> np.ndarray:
    """Read a tensor written by :func:`write_tensor` (or the reference's
    equivalent tool)."""
    with open(path, "rb") as fh:
        (rank,) = struct.unpack("<I", fh.read(4))
        dims = struct.unpack("<" + "I" * rank, fh.read(4 * rank))
        count = math.prod(dims)
        data = np.fromfile(fh, dtype="<f4", count=count)
    if data.size != count:
        raise ValueError(
            f"{path}: expected {count} f32 values, found {data.size}")
    return data.astype(np.float32).reshape(dims)


def write_tensor(tensor, path: str) -> None:
    """Write ``tensor`` to ``path`` in the binary dump format."""
    # (np.ascontiguousarray would promote 0-d to 1-d; preserve rank.)
    arr = np.asarray(tensor, dtype="<f4", order="C")
    with open(path, "wb") as fh:
        fh.write(struct.pack("<I", arr.ndim))
        fh.write(struct.pack("<" + "I" * arr.ndim, *arr.shape))
        arr.tofile(fh)


def main():  # pragma: no cover - tiny CLI shim
    import argparse

    parser = argparse.ArgumentParser(
        description="Inspect a binary tensor dump")
    parser.add_argument("path")
    args = parser.parse_args()
    arr = read_tensor(args.path)
    print(f"shape {arr.shape} dtype {arr.dtype}")
    print(f"min {arr.min():.6g} max {arr.max():.6g} mean {arr.mean():.6g}")


if __name__ == "__main__":
    main()
