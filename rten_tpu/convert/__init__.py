"""ONNX → `.rten` converter (the analog of rten-convert).

Self-contained: `.onnx` protobufs are parsed with a minimal protobuf
wire-format reader (:mod:`protobuf` + :mod:`onnx_proto`), so the
converter needs no ``onnx`` package. Usage::

    python -m rten_tpu.convert model.onnx [model.rten]
"""

from .converter import convert_bytes, convert_file

__all__ = ["convert_bytes", "convert_file"]
