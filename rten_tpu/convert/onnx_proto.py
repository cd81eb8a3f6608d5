"""ONNX protobuf schema as data + reader/writer over
:mod:`rten_tpu.convert.protobuf`.

Field numbers follow the public ``onnx/onnx.proto`` specification
(https://github.com/onnx/onnx/blob/main/onnx/onnx.proto). Only the
messages the converter needs are modeled.
"""

from __future__ import annotations

import struct

import numpy as np

from . import protobuf as pb

# ONNX TensorProto.DataType values.
DT_FLOAT, DT_UINT8, DT_INT8, DT_UINT16, DT_INT16, DT_INT32, DT_INT64 = \
    1, 2, 3, 4, 5, 6, 7
DT_STRING, DT_BOOL, DT_FLOAT16, DT_DOUBLE, DT_UINT32, DT_UINT64 = \
    8, 9, 10, 11, 12, 13

NP_BY_DT = {
    DT_FLOAT: np.float32, DT_UINT8: np.uint8, DT_INT8: np.int8,
    DT_UINT16: np.uint16, DT_INT16: np.int16, DT_INT32: np.int32,
    DT_INT64: np.int64, DT_BOOL: np.bool_, DT_FLOAT16: np.float16,
    DT_DOUBLE: np.float64, DT_UINT32: np.uint32, DT_UINT64: np.uint64,
}

# AttributeProto.AttributeType values.
AT_FLOAT, AT_INT, AT_STRING, AT_TENSOR, AT_GRAPH = 1, 2, 3, 4, 5
AT_FLOATS, AT_INTS, AT_STRINGS = 6, 7, 8


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

def read_model(buf) -> dict:
    model = {"graph": None, "opset": {}, "producer": "", "ir_version": 0}
    for field, wire, value in pb.iter_fields(buf):
        if field == 7:
            model["graph"] = read_graph(value)
        elif field == 8:
            domain, version = "", 0
            for f2, _, v2 in pb.iter_fields(value):
                if f2 == 1:
                    domain = bytes(v2).decode()
                elif f2 == 2:
                    version = v2
            model["opset"][domain] = version
        elif field == 1:
            model["ir_version"] = value
        elif field == 2:
            model["producer"] = bytes(value).decode()
    if model["graph"] is None:
        raise ValueError("ONNX model has no graph")
    return model


def read_graph(buf) -> dict:
    graph = {"nodes": [], "initializers": [], "inputs": [], "outputs": [],
             "value_infos": [], "name": ""}
    for field, wire, value in pb.iter_fields(buf):
        if field == 1:
            graph["nodes"].append(read_node(value))
        elif field == 2:
            graph["name"] = bytes(value).decode()
        elif field == 5:
            graph["initializers"].append(read_tensor(value))
        elif field == 11:
            graph["inputs"].append(read_value_info(value))
        elif field == 12:
            graph["outputs"].append(read_value_info(value))
        elif field == 13:
            graph["value_infos"].append(read_value_info(value))
    return graph


def read_node(buf) -> dict:
    node = {"inputs": [], "outputs": [], "op_type": "", "name": "",
            "attrs": {}}
    for field, wire, value in pb.iter_fields(buf):
        if field == 1:
            node["inputs"].append(bytes(value).decode())
        elif field == 2:
            node["outputs"].append(bytes(value).decode())
        elif field == 3:
            node["name"] = bytes(value).decode()
        elif field == 4:
            node["op_type"] = bytes(value).decode()
        elif field == 5:
            name, attr = read_attribute(value)
            node["attrs"][name] = attr
    return node


def read_attribute(buf):
    name = ""
    atype = 0
    scalar_f = scalar_i = None
    data_s = None
    tensor = None
    graph = None
    floats, ints, strings = [], [], []
    for field, wire, value in pb.iter_fields(buf):
        if field == 1:
            name = bytes(value).decode()
        elif field == 20:
            atype = value
        elif field == 2:
            scalar_f = struct.unpack("<f", value)[0]
        elif field == 3:
            scalar_i = pb.signed64(value)
        elif field == 4:
            data_s = bytes(value)
        elif field == 5:
            tensor = read_tensor(value)
        elif field == 6:
            graph = read_graph(value)
        elif field == 7:
            if wire == 2:   # packed
                floats.extend(struct.unpack(f"<{len(value)//4}f", value))
            else:
                floats.append(struct.unpack("<f", value)[0])
        elif field == 8:
            if wire == 2:
                ints.extend(pb.signed64(v)
                            for v in pb.read_packed_varints(value))
            else:
                ints.append(pb.signed64(value))
        elif field == 9:
            strings.append(bytes(value))
    if atype == AT_FLOAT:
        return name, scalar_f
    if atype == AT_INT:
        return name, scalar_i
    if atype == AT_STRING:
        return name, data_s.decode("utf-8")
    if atype == AT_TENSOR:
        return name, tensor
    if atype == AT_GRAPH:
        return name, graph
    if atype == AT_FLOATS:
        return name, list(floats)
    if atype == AT_INTS:
        return name, list(ints)
    if atype == AT_STRINGS:
        return name, [s.decode("utf-8") for s in strings]
    # Untyped (old exporters): best-effort priority.
    for candidate in (tensor, graph, scalar_i, scalar_f, data_s):
        if candidate is not None:
            return name, candidate
    if ints:
        return name, ints
    if floats:
        return name, floats
    return name, None


def read_tensor(buf) -> dict:
    dims = []
    data_type = DT_FLOAT
    name = ""
    raw = None
    float_data, int32_data, int64_data, double_data = [], [], [], []
    for field, wire, value in pb.iter_fields(buf):
        if field == 1:
            if wire == 2:
                dims.extend(pb.read_packed_varints(value))
            else:
                dims.append(value)
        elif field == 2:
            data_type = value
        elif field == 4:
            if wire == 2:
                float_data.extend(struct.unpack(f"<{len(value)//4}f", value))
            else:
                float_data.append(struct.unpack("<f", value)[0])
        elif field == 5:
            if wire == 2:
                int32_data.extend(pb.read_packed_varints(value))
            else:
                int32_data.append(value)
        elif field == 7:
            if wire == 2:
                int64_data.extend(pb.signed64(v)
                                  for v in pb.read_packed_varints(value))
            else:
                int64_data.append(pb.signed64(value))
        elif field == 8:
            name = bytes(value).decode()
        elif field == 9:
            raw = bytes(value)
        elif field == 10:
            if wire == 2:
                double_data.extend(struct.unpack(f"<{len(value)//8}d", value))
            else:
                double_data.append(struct.unpack("<d", value)[0])
    np_dtype = NP_BY_DT.get(data_type)
    if np_dtype is None:
        raise ValueError(f"unsupported tensor data type {data_type}")
    shape = [int(d) for d in dims]
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype).reshape(shape)
    elif float_data:
        arr = np.asarray(float_data, np.float32).reshape(shape)
    elif int64_data:
        arr = np.asarray(int64_data, np.int64).reshape(shape)
    elif int32_data:
        # int32_data carries int32/int16/int8/bool/uint8/float16 payloads
        arr = np.asarray(int32_data, np.int64).astype(np_dtype).reshape(shape)
    elif double_data:
        arr = np.asarray(double_data, np.float64).reshape(shape)
    else:
        arr = np.zeros(shape, np_dtype)
    return {"name": name, "array": arr, "data_type": data_type}


def read_value_info(buf) -> dict:
    name = ""
    shape = None
    elem_type = None
    for field, wire, value in pb.iter_fields(buf):
        if field == 1:
            name = bytes(value).decode()
        elif field == 2:
            for f2, _, v2 in pb.iter_fields(value):
                if f2 == 1:  # tensor_type
                    for f3, _, v3 in pb.iter_fields(v2):
                        if f3 == 1:
                            elem_type = v3
                        elif f3 == 2:  # TensorShapeProto
                            shape = []
                            for f4, _, v4 in pb.iter_fields(v3):
                                if f4 == 1:  # Dimension
                                    dim = None
                                    for f5, _, v5 in pb.iter_fields(v4):
                                        if f5 == 1:
                                            dim = int(v5)
                                        elif f5 == 2:
                                            dim = bytes(v5).decode()
                                    shape.append(dim)
    return {"name": name, "shape": shape, "elem_type": elem_type}


# ---------------------------------------------------------------------------
# Writing (used by tests and by export tooling)
# ---------------------------------------------------------------------------

def write_tensor(name, array) -> bytes:
    array = np.asarray(array)
    dt = {np.dtype(np.float32): DT_FLOAT, np.dtype(np.int64): DT_INT64,
          np.dtype(np.int32): DT_INT32, np.dtype(np.float16): DT_FLOAT16,
          np.dtype(np.int8): DT_INT8, np.dtype(np.uint8): DT_UINT8,
          np.dtype(np.bool_): DT_BOOL,
          np.dtype(np.float64): DT_DOUBLE}[array.dtype]
    out = pb.field_packed_varints(1, array.shape)
    out += pb.field_varint(2, dt)
    out += pb.field_string(8, name)
    out += pb.field_bytes(9, np.ascontiguousarray(array).tobytes())
    return out


def write_attribute(name, value) -> bytes:
    out = pb.field_string(1, name)
    if isinstance(value, bool):
        out += pb.field_varint(3, int(value)) + pb.field_varint(20, AT_INT)
    elif isinstance(value, int):
        out += pb.field_varint(3, value) + pb.field_varint(20, AT_INT)
    elif isinstance(value, float):
        out += pb.field_float(2, value) + pb.field_varint(20, AT_FLOAT)
    elif isinstance(value, str):
        out += pb.field_string(4, value) + pb.field_varint(20, AT_STRING)
    elif isinstance(value, np.ndarray):
        out += pb.field_bytes(5, write_tensor("", value))
        out += pb.field_varint(20, AT_TENSOR)
    elif isinstance(value, dict):  # graph attr
        out += pb.field_bytes(6, write_graph(value))
        out += pb.field_varint(20, AT_GRAPH)
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], float):
            body = struct.pack(f"<{len(value)}f", *value)
            out += pb.field_bytes(7, body) + pb.field_varint(20, AT_FLOATS)
        elif value and isinstance(value[0], str):
            for s in value:
                out += pb.field_string(9, s)
            out += pb.field_varint(20, AT_STRINGS)
        else:
            out += pb.field_packed_varints(
                8, [v & ((1 << 64) - 1) if v < 0 else v for v in value])
            out += pb.field_varint(20, AT_INTS)
    else:
        raise ValueError(f"unsupported attribute value {value!r}")
    return out


def write_value_info(name, shape=None, elem_type=DT_FLOAT) -> bytes:
    shape_body = b""
    for d in (shape or []):
        if isinstance(d, str):
            dim = pb.field_string(2, d)
        else:
            dim = pb.field_varint(1, int(d))
        shape_body += pb.field_bytes(1, dim)
    tensor_type = pb.field_varint(1, elem_type) + pb.field_bytes(2, shape_body)
    type_proto = pb.field_bytes(1, tensor_type)
    return pb.field_string(1, name) + pb.field_bytes(2, type_proto)


def write_node(op_type, inputs, outputs, attrs=None, name="") -> bytes:
    out = b""
    for i in inputs:
        out += pb.field_string(1, i)
    for o in outputs:
        out += pb.field_string(2, o)
    if name:
        out += pb.field_string(3, name)
    out += pb.field_string(4, op_type)
    for key, value in (attrs or {}).items():
        out += pb.field_bytes(5, write_attribute(key, value))
    return out


def write_graph(graph: dict) -> bytes:
    out = b""
    for node in graph.get("nodes", []):
        out += pb.field_bytes(1, node if isinstance(node, bytes)
                              else write_node(**node))
    out += pb.field_string(2, graph.get("name", "graph"))
    for name, array in graph.get("initializers", []):
        out += pb.field_bytes(5, write_tensor(name, array))
    for vi in graph.get("inputs", []):
        out += pb.field_bytes(11, write_value_info(**vi))
    for vi in graph.get("outputs", []):
        out += pb.field_bytes(12, write_value_info(**vi))
    return out


def write_model(graph: dict, opset_version=17) -> bytes:
    out = pb.field_varint(1, 8)  # ir_version
    out += pb.field_string(2, "rten_tpu-test")
    opset = pb.field_string(1, "") + pb.field_varint(2, opset_version)
    out += pb.field_bytes(8, opset)
    out += pb.field_bytes(7, write_graph(graph))
    return out
