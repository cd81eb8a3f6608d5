"""ONNX graph → `.rten` conversion.

Semantics mirror the reference's rten-convert
(rten-convert/rten_convert/converter.py): dtype coercions (i64/bool→i32,
fp16/f64→f32), attr→input promotion for ops whose attributes became
inputs in later opsets (Clip, Squeeze, Slice, ...), loud errors on
unsupported attributes, If-subgraph captures — plus the quantized
extension ops (QuantizeLinear family) from the rten_tpu schema.
"""

from __future__ import annotations

import numpy as np

from ..fmt.model_builder import GraphBuilder, ModelBuilder
from ..fmt import schema
from . import onnx_proto as op


class ConversionError(ValueError):
    pass


def _coerce(array: np.ndarray) -> np.ndarray:
    """The reference's dtype coercions (converter.py:434-495)."""
    if array.dtype == np.int64:
        clipped = np.clip(array, np.iinfo(np.int32).min,
                          np.iinfo(np.int32).max)
        return clipped.astype(np.int32)
    if array.dtype in (np.bool_, np.uint8, np.int16, np.uint16, np.uint32,
                       np.uint64):
        return array.astype(np.int32)
    if array.dtype in (np.float16, np.float64):
        return array.astype(np.float32)
    return array


_ENUM = schema.ENUMS


def _auto_pad(attrs, out):
    mode = attrs.pop("auto_pad", "NOTSET")
    if mode in ("SAME_UPPER", "SAME_LOWER"):
        # SAME_LOWER maps to the appended SameLower enum (exact: excess
        # padding at the start; the reference converter approximates it
        # as SAME_UPPER, rten-convert converter.py:522).
        out["auto_pad"] = _ENUM["AutoPad"].index(
            "SameLower" if mode == "SAME_LOWER" else "Same")
    elif mode in ("NOTSET", "VALID", ""):
        out["auto_pad"] = _ENUM["AutoPad"].index("NotSet")
        pads = attrs.pop("pads", None)
        if pads and mode != "VALID":
            n = len(pads) // 2
            if n == 2:
                # ONNX [t,l,b,r] == rten [top,left,bottom,right]
                out["pads"] = [int(p) for p in pads]
            elif n == 1:
                out["pads"] = [int(pads[0]), int(pads[1])]
            else:
                raise ConversionError(f"unsupported pads rank {n}")
    else:
        raise ConversionError(f"unsupported auto_pad {mode!r}")


def _require_default(op_type, attrs, name, default):
    value = attrs.pop(name, default)
    if isinstance(default, list):
        ok = value == default or all(v == default[0] for v in value)
    else:
        ok = value == default
    if not ok:
        raise ConversionError(
            f"{op_type}: unsupported value {value!r} for attribute {name!r}")


class _OnnxGraphConverter:
    """Converts one ONNX GraphProto dict into a GraphBuilder."""

    def __init__(self, mb: ModelBuilder, builder: GraphBuilder,
                 outer_names: dict | None = None):
        self.mb = mb
        self.g = builder
        self.names: dict[str, int] = {}       # ONNX name → node id
        self.outer = outer_names or {}

    def constant(self, array, name=None) -> int:
        node_id = self.g.add_constant(name, _coerce(np.asarray(array)))
        if name:
            self.names[name] = node_id
        return node_id

    def input_id(self, name):
        if not name:
            return None
        if name in self.names:
            return self.names[name]
        if name in self.outer:
            # Captured from the enclosing scope: add a capture value node.
            node_id = self.g.add_value(name)
            self.g.captures.append(node_id)
            self.names[name] = node_id
            return node_id
        raise ConversionError(f"unknown input {name!r}")

    def convert(self, graph: dict):
        initialized = set()
        for tensor in graph["initializers"]:
            self.constant(tensor["array"], tensor["name"])
            initialized.add(tensor["name"])
        for vi in graph["inputs"]:
            if vi["name"] in initialized:
                continue
            node_id = self.g.add_value(vi["name"], vi.get("shape"))
            self.names[vi["name"]] = node_id
            self.g.inputs.append(node_id)
        for node in graph["nodes"]:
            self.convert_node(node)
        for vi in graph["outputs"]:
            if vi["name"] not in self.names:
                raise ConversionError(f"missing output {vi['name']!r}")
            self.g.outputs.append(self.names[vi["name"]])

    # -- node conversion ---------------------------------------------------

    def convert_node(self, node: dict):
        op_type = node["op_type"]
        attrs = dict(node["attrs"])
        handler = getattr(self, f"op_{op_type}", None)
        if handler is not None:
            handler(node, attrs)
            return
        if op_type not in schema.OP_TYPE_ID:
            raise ConversionError(f"unsupported operator {op_type!r}")
        self.emit(node, op_type, self.map_attrs(op_type, attrs))

    def emit(self, node, op_type, rten_attrs=None, extra_inputs=(),
             inputs=None):
        in_ids = [self.input_id(n) for n in (inputs if inputs is not None
                                             else node["inputs"])]
        in_ids.extend(extra_inputs)
        outputs = node["outputs"]
        out_ids = self.g.add_operator(
            op_type, in_ids, attrs=rten_attrs or None,
            outputs=len(outputs), name=node.get("name") or None)
        if len(outputs) == 1:
            out_ids = [out_ids]
        for name, node_id in zip(outputs, out_ids):
            if name:
                # rename the output value node to the ONNX name
                self.g.nodes[node_id]["name"] = name
                self.names[name] = node_id

    # -- generic attr mapping ----------------------------------------------

    def map_attrs(self, op_type, attrs) -> dict:
        out = {}
        if op_type in ("Conv", "QLinearConv", "ConvInteger"):
            _auto_pad(attrs, out)
            if "strides" in attrs:
                out["strides"] = [int(s) for s in attrs.pop("strides")]
            if "dilations" in attrs:
                out["dilations"] = [int(d) for d in attrs.pop("dilations")]
            out["groups"] = int(attrs.pop("group", 1))
            attrs.pop("kernel_shape", None)  # implied by weight shape
        elif op_type == "ConvTranspose":
            _auto_pad(attrs, out)
            if "strides" in attrs:
                out["strides"] = [int(s) for s in attrs.pop("strides")]
            if "output_padding" in attrs:
                out["output_padding"] = [int(v) for v in
                                         attrs.pop("output_padding")]
            out["groups"] = int(attrs.pop("group", 1))
            if "dilations" in attrs:
                out["dilations"] = [int(d) for d in attrs.pop("dilations")]
            attrs.pop("kernel_shape", None)
            _require_default(op_type, attrs, "output_shape", None)
        elif op_type in ("MaxPool", "AveragePool"):
            _auto_pad(attrs, out)
            out["kernel_size"] = [int(k) for k in attrs.pop("kernel_shape")]
            if "strides" in attrs:
                out["strides"] = [int(s) for s in attrs.pop("strides")]
            if op_type == "AveragePool":
                out["count_include_pad"] = bool(
                    attrs.pop("count_include_pad", 0))
            _require_default(op_type, attrs, "ceil_mode", 0)
            _require_default(op_type, attrs, "dilations", [1, 1])
            attrs.pop("storage_order", None)
        elif op_type == "Gemm":
            out["alpha"] = float(attrs.pop("alpha", 1.0))
            out["beta"] = float(attrs.pop("beta", 1.0))
            out["transpose_a"] = bool(attrs.pop("transA", 0))
            out["transpose_b"] = bool(attrs.pop("transB", 0))
        elif op_type == "Cast":
            to = attrs.pop("to")
            if to in (op.DT_INT64, op.DT_INT32, op.DT_BOOL, op.DT_INT8,
                      op.DT_UINT8, op.DT_INT16, op.DT_UINT16):
                out["to"] = _ENUM["DataType"].index("Int32")
            else:
                out["to"] = _ENUM["DataType"].index("Float")
        elif op_type in ("Softmax", "LogSoftmax"):
            out["axis"] = int(attrs.pop("axis", -1))
        elif op_type in ("Concat", "Gather", "GatherElements", "OneHot"):
            default = -1 if op_type == "OneHot" else 0
            out["axis"] = int(attrs.pop("axis", default))
        elif op_type == "Flatten":
            out["axis"] = int(attrs.pop("axis", 1))
        elif op_type in ("ArgMax", "ArgMin"):
            out["axis"] = int(attrs.pop("axis", 0))
            out["keep_dims"] = bool(attrs.pop("keepdims", 1))
            _require_default(op_type, attrs, "select_last_index", 0)
        elif op_type.startswith("Reduce"):
            axes = attrs.pop("axes", None)
            if axes is not None:
                out["axes"] = [int(a) for a in axes]
            out["keep_dims"] = bool(attrs.pop("keepdims", 1))
            _require_default(op_type, attrs, "noop_with_empty_axes", 0)
        elif op_type in ("BatchNormalization", "InstanceNormalization"):
            out["epsilon"] = float(attrs.pop("epsilon", 1e-5))
            attrs.pop("momentum", None)
            _require_default(op_type, attrs, "training_mode", 0)
        elif op_type == "LayerNormalization":
            out["axis"] = int(attrs.pop("axis", -1))
            out["epsilon"] = float(attrs.pop("epsilon", 1e-5))
            attrs.pop("stash_type", None)
        elif op_type == "LeakyRelu":
            out["alpha"] = float(attrs.pop("alpha", 0.01))
        elif op_type == "Elu":
            out["alpha"] = float(attrs.pop("alpha", 1.0))
        elif op_type == "HardSigmoid":
            out["alpha"] = float(attrs.pop("alpha", 0.2))
            out["beta"] = float(attrs.pop("beta", 0.5))
        elif op_type == "Mod":
            out["fmod"] = bool(attrs.pop("fmod", 0))
        elif op_type == "Transpose":
            perm = attrs.pop("perm", None)
            if perm is not None:
                out["perm"] = [int(p) for p in perm]
        elif op_type == "Reshape":
            out["allow_zero"] = bool(attrs.pop("allowzero", 0))
        elif op_type == "Einsum":
            out["equation"] = attrs.pop("equation")
        elif op_type in ("GRU", "LSTM"):
            direction = attrs.pop("direction", "forward")
            out["direction"] = {"forward": 0, "reverse": 1,
                                "bidirectional": 2}[direction]
            out["hidden_size"] = int(attrs.pop("hidden_size"))
            if op_type == "GRU":
                out["linear_before_reset"] = bool(
                    attrs.pop("linear_before_reset", 0))
            for key in ("activations", "activation_alpha",
                        "activation_beta", "clip", "input_forget"):
                if key in attrs:
                    raise ConversionError(
                        f"{op_type}: attribute {key!r} unsupported")
            attrs.pop("layout", None)
        elif op_type == "Resize":
            mode = attrs.pop("mode", "nearest")
            if mode not in ("nearest", "linear"):
                raise ConversionError(f"Resize mode {mode!r} unsupported")
            out["mode"] = _ENUM["ResizeMode"].index(
                "Nearest" if mode == "nearest" else "Linear")
            coord = attrs.pop("coordinate_transformation_mode", "half_pixel")
            coord_map = {"half_pixel": "HalfPixel",
                         "asymmetric": "Asymmetric",
                         "align_corners": "AlignCorners"}
            if coord not in coord_map:
                raise ConversionError(f"Resize coord mode {coord!r}")
            out["coord_mode"] = _ENUM["CoordTransformMode"].index(
                coord_map[coord])
            nearest = attrs.pop("nearest_mode", "round_prefer_floor")
            nearest_map = {"floor": "Floor", "ceil": "Ceil",
                           "round_prefer_floor": "RoundPreferFloor",
                           "round_prefer_ceil": "RoundPreferCeil"}
            out["nearest_mode"] = _ENUM["NearestMode"].index(
                nearest_map[nearest])
            for key in ("antialias", "exclude_outside"):
                _require_default(op_type, attrs, key, 0)
            attrs.pop("cubic_coeff_a", None)
            attrs.pop("extrapolation_value", None)
            attrs.pop("axes", None)
            attrs.pop("keep_aspect_ratio_policy", None)
        elif op_type == "NonMaxSuppression":
            out["box_order"] = (_ENUM["NMSBoxOrder"].index("CenterWidthHeight")
                                if attrs.pop("center_point_box", 0)
                                else _ENUM["NMSBoxOrder"].index(
                                    "TopLeftBottomRight"))
        elif op_type in ("ScatterElements", "ScatterND"):
            if op_type == "ScatterElements":
                out["axis"] = int(attrs.pop("axis", 0))
            reduction = attrs.pop("reduction", "none")
            red_map = {"none": "None", "add": "Add", "mul": "Mul",
                       "min": "Min", "max": "Max"}
            out["reduction"] = _ENUM["ScatterReduction"].index(
                red_map[reduction])
        elif op_type == "TopK":
            out["axis"] = int(attrs.pop("axis", -1))
            out["largest"] = bool(attrs.pop("largest", 1))
            out["sorted"] = bool(attrs.pop("sorted", 1))
        elif op_type == "Trilu":
            out["upper"] = bool(attrs.pop("upper", 1))
        elif op_type == "GatherND":
            out["batch_dims"] = int(attrs.pop("batch_dims", 0))
        elif op_type == "Gelu":
            approx = attrs.pop("approximate", "none")
            if approx not in ("none", ""):
                raise ConversionError("Gelu tanh approximation unsupported")
        elif op_type in ("QuantizeLinear", "DequantizeLinear"):
            out["axis"] = int(attrs.pop("axis", 1))
            attrs.pop("saturate", None)
            _require_default(op_type, attrs, "block_size", 0)
        elif op_type == "Split":
            out["axis"] = int(attrs.pop("axis", 0))
            attrs.pop("num_outputs", None)
        elif op_type == "CumSum":
            _require_default(op_type, attrs, "exclusive", 0)
            _require_default(op_type, attrs, "reverse", 0)
        elif op_type == "ConstantOfShape":
            tensor = attrs.pop("value", None)
            if tensor is None:
                out["value"] = ("FloatScalar", {"value": 0.0})
            else:
                arr = tensor["array"].reshape(-1)
                if np.issubdtype(arr.dtype, np.integer):
                    out["value"] = ("IntScalar", {"value": int(arr[0])})
                else:
                    out["value"] = ("FloatScalar", {"value": float(arr[0])})
        if attrs:
            raise ConversionError(
                f"{op_type}: unsupported attributes {sorted(attrs)}")
        return out

    # -- special-cased ops --------------------------------------------------

    def op_Constant(self, node, attrs):
        for key in ("value", "value_float", "value_int", "value_floats",
                    "value_ints"):
            if key in attrs:
                value = attrs[key]
                array = (value["array"] if isinstance(value, dict)
                         else np.asarray(value))
                node_id = self.constant(array, node["outputs"][0])
                return node_id
        raise ConversionError("Constant node without supported value attr")

    def op_Dropout(self, node, attrs):
        # Inference: identity (the reference converter does the same).
        self.emit({**node, "inputs": node["inputs"][:1],
                   "outputs": node["outputs"][:1]}, "Identity")

    def op_Clip(self, node, attrs):
        # Opset <11 carries min/max as attrs: promote to constant inputs
        # (reference converter.py:664-666).
        inputs = list(node["inputs"])
        extra = []
        if len(inputs) < 2 and "min" in attrs:
            extra.append(self.constant(np.float32(attrs.pop("min"))))
        if len(inputs) < 3 and "max" in attrs:
            if len(extra) == 0 and len(inputs) < 2:
                extra.append(self.constant(np.float32("-inf")))
            extra.append(self.constant(np.float32(attrs.pop("max"))))
        attrs.pop("min", None)
        attrs.pop("max", None)
        self.emit(node, "Clip", extra_inputs=extra)

    def _promote_ints_attr(self, node, attrs, attr_name):
        extra = []
        if attr_name in attrs and len(node["inputs"]) < 2:
            extra.append(self.constant(
                np.asarray(attrs.pop(attr_name), np.int32)))
        return extra

    def op_Squeeze(self, node, attrs):
        extra = self._promote_ints_attr(node, attrs, "axes")
        self.emit(node, "Squeeze", extra_inputs=extra)

    def op_Unsqueeze(self, node, attrs):
        extra = self._promote_ints_attr(node, attrs, "axes")
        self.emit(node, "Unsqueeze", extra_inputs=extra)

    def op_Slice(self, node, attrs):
        extra = []
        if "starts" in attrs and len(node["inputs"]) < 2:
            extra.append(self.constant(np.asarray(attrs.pop("starts"),
                                                  np.int32)))
            extra.append(self.constant(np.asarray(attrs.pop("ends"),
                                                  np.int32)))
            if "axes" in attrs:
                extra.append(self.constant(np.asarray(attrs.pop("axes"),
                                                      np.int32)))
        self.emit(node, "Slice", extra_inputs=extra)

    def op_Pad(self, node, attrs):
        mode = attrs.pop("mode", "constant")
        modes = {"constant": 0, "reflect": 1, "edge": 2, "wrap": 3}
        if mode not in modes:
            raise ConversionError(f"Pad mode {mode!r} unsupported")
        rten_attrs = {"mode": modes[mode]} if modes[mode] else None
        extra = []
        if "pads" in attrs and len(node["inputs"]) < 2:
            extra.append(self.constant(np.asarray(attrs.pop("pads"),
                                                  np.int32)))
            if "value" in attrs:
                extra.append(self.constant(np.float32(attrs.pop("value"))))
        self.emit(node, "Pad", rten_attrs, extra_inputs=extra)

    def op_Split(self, node, attrs):
        extra = []
        if "split" in attrs and len(node["inputs"]) < 2:
            extra.append(self.constant(np.asarray(attrs.pop("split"),
                                                  np.int32)))
        out = {"axis": int(attrs.pop("axis", 0))}
        attrs.pop("num_outputs", None)
        if attrs:
            raise ConversionError(f"Split: unsupported attrs {sorted(attrs)}")
        self.emit(node, "Split", rten_attrs=out, extra_inputs=extra)

    def op_If(self, node, attrs):
        then_graph = attrs.pop("then_branch")
        else_graph = attrs.pop("else_branch")
        branches = {}
        for key, sub in (("then_branch", then_graph),
                         ("else_branch", else_graph)):
            sub_builder = self.mb.subgraph()
            conv = _OnnxGraphConverter(self.mb, sub_builder,
                                       outer_names={**self.outer,
                                                    **self.names})
            conv.convert(sub)
            branches[key] = sub_builder
        self.emit(node, "If", rten_attrs=branches)

    def op_Upsample(self, node, attrs):
        # Deprecated op: map to Resize(nearest/linear, asymmetric).
        mode = attrs.pop("mode", "nearest")
        out = {
            "mode": _ENUM["ResizeMode"].index(
                "Nearest" if mode == "nearest" else "Linear"),
            "coord_mode": _ENUM["CoordTransformMode"].index("Asymmetric"),
            "nearest_mode": _ENUM["NearestMode"].index("Floor"),
        }
        extra = []
        inputs = list(node["inputs"])
        if "scales" in attrs and len(inputs) < 2:
            extra.append(None)  # roi missing
            extra.append(self.constant(
                np.asarray(attrs.pop("scales"), np.float32)))
            self.emit(node, "Resize", rten_attrs=out, extra_inputs=extra)
            return
        # scales provided as input 1: Resize expects (x, roi, scales)
        self.emit(node, "Resize", rten_attrs=out,
                  inputs=[inputs[0], "", inputs[1]])
    op_Upsample.__doc__ = "Upsample → Resize"


def convert_bytes(onnx_bytes) -> bytes:
    """Convert a serialized ONNX model to `.rten` container bytes."""
    model = op.read_model(onnx_bytes)
    mb = ModelBuilder()
    conv = _OnnxGraphConverter(mb, mb.graph)
    conv.convert(model["graph"])
    mb.metadata = {"description": f"converted from ONNX "
                   f"(producer {model['producer'] or 'unknown'})"}
    return mb.to_bytes()


def convert_file(onnx_path, rten_path=None) -> str:
    rten_path = rten_path or str(onnx_path).rsplit(".", 1)[0] + ".rten"
    with open(onnx_path, "rb") as f:
        data = f.read()
    out = convert_bytes(data)
    with open(rten_path, "wb") as f:
        f.write(out)
    return rten_path


def main(argv=None):
    import sys
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m rten_tpu.convert model.onnx [model.rten]")
        return 1
    out = convert_file(args[0], args[1] if len(args) > 1 else None)
    print(f"wrote {out}")
    return 0
