"""Serialization round-trip coverage for (nearly) every operator type:
build a model containing each op via ModelBuilder, save to the container
format, load, and execute — the reference's ``test_all_op_types`` pattern
(src/model.rs:1079), which is how load-path coverage is achieved without
model files."""

import numpy as np
import pytest

from rten_tpu import Model
from rten_tpu.fmt.model_builder import ModelBuilder
from rten_tpu.fmt.schema import OP_TYPES
from rten_tpu.runtime.executor import RunOptions

rng = np.random.RandomState(0)

F = lambda *s: rng.randn(*s).astype(np.float32)  # noqa: E731
I = lambda *s: rng.randint(0, 2, s).astype(np.int32)  # noqa: E731


def scalar(v):
    return np.float32(v).reshape(())


# op_type → (constant_inputs builder, attrs, n_outputs). Input arrays all
# become graph constants; the model output is the op's first output.
CASES = {}


def case(op_type, inputs, attrs=None, n_outputs=1):
    CASES[op_type] = (inputs, attrs or {}, n_outputs)


x22, x34 = F(2, 2), F(3, 4)
xi = I(2, 3)

for unary in ["Abs", "Acos", "Asin", "Atan", "Ceil", "Cos", "Erf", "Exp",
              "Floor", "Gelu", "HardSwish", "Identity", "Log", "Neg",
              "Reciprocal", "Relu", "Round", "Sigmoid", "Sign", "Silu",
              "Sin", "Softplus", "Sqrt", "Tan", "Tanh"]:
    case(unary, [np.abs(x22) + 0.5])
case("Not", [xi])
for binary in ["Add", "Div", "Max", "Mean", "Min", "Mul", "Pow", "Sub",
               "Sum"]:
    case(binary, [np.abs(x22) + 1, np.abs(x22) + 1])
case("Mod", [I(4) + 1, I(4) + 1], {"fmod": False})
for cmp in ["Equal", "Greater", "GreaterOrEqual", "Less", "LessOrEqual"]:
    case(cmp, [x22, x22])
for logical in ["And", "Or", "Xor"]:
    case(logical, [xi, xi])
case("Where", [xi, F(2, 3), F(2, 3)])
case("Cast", [x22], {"to": 0})
case("Clip", [x22, scalar(-0.5), scalar(0.5)])
case("LeakyRelu", [x22], {"alpha": 0.1})
case("Elu", [x22], {"alpha": 1.0})
case("HardSigmoid", [x22], {"alpha": 0.2, "beta": 0.5})

case("MatMul", [F(2, 3), F(3, 4)])
case("Gemm", [F(2, 3), F(3, 4), F(4)], {"alpha": 1.0, "beta": 1.0})
case("Einsum", [F(2, 3), F(3, 4)], {"equation": "ij,jk->ik"})
case("Conv", [F(1, 2, 5, 5), F(3, 2, 3, 3), F(3)],
     {"auto_pad": 1, "pads": [1, 1, 1, 1], "strides": [1, 1], "groups": 1,
      "dilations": [1, 1]})
case("ConvTranspose", [F(1, 2, 4, 4), F(2, 3, 2, 2), None],
     {"auto_pad": 1, "strides": [2, 2]})
case("MaxPool", [F(1, 2, 4, 4)],
     {"kernel_size": [2, 2], "strides": [2, 2], "auto_pad": 1})
case("AveragePool", [F(1, 2, 4, 4)],
     {"kernel_size": [2, 2], "strides": [2, 2], "auto_pad": 1,
      "count_include_pad": False})
case("GlobalAveragePool", [F(1, 2, 4, 4)])
case("BatchNormalization", [F(1, 3, 2, 2), F(3), F(3), F(3),
                            np.abs(F(3)) + 0.5], {"epsilon": 1e-5})
case("InstanceNormalization", [F(1, 3, 4, 4), F(3), F(3)],
     {"epsilon": 1e-5})
case("LayerNormalization", [F(2, 6), F(6), F(6)],
     {"axis": -1, "epsilon": 1e-5})
case("Softmax", [x34], {"axis": -1})
case("LogSoftmax", [x34], {"axis": -1})

case("ArgMax", [x34], {"axis": 1, "keep_dims": False})
case("ArgMin", [x34], {"axis": 1, "keep_dims": False})
case("CumSum", [x34, np.int32(1).reshape(())])
case("NonZero", [xi])
for red in ["ReduceL2", "ReduceMax", "ReduceMean", "ReduceMin",
            "ReduceProd", "ReduceSum", "ReduceSumSquare"]:
    case(red, [x34], {"axes": [1], "keep_dims": True})
case("TopK", [x34, np.asarray([2], np.int32)],
     {"axis": -1, "largest": True, "sorted": True}, n_outputs=2)

case("Reshape", [x34, np.asarray([4, 3], np.int32)], {"allow_zero": False})
case("Flatten", [F(2, 3, 4)], {"axis": 1})
case("Squeeze", [F(1, 3, 1), np.asarray([0, 2], np.int32)])
case("Unsqueeze", [x34, np.asarray([0], np.int32)])
case("Transpose", [x34], {"perm": [1, 0]})
case("Expand", [F(3, 1), np.asarray([3, 4], np.int32)])
case("Shape", [x34])
case("Size", [x34])
case("Concat", [x34, x34], {"axis": 1})
case("Split", [x34, np.asarray([2, 2], np.int32)], {"axis": 1},
     n_outputs=2)
case("Slice", [x34, np.asarray([1], np.int32), np.asarray([3], np.int32),
               np.asarray([1], np.int32)])
case("Pad", [x34, np.asarray([0, 1, 0, 1], np.int32)])
case("Tile", [x22, np.asarray([2, 2], np.int32)])
case("Trilu", [F(4, 4)], {"upper": True})

case("Gather", [x34, I(2)], {"axis": 0})
case("GatherElements", [x34, np.asarray([[0, 1, 0, 1]], np.int32)],
     {"axis": 0})
case("GatherND", [F(2, 3, 4), np.asarray([[0, 1], [1, 2]], np.int32)],
     {"batch_dims": 0})
case("ScatterElements",
     [np.zeros((3, 4), np.float32), np.asarray([[1, 2]], np.int32),
      F(1, 2)], {"axis": 1, "reduction": 0})
case("ScatterND", [np.zeros((4, 4), np.float32),
                   np.asarray([[0], [2]], np.int32), F(2, 4)],
     {"reduction": 0})
case("OneHot", [I(3), np.int32(4).reshape(()),
                np.asarray([0.0, 1.0], np.float32)], {"axis": -1})

case("ConstantOfShape", [np.asarray([2, 3], np.int32)],
     {"value": ("FloatScalar", {"value": 1.5})})
case("Range", [np.int32(0).reshape(()), np.int32(8).reshape(()),
               np.int32(2).reshape(())])
case("RandomUniform", [], {"shape": [2, 2], "low": 0.0, "high": 1.0})
case("RandomUniformLike", [x22], {"low": 0.0, "high": 1.0})
case("RandomNormal", [], {"shape": [2, 2], "mean": 0.0, "scale": 1.0})
case("RandomNormalLike", [x22], {"mean": 0.0, "scale": 1.0})

case("Resize", [F(1, 1, 4, 4), None, np.asarray([1, 1, 2, 2], np.float32)],
     {"mode": 0, "coord_mode": 1, "nearest_mode": 0})
case("NonMaxSuppression",
     [F(1, 4, 4), np.abs(F(1, 1, 4)), np.asarray([3], np.int32),
      scalar(0.5), scalar(0.0)], {"box_order": 0})
case("GRU", [F(3, 1, 2), F(1, 9, 2), F(1, 9, 3)],
     {"direction": 0, "hidden_size": 3}, n_outputs=2)
case("LSTM", [F(3, 1, 2), F(1, 12, 2), F(1, 12, 3)],
     {"direction": 0, "hidden_size": 3}, n_outputs=3)

case("QuantizeLinear", [x22, scalar(0.05)], {"axis": 1})
case("DequantizeLinear",
     [rng.randint(-127, 128, (2, 2)).astype(np.int8), scalar(0.05)],
     {"axis": 1})
case("DynamicQuantizeLinear", [x22], n_outputs=3)
case("MatMulInteger", [rng.randint(-8, 8, (2, 3)).astype(np.int8),
                       rng.randint(-8, 8, (3, 2)).astype(np.int8)])
case("QLinearMatMul",
     [rng.randint(-8, 8, (2, 3)).astype(np.int8), scalar(0.1),
      np.int8(0).reshape(()), rng.randint(-8, 8, (3, 2)).astype(np.int8),
      scalar(0.1), np.int8(0).reshape(()), scalar(0.1),
      np.int8(0).reshape(())])
case("ConvInteger",
     [rng.randint(-8, 8, (1, 1, 4, 4)).astype(np.int8),
      rng.randint(-8, 8, (2, 1, 3, 3)).astype(np.int8)],
     {"auto_pad": 1, "pads": [1, 1, 1, 1], "strides": [1, 1], "groups": 1,
      "dilations": [1, 1]})
case("FusedSDPA",
     [rng.randn(1, 2, 4, 3).astype(np.float32),
      rng.randn(1, 2, 3, 4).astype(np.float32),
      rng.randn(1, 2, 4, 3).astype(np.float32)],
     {"scale": 0.5, "causal": 1})
case("QLinearConv",
     [rng.randint(-8, 8, (1, 1, 4, 4)).astype(np.int8), scalar(0.1),
      np.int8(0).reshape(()), rng.randint(-8, 8, (2, 1, 3, 3)).astype(np.int8),
      scalar(0.1), np.int8(0).reshape(()), scalar(0.1),
      np.int8(0).reshape(())],
     {"auto_pad": 1, "pads": [1, 1, 1, 1], "strides": [1, 1], "groups": 1,
      "dilations": [1, 1]})

# If is covered by dedicated subgraph tests (capture machinery).
SKIP = {"If"}


def test_every_op_type_has_a_case():
    missing = [t for t in OP_TYPES if t not in CASES and t not in SKIP]
    assert not missing, f"ops without serialization case: {missing}"


@pytest.mark.parametrize("op_type", sorted(CASES), ids=sorted(CASES))
def test_serialize_load_execute(op_type):
    inputs, attrs, n_outputs = CASES[op_type]
    mb = ModelBuilder()
    g = mb.graph
    in_ids = []
    for i, arr in enumerate(inputs):
        if arr is None:
            in_ids.append(None)
        else:
            in_ids.append(g.add_constant(f"c{i}", arr, external=(i % 2 == 0)))
    out = g.add_operator(op_type, in_ids, attrs=attrs or None,
                         outputs=n_outputs, name="op")
    outs = [out] if n_outputs == 1 else out
    g.inputs = []
    g.outputs = outs
    model = Model.load(mb.to_bytes(),
                       options=None)
    results = model.run({}, options=RunOptions(eager=True))
    assert len(results) == n_outputs
    for r in results:
        assert np.asarray(r).size >= 0  # materialized without error
