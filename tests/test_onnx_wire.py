"""Independent wire-format validation of emitted ONNX files.

interop/onnx_proto.py hand-encodes protobuf; its own decoder shares the
encoder's assumptions, so this test parses emitted files with the REAL
Google protobuf runtime (shipped with TensorFlow) against a dynamically
built subset of the public onnx.proto3 schema — any wire-format error
(wrong tags/wire types/lengths, bad varint signs, broken packing) fails
here even if the in-repo round trip is self-consistent.
"""

import numpy as np
import pytest

pytest.importorskip("google.protobuf")

from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

from btsbot_tpu import init_model, normalize_config
from btsbot_tpu.interop.onnx_export import export_onnx

F = descriptor_pb2.FieldDescriptorProto


def _onnx_schema_pool():
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "onnx_subset.proto"
    fdp.package = "onnxsub"
    fdp.syntax = "proto3"

    def msg(name):
        m = fdp.message_type.add()
        m.name = name
        return m

    def field(m, name, number, ftype, label=F.LABEL_OPTIONAL,
              type_name=None):
        f = m.field.add()
        f.name, f.number, f.type, f.label = name, number, ftype, label
        if type_name:
            f.type_name = f".onnxsub.{type_name}"

    t = msg("TensorProto")
    field(t, "dims", 1, F.TYPE_INT64, F.LABEL_REPEATED)
    field(t, "data_type", 2, F.TYPE_INT32)
    field(t, "name", 8, F.TYPE_STRING)
    field(t, "raw_data", 9, F.TYPE_BYTES)

    a = msg("AttributeProto")
    field(a, "name", 1, F.TYPE_STRING)
    field(a, "f", 2, F.TYPE_FLOAT)
    field(a, "i", 3, F.TYPE_INT64)
    field(a, "s", 4, F.TYPE_BYTES)
    field(a, "t", 5, F.TYPE_MESSAGE, type_name="TensorProto")
    field(a, "floats", 7, F.TYPE_FLOAT, F.LABEL_REPEATED)
    field(a, "ints", 8, F.TYPE_INT64, F.LABEL_REPEATED)
    field(a, "type", 20, F.TYPE_INT32)

    n = msg("NodeProto")
    field(n, "input", 1, F.TYPE_STRING, F.LABEL_REPEATED)
    field(n, "output", 2, F.TYPE_STRING, F.LABEL_REPEATED)
    field(n, "name", 3, F.TYPE_STRING)
    field(n, "op_type", 4, F.TYPE_STRING)
    field(n, "attribute", 5, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          "AttributeProto")

    dim = msg("Dimension")
    field(dim, "dim_value", 1, F.TYPE_INT64)
    field(dim, "dim_param", 2, F.TYPE_STRING)
    shape = msg("TensorShapeProto")
    field(shape, "dim", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED, "Dimension")
    tt = msg("Tensor")
    field(tt, "elem_type", 1, F.TYPE_INT32)
    field(tt, "shape", 2, F.TYPE_MESSAGE, type_name="TensorShapeProto")
    tp = msg("TypeProto")
    field(tp, "tensor_type", 1, F.TYPE_MESSAGE, type_name="Tensor")
    vi = msg("ValueInfoProto")
    field(vi, "name", 1, F.TYPE_STRING)
    field(vi, "type", 2, F.TYPE_MESSAGE, type_name="TypeProto")

    g = msg("GraphProto")
    field(g, "node", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED, "NodeProto")
    field(g, "name", 2, F.TYPE_STRING)
    field(g, "initializer", 5, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          "TensorProto")
    field(g, "input", 11, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          "ValueInfoProto")
    field(g, "output", 12, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          "ValueInfoProto")

    op = msg("OperatorSetIdProto")
    field(op, "domain", 1, F.TYPE_STRING)
    field(op, "version", 2, F.TYPE_INT64)

    mdl = msg("ModelProto")
    field(mdl, "ir_version", 1, F.TYPE_INT64)
    field(mdl, "producer_name", 2, F.TYPE_STRING)
    field(mdl, "graph", 7, F.TYPE_MESSAGE, type_name="GraphProto")
    field(mdl, "opset_import", 8, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          "OperatorSetIdProto")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return pool


def test_emitted_onnx_parses_with_real_protobuf(tmp_path):
    pool = _onnx_schema_pool()
    Model = message_factory.GetMessageClass(
        pool.FindMessageTypeByName("onnxsub.ModelProto"))

    config = normalize_config({
        "model_name": "mm_cnn", "train_data_version": "v",
        "metadata_cols": [f"m{i}" for i in range(25)],
        "conv1_channels": 8, "conv2_channels": 8, "conv_kernel": 5,
        "conv_dropout1": 0.1, "conv_dropout2": 0.1,
        "meta_fc1_neurons": 8, "meta_fc2_neurons": 8, "meta_dropout": 0.1,
        "comb_fc1_neurons": 8, "comb_fc2_neurons": 8, "comb_dropout": 0.1,
    })
    _, variables = init_model(config, rng=0)
    path = str(tmp_path / "m.onnx")
    export_onnx(config, variables, path)

    m = Model()
    with open(path, "rb") as f:
        leftover = m.ParseFromString(f.read())
    assert m.ir_version == 8
    assert m.producer_name == "btsbot-tpu"
    assert m.opset_import[0].version == 17 and m.opset_import[0].domain == ""

    # reference deployment contract survives a third-party parse
    assert [i.name for i in m.graph.input] == ["image", "metadata"]
    img_dims = m.graph.input[0].type.tensor_type.shape.dim
    assert img_dims[0].dim_param == "batch"
    assert [d.dim_value for d in img_dims[1:]] == [3, 63, 63]
    assert [o.name for o in m.graph.output] == ["logits"]
    assert m.graph.output[0].type.tensor_type.elem_type == 1  # FLOAT

    ops = {n.op_type for n in m.graph.node}
    assert {"Conv", "MaxPool", "Gemm", "BatchNormalization", "Relu",
            "Concat", "Flatten"} <= ops

    # weights decode from raw_data to the exact exported arrays
    from btsbot_tpu.interop.export import variables_to_torch_state_dict
    sd = variables_to_torch_state_dict(config, variables)
    by_name = {t.name: t for t in m.graph.initializer}
    conv_inits = [t for t in m.graph.initializer
                  if t.name.startswith("conv_layers.0.weight")]
    assert conv_inits
    t = conv_inits[0]
    arr = np.frombuffer(t.raw_data, np.float32).reshape(list(t.dims))
    np.testing.assert_array_equal(arr, sd["conv_layers.0.weight"])

    # negative attribute ints (e.g. LayerNorm/Softmax axis=-1) are a known
    # varint footgun — check one end to end on a model that has them
    cfg2 = normalize_config({
        "model_name": "ConvNeXt", "train_data_version": "v",
        "metadata_cols": [f"m{i}" for i in range(25)],
        "model_kind": "convnext_atto.d2_in1k",
        "fc1_neurons": 8, "fc2_neurons": 8, "dropout": 0.1})
    _, v2 = init_model(cfg2, rng=0)
    path2 = str(tmp_path / "c.onnx")
    export_onnx(cfg2, v2, path2)
    m2 = Model()
    with open(path2, "rb") as f:
        m2.ParseFromString(f.read())
    ln = [n for n in m2.graph.node if n.op_type == "LayerNormalization"]
    assert ln
    attrs = {a.name: a for a in ln[0].attribute}
    assert attrs["axis"].i == -1
    assert attrs["epsilon"].f == pytest.approx(1e-6)
