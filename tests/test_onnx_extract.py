"""tools/onnx_extract.py: dependency-free ONNX initializer parsing + the
ArcFace MXNet-name -> flax-tree mapping (reference eval harness uses
InsightFace model-r100-ii, ``compute_pose_identity_error.py:86-95``; the
public ONNX export preserves the MXNet initializer names).

The wire-format test hand-encodes a ModelProto (no onnx package in this
environment); the mapping test inverts the mapping from a small flax
ArcFaceR100 and checks numeric equality end-to-end.
"""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from onnx_extract import extract_initializers, iter_fields, map_arcface  # noqa: E402


# --- minimal protobuf wire encoder (test-side only) -----------------------

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _field(num, wire, payload):
    key = _varint((num << 3) | wire)
    if wire == 2:
        return key + _varint(len(payload)) + payload
    return key + payload


def _tensor_proto(name, arr, use_raw=True):
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(1))  # FLOAT
    msg += _field(8, 2, name.encode())
    if use_raw:
        msg += _field(9, 2, arr.astype("<f4").tobytes())
    else:  # packed float_data
        msg += _field(4, 2, struct.pack(f"<{arr.size}f",
                                        *arr.reshape(-1).tolist()))
    return msg


def _model_proto(tensors, use_raw=True):
    graph = b""
    graph += _field(2, 2, b"testgraph")  # GraphProto.name
    for name, arr in tensors.items():
        graph += _field(5, 2, _tensor_proto(name, arr, use_raw))
    model = _field(1, 0, _varint(8))  # ir_version
    model += _field(7, 2, graph)
    return model


@pytest.mark.parametrize("use_raw", [True, False])
def test_extract_initializers_roundtrip(tmp_path, use_raw):
    rng = np.random.RandomState(0)
    tensors = {
        "conv0_weight": rng.randn(4, 3, 3, 3).astype(np.float32),
        "bn0_gamma": rng.randn(4).astype(np.float32),
        "scalar": np.float32(rng.randn()).reshape(()),
    }
    path = tmp_path / "m.onnx"
    path.write_bytes(_model_proto(tensors, use_raw))

    out = extract_initializers(str(path))
    assert set(out) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])


def test_iter_fields_varint_and_fixed():
    buf = _field(3, 0, _varint(300)) + _field(4, 5, struct.pack("<f", 2.5))
    fields = list(iter_fields(buf))
    assert fields[0][:2] == (3, 0) and fields[0][2] == 300
    assert fields[1][:2] == (4, 5)
    assert struct.unpack("<f", fields[1][2])[0] == 2.5


def test_extract_rejects_non_onnx(tmp_path):
    p = tmp_path / "junk.onnx"
    p.write_bytes(_field(1, 0, _varint(8)))  # ModelProto without graph
    with pytest.raises(ValueError, match="no GraphProto"):
        extract_initializers(str(p))


# --- ArcFace mapping: invert from flax, map back, compare numerics --------

def _flax_to_mxnet_initializers(variables, final_channels):
    """Inverse of map_arcface for our small ArcFaceR100 config."""
    init = {}

    def conv_inv(k):  # HWIO -> OIHW
        return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))

    params = variables["params"]
    stats = variables["batch_stats"]

    def put_bn(mx, ours):
        p, s = params, stats
        for part in ours.split("/")[:-1]:
            p, s = p[part], s[part]
        leaf = ours.split("/")[-1]
        init[f"{mx}_gamma"] = np.asarray(p[leaf]["scale"])
        init[f"{mx}_beta"] = np.asarray(p[leaf]["bias"])
        init[f"{mx}_moving_mean"] = np.asarray(s[leaf]["mean"])
        init[f"{mx}_moving_var"] = np.asarray(s[leaf]["var"])

    init["conv0_weight"] = conv_inv(params["conv0"]["kernel"])
    put_bn("bn0", "bn0")
    init["relu0_gamma"] = np.asarray(params["prelu0"]["alpha"])

    for scope, tree in params.items():
        if not scope.startswith("stage"):
            continue
        init[f"{scope}_conv1_weight"] = conv_inv(tree["conv1"]["kernel"])
        init[f"{scope}_conv2_weight"] = conv_inv(tree["conv2"]["kernel"])
        put_bn(f"{scope}_bn1", f"{scope}/bn1")
        put_bn(f"{scope}_bn2", f"{scope}/bn2")
        put_bn(f"{scope}_bn3", f"{scope}/bn3")
        init[f"{scope}_relu1_gamma"] = np.asarray(tree["prelu"]["alpha"])
        if "conv1sc" in tree:
            init[f"{scope}_conv1sc_weight"] = conv_inv(
                tree["conv1sc"]["kernel"])
            put_bn(f"{scope}_sc", f"{scope}/sc")

    put_bn("bn1", "bn1")
    fc_k = np.asarray(params["fc1"]["kernel"])  # (H*W*C, out)
    out_dim = fc_k.shape[1]
    spatial = int(round((fc_k.shape[0] // final_channels) ** 0.5))
    k = fc_k.reshape(spatial, spatial, final_channels, out_dim)
    init["pre_fc1_weight"] = np.ascontiguousarray(
        k.transpose(3, 2, 0, 1).reshape(out_dim, -1))
    init["pre_fc1_bias"] = np.asarray(params["fc1"]["bias"])
    put_bn("fc1", "fc1_bn")
    return init


def test_map_arcface_numeric_roundtrip():
    import jax

    from latentpose_tpu.eval.arcface import ArcFaceR100
    from latentpose_tpu.utils.weights import load_flat_npz_variables

    model = ArcFaceR100(embedding_size=16, stage_blocks=(1, 2),
                        stage_features=(8, 16))
    rng = np.random.RandomState(1)
    x = rng.randint(0, 255, (2, 16, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # randomize batch_stats so BN actually tests the mean/var mapping
    variables = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rng.uniform(0.1, 0.5, a.shape)
        .astype(np.float32), variables)

    init = _flax_to_mxnet_initializers(variables, final_channels=16)
    mapped = map_arcface(init, final_channels=16)
    rebuilt = load_flat_npz_variables(mapped)

    expected = model.apply(variables, x, train=False)
    got = model.apply(rebuilt, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-6, atol=1e-6)


def test_map_arcface_warns_on_unmapped(capsys):
    out = map_arcface({"something_else": np.zeros(3, np.float32)})
    assert out == {}
    assert "unmapped" in capsys.readouterr().err
