"""Dependency-free ONNX weight extractor (+ ArcFace-r100 mapper).

The reference's eval harness uses InsightFace's MXNet model-r100-ii for
identity descriptors (``/root/reference/compute_pose_identity_error.py:86-95``).
The portable route to those weights on a TPU stack is the public ONNX export
(onnx/models `arcfaceresnet100-8.onnx`, same LResNet100E-IR graph).  This
environment has neither `onnx` nor `mxnet` installed — but an .onnx file is
just a protobuf, and extracting initializer tensors only needs the wire
format.  This tool parses it directly:

    python tools/onnx_extract.py model.onnx out.npz            # raw dump
    python tools/onnx_extract.py model.onnx arcface_r100.npz --map arcface

``--map arcface`` converts MXNet-convention initializer names
(conv0_weight, bn0_gamma, stageX_unitY_*, pre_fc1_*, fc1_*) into the flax
parameter tree of ``latentpose_tpu/eval/arcface.py`` (NHWC kernels, flatten
order corrected for the final dense layer), saved flat as
'path/to/leaf' -> array, loadable by ``eval/backends.ArcFaceBackend``.

Wire-format facts used (see onnx.proto3):
  ModelProto.graph = field 7; GraphProto.initializer = field 5 (TensorProto);
  TensorProto: dims=1 (varint, repeated), data_type=2 (varint), name=8
  (bytes), raw_data=9 (bytes), float_data=4 (packed floats),
  int64_data=7 (packed varints), int32_data=5 (packed varints).
"""

from __future__ import annotations

import argparse
import re
import struct
import sys

import numpy as np

# TensorProto.DataType -> numpy
ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf):
    """Yield (field_number, wire_type, value) over one protobuf message.

    wire_type 0 -> varint int; 1 -> 8 raw bytes; 2 -> bytes; 5 -> 4 raw
    bytes.  Groups (3/4) are not used by ONNX.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire} (field {field})")
        yield field, wire, val


def _parse_tensor(buf):
    """TensorProto -> (name, ndarray)."""
    dims, dtype, name = [], 1, ""
    raw = None
    float_data, int_data = [], []
    for field, wire, val in iter_fields(buf):
        if field == 1:  # dims: varint (possibly packed)
            if wire == 0:
                dims.append(val)
            else:
                pos = 0
                while pos < len(val):
                    d, pos = _read_varint(val, pos)
                    dims.append(d)
        elif field == 2:
            dtype = val
        elif field == 8:
            name = val.decode("utf-8")
        elif field == 9:
            raw = val
        elif field == 4:  # float_data
            if wire == 5:
                float_data.append(struct.unpack("<f", val)[0])
            else:
                float_data.extend(
                    struct.unpack(f"<{len(val) // 4}f", val))
        elif field in (5, 7):  # int32_data / int64_data
            if wire == 0:
                int_data.append(val)
            else:
                pos = 0
                while pos < len(val):
                    d, pos = _read_varint(val, pos)
                    int_data.append(d)
    np_dtype = ONNX_DTYPES.get(dtype)
    if np_dtype is None:
        raise ValueError(f"tensor {name!r}: unsupported data_type {dtype}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif float_data:
        arr = np.asarray(float_data, np.float32).astype(np_dtype)
    elif int_data:
        arr = np.asarray(int_data, np.int64).astype(np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr


def extract_initializers(path):
    """Parse a .onnx file -> {initializer_name: ndarray}."""
    with open(path, "rb") as f:
        model = f.read()
    graphs = [val for field, _, val in iter_fields(model) if field == 7]
    if not graphs:
        raise ValueError(f"{path}: no GraphProto (field 7) in ModelProto — "
                         "not an ONNX model file?")
    out = {}
    stack = list(graphs)
    while stack:  # include subgraphs (field 5 of GraphProto is initializer)
        g = stack.pop()
        for field, _, val in iter_fields(g):
            if field == 5:
                name, arr = _parse_tensor(val)
                out[name] = arr
    return out


# ---------------------------------------------------------------------------
# ArcFace LResNet100E-IR: MXNet initializer names -> flax tree of
# eval/arcface.py.  MXNet convention (preserved by the official ONNX export):
#   conv0_weight; bn0_{gamma,beta,moving_mean,moving_var}; relu0_gamma;
#   stage{S}_unit{U}_bn1_*; ..._conv1_weight; ..._relu1_gamma;
#   ..._conv2_weight; ..._bn3_*; ..._conv1sc_weight; ..._sc_*;
#   bn1_* (pre-head); pre_fc1_{weight,bias}; fc1_{gamma,beta,...}.
# ---------------------------------------------------------------------------

_BN_LEAVES = {"gamma": ("params", "scale"), "beta": ("params", "bias"),
              "moving_mean": ("batch_stats", "mean"),
              "moving_var": ("batch_stats", "var")}


def _conv_kernel(arr):
    """MXNet/ONNX OIHW -> flax HWIO."""
    return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))


def map_arcface(initializers, final_channels=512):
    """Return flat {collection/path/leaf: array} for ArcFaceR100.

    The pre_fc1 dense kernel is (512, C*H*W) flattened in NCHW order; our
    flax model flattens NHWC, so the kernel is permuted accordingly (the
    spatial extent is inferred from the kernel's input dim / C).
    """
    out = {}
    unmapped = []
    for name, arr in initializers.items():
        m = re.fullmatch(r"(stage\d+_unit\d+)_(.+)", name)
        scope = None
        if m:
            scope, rest = m.group(1), m.group(2)
        else:
            rest = name

        def put(coll_path, leaf, value):
            prefix = (scope + "/") if scope else ""
            out[f"{coll_path[0]}/{prefix}{leaf}/{coll_path[1]}"] = value

        bn = re.fullmatch(r"(bn\d+|sc|fc1)_(gamma|beta|moving_mean|"
                          r"moving_var)", rest)
        conv = re.fullmatch(r"(conv\d+(?:sc)?)_weight", rest)
        prelu = re.fullmatch(r"(relu\d+)_gamma", rest)
        if bn is not None:
            layer, leaf = bn.groups()
            if not scope and layer == "fc1":
                layer = "fc1_bn"
            coll, flax_leaf = _BN_LEAVES[leaf]
            put((coll, flax_leaf), layer, arr.astype(np.float32))
        elif conv is not None:
            put(("params", "kernel"), conv.group(1),
                _conv_kernel(arr).astype(np.float32))
        elif prelu is not None:
            layer = "prelu" + prelu.group(1)[len("relu"):]
            if scope:  # stage units name it just 'prelu'
                layer = "prelu"
            put(("params", "alpha"), layer,
                arr.reshape(-1).astype(np.float32))
        elif rest == "pre_fc1_weight":
            # (out=512, in=C*H*W) with `in` laid out NCHW
            spatial = int(round((arr.shape[1] // final_channels) ** 0.5))
            k = arr.reshape(arr.shape[0], final_channels, spatial, spatial)
            k = k.transpose(2, 3, 1, 0)  # -> (H, W, C, out), NHWC flatten
            out["params/fc1/kernel"] = np.ascontiguousarray(
                k.reshape(-1, arr.shape[0])).astype(np.float32)
        elif rest == "pre_fc1_bias":
            out["params/fc1/bias"] = arr.astype(np.float32)
        else:
            unmapped.append(name)
    if unmapped:
        print(f"WARNING: {len(unmapped)} unmapped initializers (first 10): "
              f"{unmapped[:10]}", file=sys.stderr)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--map", choices=["none", "arcface"], default="none",
                        dest="mapping")
    args = parser.parse_args(argv)

    tensors = extract_initializers(args.input)
    print(f"{args.input}: {len(tensors)} initializers")
    if args.mapping == "arcface":
        tensors = map_arcface(tensors)
        print(f"mapped to {len(tensors)} flax leaves")
    np.savez(args.output, **tensors)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
