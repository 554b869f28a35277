"""Runtime-independent ONNX -> XLA bridge (detector weight pipeline).

The reference's primary face detector is insightface's SCRFD ("buffalo_l"
det_10g.onnx) executed through onnxruntime's CUDA EP
(exp-1-debias-gender/1-main-debias.py:938-945, eval-generated-images.py:574).
This module replaces that native dependency with a TPU-native path:

  1. a pure-Python protobuf *wire-format* parser for ONNX ModelProto —
     no onnx / onnxruntime / protoc import needed (none are installed
     in the zero-egress image, and none are needed at deploy time);
  2. a small interpreter that executes the graph's inference op set with
     jax.numpy/lax, so the whole detector compiles under `jit` and runs
     batched on the TPU instead of per-image on CPU+CUDA;
  3. an SCRFD head adapter mapping the graph's 9 outputs (3 strides x
     score/bbox/kps) onto fairdiff.models.face_detector.decode_detections,
     which reproduces insightface's distance decode + largest-face select.

Shape-dependent subgraphs (Shape -> Gather -> Concat -> Reshape chains,
ubiquitous in exported detectors) are constant-folded at trace time: under
jit the input shape is static, so every tensor derived only from shapes
and constants is evaluated eagerly in numpy.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# protobuf wire format
# --------------------------------------------------------------------------


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_varints(buf: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


def _signed(v: int) -> int:
    """Interpret a varint as two's-complement int64 (protobuf int64)."""
    return v - (1 << 64) if v >= (1 << 63) else v


_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = np.float32
    name = ""
    raw: Optional[bytes] = None
    float_data: list[float] = []
    int_data: list[int] = []
    external = False
    for field, wire, val in _fields(buf):
        if field == 1:  # dims
            dims += _packed_varints(val) if wire == 2 else [val]
        elif field == 2:
            dtype = _DTYPES[val]
        elif field == 4:  # float_data (packed)
            float_data += list(np.frombuffer(val, "<f4"))
        elif field in (5, 7, 11):  # int32/int64/uint64_data (packed varints)
            int_data += [_signed(v) for v in _packed_varints(val)]
        elif field == 6:  # string_data
            raise NotImplementedError(
                "ONNX string tensors are not supported by the bridge"
            )
        elif field == 8:
            name = val.decode()
        elif field == 9:
            raw = val
        elif field == 10:  # double_data (packed fixed64)
            float_data += list(np.frombuffer(val, "<f8"))
        elif field in (13, 14):  # external_data / data_location
            # field 14 appears only when EXTERNAL (default 0 is omitted)
            external = True
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype).reshape(dims).copy()
    elif float_data:
        arr = np.asarray(float_data, dtype=dtype).reshape(dims)
    elif int_data:
        if dtype == np.float16:
            # spec: fp16 values without raw_data live in int32_data as
            # uint16 BIT PATTERNS (1.0 -> 15360), not numeric values
            arr = (
                np.asarray(int_data, np.uint16)
                .view(np.float16)
                .reshape(dims)
            )
        else:
            arr = np.asarray(int_data, dtype=dtype).reshape(dims)
    elif int(np.prod(dims)) == 0:
        arr = np.zeros(dims, dtype=dtype)
    else:
        # never fabricate zero weights for data we failed to decode —
        # a detector that silently scores everything 0.5 is worse than
        # an error naming the tensor
        raise NotImplementedError(
            f"ONNX initializer {name!r} ({dims}, {np.dtype(dtype).name}) has "
            + ("externally-stored data (save the model with all tensors "
               "inline: onnx.save(..., save_as_external_data=False) or "
               "convert_external_data_to_raw_data)" if external
               else "no inline data in a storage field this parser knows")
        )
    return name, arr


def _attribute(buf: bytes) -> tuple[str, Any]:
    name = ""
    value: Any = None
    ints: list[int] = []
    floats: list[float] = []
    strings: list[bytes] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 2:  # f
            value = struct.unpack("<f", val)[0]
        elif field == 3:  # i
            value = _signed(val)
        elif field == 4:  # s
            value = val.decode(errors="replace")
        elif field == 5:  # t
            value = _tensor(val)[1]
        elif field == 7:  # floats
            floats += (
                list(np.frombuffer(val, "<f4")) if wire == 2
                else [struct.unpack("<f", val)[0]]
            )
        elif field == 8:  # ints
            ints += (
                [_signed(v) for v in _packed_varints(val)]
                if wire == 2 else [_signed(val)]
            )
        elif field == 9:
            strings.append(val)
    if ints:
        value = ints
    elif floats:
        value = floats
    elif strings:
        value = [s.decode(errors="replace") for s in strings]
    return name, value


@dataclasses.dataclass
class OnnxNode:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict[str, Any]
    name: str = ""


@dataclasses.dataclass
class OnnxGraph:
    nodes: list[OnnxNode]
    initializers: dict[str, np.ndarray]
    inputs: list[str]  # graph inputs that are NOT initializers
    outputs: list[str]
    # default-domain ai.onnx opset version (ops change spec defaults across
    # opsets — e.g. Softmax axis semantics changed at 13)
    opset: int = 13


def _value_info_name(buf: bytes) -> str:
    for field, _, val in _fields(buf):
        if field == 1:
            return val.decode()
    return ""


def _graph(buf: bytes) -> OnnxGraph:
    nodes: list[OnnxNode] = []
    inits: dict[str, np.ndarray] = {}
    inputs: list[str] = []
    outputs: list[str] = []
    for field, _, val in _fields(buf):
        if field == 1:  # node
            op_type, nname = "", ""
            nin: list[str] = []
            nout: list[str] = []
            attrs: dict[str, Any] = {}
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    nin.append(v2.decode())
                elif f2 == 2:
                    nout.append(v2.decode())
                elif f2 == 3:
                    nname = v2.decode()
                elif f2 == 4:
                    op_type = v2.decode()
                elif f2 == 5:
                    k, v = _attribute(v2)
                    attrs[k] = v
            nodes.append(OnnxNode(op_type, nin, nout, attrs, nname))
        elif field == 5:  # initializer
            name, arr = _tensor(val)
            inits[name] = arr
        elif field == 11:
            inputs.append(_value_info_name(val))
        elif field == 12:
            outputs.append(_value_info_name(val))
    inputs = [i for i in inputs if i not in inits]
    return OnnxGraph(nodes, inits, inputs, outputs)


def parse_onnx(data: bytes | str) -> OnnxGraph:
    """ONNX ModelProto bytes (or file path) -> OnnxGraph."""
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    graph: Optional[OnnxGraph] = None
    opset: Optional[int] = None
    for field, _, val in _fields(data):
        if field == 7:  # ModelProto.graph
            graph = _graph(val)
        elif field == 8:  # ModelProto.opset_import (OperatorSetIdProto)
            domain, version = "", None
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    domain = v2.decode()
                elif f2 == 2:
                    version = v2
            if domain in ("", "ai.onnx") and version is not None:
                opset = int(version)
    if graph is None:
        raise ValueError("no graph found in ONNX model")
    if opset is not None:
        graph.opset = opset
    return graph


# --------------------------------------------------------------------------
# interpreter
# --------------------------------------------------------------------------


def _pair(v, default):
    if v is None:
        return (default, default)
    return tuple(v[-2:]) if len(v) >= 2 else (v[0], v[0])


def _auto_pads(in_hw, ks, strides, dil, mode):
    """Explicit per-dim (lo, hi) pads for ONNX auto_pad SAME_UPPER/LOWER:
    output size = ceil(in/stride); the odd padding unit goes at the END
    for SAME_UPPER (== XLA "SAME") and at the START for SAME_LOWER."""
    out = []
    for size, k, s, d in zip(in_hw, ks, strides, dil):
        eff_k = (k - 1) * d + 1
        total = max((-(-size // s) - 1) * s + eff_k - size, 0)
        half, odd = divmod(total, 2)
        out.append((half + odd, half) if mode == "SAME_LOWER"
                   else (half, half + odd))
    return out


def _conv(x, w, b, attrs):
    strides = _pair(attrs.get("strides"), 1)
    dil = _pair(attrs.get("dilations"), 1)
    groups = int(attrs.get("group", 1))
    pads = attrs.get("pads")
    auto = attrs.get("auto_pad", "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        padding = _auto_pads(
            x.shape[2:], w.shape[2:], strides, dil, auto
        )
    elif pads is None:
        padding = [(0, 0), (0, 0)]
    else:  # onnx order: [top, left, bottom, right]
        padding = [(pads[0], pads[2]), (pads[1], pads[3])]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dil, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _pool(x, attrs, kind):
    ks = _pair(attrs.get("kernel_shape"), 1)
    strides = _pair(attrs.get("strides"), 1)
    pads = attrs.get("pads")
    auto = attrs.get("auto_pad", "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        hw = _auto_pads(x.shape[2:], ks, strides, (1, 1), auto)
        padding = [(0, 0), (0, 0), *hw]
    else:
        padding = (
            [(0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])]
            if pads else [(0, 0)] * 4
        )
    window = (1, 1) + ks
    strides4 = (1, 1) + strides
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, window, strides4, padding
        )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window, strides4, padding
    )
    if attrs.get("count_include_pad", 0):
        return s / (ks[0] * ks[1])
    # spec default count_include_pad=0: each output averages only the
    # in-bounds samples of its window, so border divisors shrink
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, window, strides4, padding
    )
    return s / counts


def _resize_nearest(x, out_hw):
    n, c, _, _ = x.shape
    return jax.image.resize(x, (n, c, out_hw[0], out_hw[1]), method="nearest")


def _is_static(x) -> bool:
    return isinstance(x, np.ndarray) or np.isscalar(x)


def build_onnx_fn(
    graph: OnnxGraph,
) -> tuple[Callable[[dict, dict], dict], dict[str, np.ndarray]]:
    """-> (fn(params, feeds) -> {output_name: array}, params).

    `params` is the weight pytree — thread it through jit as an argument.
    `feeds` maps graph input names to arrays. The returned fn is traceable:
    shape-only subgraphs are folded to numpy, and initializers consumed in
    shape-semantic positions (Reshape targets, Resize scales/sizes, Slice
    bounds, axes, indices, Clip limits) are kept as concrete trace-time
    constants rather than traced parameters.
    """
    _STATIC_POS = {
        "Reshape": (1,), "Resize": (1, 2, 3), "Upsample": (1,),
        "Slice": (1, 2, 3, 4), "Unsqueeze": (1,), "Squeeze": (1,),
        "Gather": (1,), "Clip": (1, 2), "Expand": (1,), "Tile": (1,),
        "ConstantOfShape": (0,), "Range": (0, 1, 2),
    }
    # names needed as concrete values, closed backwards through their
    # producing subgraph (stopping at Shape, whose output is always
    # concrete under jit's static input shapes)
    needed: set[str] = set()
    for node in graph.nodes:
        for pos in _STATIC_POS.get(node.op_type, ()):
            if pos < len(node.inputs) and node.inputs[pos]:
                needed.add(node.inputs[pos])
    producers = {o: n for n in graph.nodes for o in n.outputs if o}
    stack = list(needed)
    while stack:
        name = stack.pop()
        prod = producers.get(name)
        if prod is None or prod.op_type == "Shape":
            continue
        for inp in prod.inputs:
            if inp and inp not in needed:
                needed.add(inp)
                stack.append(inp)
    static_names = needed & set(graph.initializers)
    static_consts = {k: graph.initializers[k] for k in static_names}
    params = {
        k: v for k, v in graph.initializers.items() if k not in static_names
    }

    def fn(p: dict, feeds: dict) -> dict:
        env: dict[str, Any] = {}
        env.update(static_consts)
        env.update(p)
        env.update(feeds)

        def get(name):
            return env[name] if name else None

        for node in graph.nodes:
            i = [get(n) for n in node.inputs]
            a = node.attrs
            op = node.op_type
            if op == "Conv":
                out = _conv(i[0], i[1], i[2] if len(i) > 2 else None, a)
            elif op == "BatchNormalization":
                scale, bias, mean, var = i[1], i[2], i[3], i[4]
                eps = a.get("epsilon", 1e-5)
                sh = (1, -1, 1, 1)
                out = (i[0] - mean.reshape(sh)) * (
                    scale.reshape(sh) / jnp.sqrt(var + eps).reshape(sh)
                ) + bias.reshape(sh)
            elif op == "Relu":
                out = jax.nn.relu(i[0])
            elif op == "PRelu":
                slope = i[1]
                if hasattr(slope, "reshape") and slope.ndim == 1 and i[0].ndim == 4:
                    slope = slope.reshape(1, -1, 1, 1)
                out = jnp.where(i[0] >= 0, i[0], i[0] * slope)
            elif op == "LeakyRelu":
                out = jax.nn.leaky_relu(i[0], a.get("alpha", 0.01))
            elif op == "Sigmoid":
                out = jax.nn.sigmoid(i[0])
            elif op == "Softmax":
                if graph.opset >= 13:
                    out = jax.nn.softmax(i[0], axis=a.get("axis", -1))
                else:
                    # opset<13 semantics: flatten to 2D at `axis`
                    # (default 1) and normalize over the trailing block
                    ax = a.get("axis", 1) % max(i[0].ndim, 1)
                    lead = int(np.prod(i[0].shape[:ax]))
                    flat = i[0].reshape(lead, -1)
                    out = jax.nn.softmax(flat, axis=-1).reshape(i[0].shape)
            elif op == "Exp":
                out = jnp.exp(i[0])
            elif op == "Clip":
                lo = i[1] if len(i) > 1 and i[1] is not None else a.get("min")
                hi = i[2] if len(i) > 2 and i[2] is not None else a.get("max")
                out = jnp.clip(i[0], lo, hi)
            elif op in ("Add", "Sub", "Mul", "Div"):
                f = {"Add": jnp.add, "Sub": jnp.subtract,
                     "Mul": jnp.multiply, "Div": jnp.divide}[op]
                if _is_static(i[0]) and _is_static(i[1]):
                    out = {
                        "Add": np.add, "Sub": np.subtract,
                        "Mul": np.multiply, "Div": np.divide,
                    }[op](i[0], i[1])
                else:
                    out = f(i[0], i[1])
            elif op == "Concat":
                ax = a["axis"] if not isinstance(a["axis"], list) else a["axis"][0]
                if all(_is_static(x) for x in i):
                    out = np.concatenate([np.atleast_1d(x) for x in i], axis=ax)
                else:
                    out = jnp.concatenate(i, axis=ax)
            elif op == "MaxPool":
                out = _pool(i[0], a, "max")
            elif op == "AveragePool":
                out = _pool(i[0], a, "avg")
            elif op == "GlobalAveragePool":
                out = i[0].mean(axis=(2, 3), keepdims=True)
            elif op == "Reshape":
                shape = [int(s) for s in np.asarray(i[1]).reshape(-1)]
                shape = [i[0].shape[k] if s == 0 else s for k, s in enumerate(shape)]
                out = i[0].reshape(shape)
            elif op == "Transpose":
                out = i[0].transpose(a["perm"])
            elif op == "Flatten":
                ax = a.get("axis", 1)
                out = i[0].reshape(int(np.prod(i[0].shape[:ax])), -1)
            elif op == "Gemm":
                x, w = i[0], i[1]
                if a.get("transA", 0):
                    x = x.T
                if a.get("transB", 0):  # spec default 0 (B as stored)
                    w = w.T
                out = a.get("alpha", 1.0) * (x @ w)
                if len(i) > 2 and i[2] is not None:
                    out = out + a.get("beta", 1.0) * i[2]
            elif op == "MatMul":
                out = i[0] @ i[1]
            elif op in ("Resize", "Upsample"):
                x = i[0]
                mode = a.get("mode", "nearest")
                if mode != "nearest":
                    raise NotImplementedError(f"Resize mode {mode}")
                sizes = i[3] if len(i) > 3 else None
                scales = i[2] if len(i) > 2 else (i[1] if op == "Upsample" else None)
                if sizes is not None and np.size(sizes):
                    hw = [int(s) for s in np.asarray(sizes).reshape(-1)[-2:]]
                else:
                    sc = np.asarray(scales).reshape(-1)
                    hw = [int(round(x.shape[2] * sc[-2])),
                          int(round(x.shape[3] * sc[-1]))]
                out = _resize_nearest(x, hw)
            elif op == "Shape":
                out = np.asarray(i[0].shape, np.int64)
            elif op == "Gather":
                idx = np.asarray(i[1])
                if _is_static(i[0]):
                    out = np.take(np.asarray(i[0]), idx, axis=a.get("axis", 0))
                else:
                    out = jnp.take(i[0], jnp.asarray(idx), axis=a.get("axis", 0))
            elif op == "Unsqueeze":
                axes = a.get("axes") or [int(x) for x in np.asarray(i[1]).reshape(-1)]
                out = i[0]
                mod = np if _is_static(out) else jnp
                for ax in sorted(axes):
                    out = mod.expand_dims(out, ax)
            elif op == "Squeeze":
                axes = a.get("axes") or (
                    [int(x) for x in np.asarray(i[1]).reshape(-1)]
                    if len(i) > 1 and i[1] is not None else None
                )
                mod = np if _is_static(i[0]) else jnp
                out = mod.squeeze(i[0], axis=tuple(axes) if axes else None)
            elif op == "Cast":
                to = _DTYPES[a["to"] if not isinstance(a["to"], list) else a["to"][0]]
                out = np.asarray(i[0], to) if _is_static(i[0]) else i[0].astype(to)
            elif op == "Constant":
                out = a.get("value")
            elif op in ("Identity", "Dropout"):
                out = i[0]
            elif op == "Slice":
                starts = [int(x) for x in np.asarray(i[1]).reshape(-1)]
                ends = [int(x) for x in np.asarray(i[2]).reshape(-1)]
                axes = (
                    [int(x) for x in np.asarray(i[3]).reshape(-1)]
                    if len(i) > 3 and i[3] is not None
                    else list(range(len(starts)))
                )
                steps = (
                    [int(x) for x in np.asarray(i[4]).reshape(-1)]
                    if len(i) > 4 and i[4] is not None
                    else [1] * len(starts)
                )
                sl = [slice(None)] * i[0].ndim
                for s, e, ax, st in zip(starts, ends, axes, steps):
                    sl[ax] = slice(s, None if e >= 2**31 - 1 else e, st)
                out = i[0][tuple(sl)]
            elif op == "ConstantOfShape":
                shape = [int(x) for x in np.asarray(i[0]).reshape(-1)]
                fill = a.get("value")
                fill = (
                    np.zeros((), np.float32) if fill is None
                    else np.asarray(fill).reshape(())
                )
                out = np.full(shape, fill, dtype=fill.dtype)
            elif op == "Expand":
                shape = [int(x) for x in np.asarray(i[1]).reshape(-1)]
                # onnx Expand is two-sided numpy broadcasting: an input
                # dim may exceed the target dim's 1
                mod = np if _is_static(i[0]) else jnp
                shape = list(mod.broadcast_shapes(tuple(i[0].shape), tuple(shape)))
                out = mod.broadcast_to(i[0], shape)
            elif op == "Tile":
                reps = [int(x) for x in np.asarray(i[1]).reshape(-1)]
                mod = np if _is_static(i[0]) else jnp
                out = mod.tile(i[0], reps)
            elif op == "Range":
                s0, lim, d0 = (int(np.asarray(v)) for v in i[:3])
                out = np.arange(s0, lim, d0, dtype=np.asarray(i[0]).dtype)
            elif op == "Where":
                mod = np if all(_is_static(v) for v in i[:3]) else jnp
                out = mod.where(i[0], i[1], i[2])
            else:
                raise NotImplementedError(f"ONNX op {op} ({node.name})")
            outs = [out] if not isinstance(out, tuple) else list(out)
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return {name: env[name] for name in graph.outputs}

    return fn, params


# --------------------------------------------------------------------------
# SCRFD adapter
# --------------------------------------------------------------------------


def scrfd_raw_heads(
    outputs: dict[str, np.ndarray],
    graph: OnnxGraph,
    input_hw: tuple[int, int],
    strides: tuple[int, ...] = (8, 16, 32),
    num_anchors: int = 2,
) -> dict[str, list]:
    """Map the SCRFD graph's 9 outputs (per-stride score/bbox/kps, each
    [N, h*w*A, C] in insightface's output order) onto the NHWC per-level
    dict `fairdiff.models.face_detector.decode_detections` consumes.

    Output-to-stride assignment follows insightface's convention: outputs
    appear grouped as [scores x3, bboxes x3, kps x3] in stride order
    (insightface scrfd.py `forward`), identified here by channel count
    (1 / 4 / 10) and anchor count from the spatial size.
    """
    vals = [outputs[name] for name in graph.outputs]  # may be traced
    by_kind: dict[int, list] = {1: [], 4: [], 10: []}
    for v in vals:
        by_kind[v.shape[-1]].append(v)
    heads: dict[str, list] = {"score": [], "bbox": [], "kps": []}
    H, W = input_hw
    for level, stride in enumerate(strides):
        h, w = H // stride, W // stride
        for kind, key in ((1, "score"), (4, "bbox"), (10, "kps")):
            v = by_kind[kind][level]  # [N, h*w*A, C]
            n = v.shape[0]
            v = v.reshape(n, h, w, num_anchors * kind)
            heads[key].append(v)
    return heads


def load_scrfd(
    path: str,
    *,
    input_size: tuple[int, int] = (640, 640),
    strides: tuple[int, ...] = (8, 16, 32),
    num_anchors: int = 2,
    score_threshold: float = 0.5,
):
    """-> (detect(params, images), params) for GuidanceStack.detect_fn.

    images: [N, H, W, 3] RGB in [-1, 1] (fairdiff convention). SCRFD
    preprocessing is (pixel - 127.5)/128 on BGR (insightface detect):
    equal to flipping channels and scaling by 127.5/128.
    """
    from fairdiff.models.face_detector import (
        DetectorConfig, decode_detections, select_largest_face,
    )

    graph = parse_onnx(path)
    fn, params = build_onnx_fn(graph)
    cfg = DetectorConfig(
        strides=strides, num_anchors=num_anchors,
        score_threshold=score_threshold,
        # det_10g-style graphs end score heads with a Sigmoid node:
        # outputs are probabilities already (insightface thresholds them
        # directly), so the decode must not sigmoid a second time
        scores_are_logits=False,
    )
    in_name = graph.inputs[0]
    H, W = input_size

    def detect(p, images: jax.Array):
        x = jax.image.resize(
            images, (images.shape[0], H, W, 3), method="bilinear"
        )
        x = x[..., ::-1] * (127.5 / 128.0)  # RGB->BGR, insightface scaling
        x = x.transpose(0, 3, 1, 2)  # NCHW (onnx native)
        # match the activation dtype to the weight tree: the interpreter
        # uses raw lax ops (conv rejects mixed f32/bf16 operands), so a
        # caller that cast the params must have the feed follow suit
        float_leaf = next(
            (v for v in jax.tree_util.tree_leaves(p)
             if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)), None,
        )
        if float_leaf is not None:
            x = x.astype(jnp.asarray(float_leaf).dtype)
        outs = fn(p, {in_name: x})
        raw = scrfd_raw_heads(outs, graph, (H, W), strides, num_anchors)
        scores, boxes, kps = decode_detections(raw, cfg)
        # rescale from the 640-sq working frame back to image coords
        sy = images.shape[1] / H
        sx = images.shape[2] / W
        boxes = boxes * jnp.asarray([sx, sy, sx, sy])
        kps = kps * jnp.asarray([sx, sy])
        return select_largest_face(scores, boxes, kps, cfg.score_threshold)

    return detect, params
