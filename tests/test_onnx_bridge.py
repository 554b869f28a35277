"""ONNX bridge: wire-format parser + interpreter goldens vs torch, and an
SCRFD-shaped end-to-end fixture through load_scrfd.

The fixture bytes are encoded here by an independent hand-rolled protobuf
writer (not the parser's own code), so the test actually validates the
wire-format reader against the ONNX schema.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairdiff.io.onnx_bridge import build_onnx_fn, load_scrfd, parse_onnx

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------------
# minimal protobuf writer (test-side)
# --------------------------------------------------------------------------

def vint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def tag(field: int, wire: int) -> bytes:
    return vint(field << 3 | wire)


def lfield(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + vint(len(payload)) + payload


def sfield(field: int, s: str) -> bytes:
    return lfield(field, s.encode())


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    dt = {np.dtype("float32"): 1, np.dtype("int64"): 7}[arr.dtype]
    out = b"".join(tag(1, 0) + vint(d) for d in arr.shape)
    out += tag(2, 0) + vint(dt)
    out += sfield(8, name)
    out += lfield(9, arr.tobytes())
    return out


def attr_i(name: str, v: int) -> bytes:
    return sfield(1, name) + tag(3, 0) + vint(v & (2**64 - 1))


def attr_f(name: str, v: float) -> bytes:
    return sfield(1, name) + tag(2, 5) + struct.pack("<f", v)


def attr_s(name: str, v: str) -> bytes:
    return sfield(1, name) + sfield(4, v)


def attr_ints(name: str, vals) -> bytes:
    packed = b"".join(vint(v & (2**64 - 1)) for v in vals)
    return sfield(1, name) + lfield(8, packed)


def node(op: str, inputs, outputs, *attrs) -> bytes:
    out = b"".join(sfield(1, i) for i in inputs)
    out += b"".join(sfield(2, o) for o in outputs)
    out += sfield(4, op)
    out += b"".join(lfield(5, a) for a in attrs)
    return out


def value_info(name: str) -> bytes:
    return sfield(1, name)


def model(nodes, inits, inputs, outputs, opset=None) -> bytes:
    g = b"".join(lfield(1, n) for n in nodes)
    g += b"".join(lfield(5, tensor_proto(n, a)) for n, a in inits.items())
    g += b"".join(lfield(11, value_info(i)) for i in inputs)
    g += b"".join(lfield(12, value_info(o)) for o in outputs)
    out = lfield(7, g)
    if opset is not None:  # ModelProto.opset_import (default ai.onnx domain)
        out += lfield(8, sfield(1, "") + tag(2, 0) + vint(opset))
    return out


# --------------------------------------------------------------------------


def test_interpreter_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32) * 0.3
    b = rng.normal(size=(4,)).astype(np.float32)
    bn_scale = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    bn_bias = rng.normal(size=4).astype(np.float32)
    bn_mean = rng.normal(size=4).astype(np.float32)
    bn_var = rng.uniform(0.5, 2.0, 4).astype(np.float32)
    slope = rng.uniform(0.1, 0.3, 4).astype(np.float32)

    data = model(
        nodes=[
            node("Conv", ["x", "w", "b"], ["c1"],
                 attr_ints("strides", [1, 1]), attr_ints("pads", [1, 1, 1, 1]),
                 attr_ints("kernel_shape", [3, 3])),
            node("BatchNormalization",
                 ["c1", "bn_s", "bn_b", "bn_m", "bn_v"], ["bn"],
                 attr_f("epsilon", 1e-5)),
            node("PRelu", ["bn", "slope"], ["pr"]),
            node("MaxPool", ["pr"], ["mp"],
                 attr_ints("kernel_shape", [2, 2]), attr_ints("strides", [2, 2])),
            node("Resize", ["mp", "", "scales"], ["rs"], attr_s("mode", "nearest")),
            node("Sigmoid", ["rs"], ["y"]),
        ],
        inits={
            "w": w, "b": b, "bn_s": bn_scale, "bn_b": bn_bias,
            "bn_m": bn_mean, "bn_v": bn_var, "slope": slope,
            "scales": np.asarray([1.0, 1.0, 2.0, 2.0], np.float32),
        },
        inputs=["x"],
        outputs=["y"],
    )

    graph = parse_onnx(data)
    fn, params = build_onnx_fn(graph)
    out = jax.jit(lambda p, f: fn(p, f))(params, {"x": jnp.asarray(x)})["y"]

    with torch.no_grad():
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=1,
        )
        t = torch.nn.functional.batch_norm(
            t, torch.from_numpy(bn_mean), torch.from_numpy(bn_var),
            torch.from_numpy(bn_scale), torch.from_numpy(bn_bias), eps=1e-5,
        )
        t = torch.nn.functional.prelu(t, torch.from_numpy(slope))
        t = torch.nn.functional.max_pool2d(t, 2, 2)
        t = torch.nn.functional.interpolate(t, scale_factor=2, mode="nearest")
        ref = torch.sigmoid(t).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_shape_subgraph_constant_folds():
    """Shape -> Gather -> Unsqueeze -> Concat -> Reshape chains (ubiquitous
    in exported detectors) must fold at trace time."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 4, 4)).astype(np.float32)
    data = model(
        nodes=[
            node("Shape", ["x"], ["shp"]),
            node("Gather", ["shp", "zero"], ["n"], attr_i("axis", 0)),
            node("Unsqueeze", ["n"], ["n1"], attr_ints("axes", [0])),
            node("Concat", ["n1", "rest"], ["target"], attr_i("axis", 0)),
            node("Reshape", ["x", "target"], ["y"]),
        ],
        inits={
            "zero": np.asarray(0, np.int64).reshape(()),
            "rest": np.asarray([-1, 3], np.int64),
        },
        inputs=["x"],
        outputs=["y"],
    )
    graph = parse_onnx(data)
    fn, params = build_onnx_fn(graph)
    out = jax.jit(lambda p, f: fn(p, f))(params, {"x": jnp.asarray(x)})["y"]
    np.testing.assert_allclose(np.asarray(out), x.reshape(2, 32, 3), rtol=1e-6)


def _scrfd_like_model(input_hw=(32, 32), num_anchors=2):
    """A tiny SCRFD-shaped graph: per stride 8/16/32, pooled features ->
    1x1 conv heads -> transpose/reshape to [N, h*w*A, C], outputs ordered
    [scores x3, bboxes x3, kps x3] like insightface's det_10g."""
    rng = np.random.default_rng(2)
    nodes, inits = [], {}
    outputs = {"score": [], "bbox": [], "kps": []}
    for stride in (8, 16, 32):
        feat = f"feat{stride}"
        nodes.append(
            node("AveragePool", ["x"], [feat],
                 attr_ints("kernel_shape", [stride, stride]),
                 attr_ints("strides", [stride, stride]))
        )
        for key, ch in (("score", 1), ("bbox", 4), ("kps", 10)):
            wname = f"w_{key}{stride}"
            inits[wname] = (
                rng.normal(size=(num_anchors * ch, 3, 1, 1)).astype(np.float32)
            )
            raw, tr, name = f"{key}{stride}_raw", f"{key}{stride}_tr", f"{key}_{stride}"
            nodes.append(node("Conv", [feat, wname], [raw]))
            nodes.append(node("Transpose", [raw], [tr], attr_ints("perm", [0, 2, 3, 1])))
            inits[f"shape_{key}{stride}"] = np.asarray([0, -1, ch], np.int64)
            if key == "score":
                # det_10g score heads end with Sigmoid: graph outputs are
                # probabilities, as insightface consumes them
                rs = f"{key}{stride}_rs"
                nodes.append(node("Reshape", [tr, f"shape_{key}{stride}"], [rs]))
                nodes.append(node("Sigmoid", [rs], [name]))
            else:
                nodes.append(node("Reshape", [tr, f"shape_{key}{stride}"], [name]))
            outputs[key].append(name)
    out_names = outputs["score"] + outputs["bbox"] + outputs["kps"]
    return model(nodes, inits, ["x"], out_names)


def test_load_scrfd_end_to_end(tmp_path):
    path = tmp_path / "det_tiny.onnx"
    path.write_bytes(_scrfd_like_model())
    detect, params = load_scrfd(str(path), input_size=(32, 32))
    images = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (3, 64, 64, 3)), jnp.float32
    )
    det = jax.jit(detect)(params, images)
    assert det.indicators.shape == (3,)
    assert det.bboxes.shape == (3, 4)
    assert det.landmarks.shape == (3, 5, 2)
    # decoded coords are in the ORIGINAL image frame
    assert float(jnp.abs(det.bboxes).max()) <= 64 * 3  # sane scale
    # NO double sigmoid: the graph's score outputs are already
    # probabilities (Sigmoid head like det_10g), so the decoded anchor
    # scores must equal them EXACTLY — a second sigmoid would pin every
    # score into [0.5, 0.73] and defeat thresholding
    from fairdiff.io.onnx_bridge import scrfd_raw_heads
    from fairdiff.models.face_detector import (
        DetectorConfig, decode_detections,
    )

    graph = parse_onnx(path.read_bytes())
    fn, p2 = build_onnx_fn(graph)
    x = jax.image.resize(images, (3, 32, 32, 3), "bilinear")
    x = (x[..., ::-1] * (127.5 / 128.0)).transpose(0, 3, 1, 2)
    outs = fn(p2, {graph.inputs[0]: x})
    raw = scrfd_raw_heads(outs, graph, (32, 32), (8, 16, 32), 2)
    # SCRFD's 3 levels need the matching 3-stride config — the 4-level
    # first-party default now raises instead of zip-truncating to the
    # wrong strides (half-scale boxes)
    import pytest

    with pytest.raises(ValueError, match="pyramid levels"):
        decode_detections(raw, DetectorConfig(scores_are_logits=False))
    dec_scores, _, _ = decode_detections(
        raw,
        DetectorConfig(strides=(8, 16, 32), scores_are_logits=False),
    )
    graph_scores = np.concatenate(
        [np.asarray(outs[n]).reshape(3, -1) for n in graph.outputs[:3]],
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(dec_scores), graph_scores, rtol=1e-6, atol=1e-7
    )

# -------- spec-default regressions (Gemm/AveragePool/Softmax/dtype) --------


def test_gemm_spec_defaults_no_transpose():
    """Gemm transA/transB default to 0 in the ONNX spec: a node that omits
    them must compute x @ B with B as stored."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    w = rng.normal(size=(5, 2)).astype(np.float32)
    b = rng.normal(size=(2,)).astype(np.float32)
    data = model(
        nodes=[node("Gemm", ["x", "w", "b"], ["y"])],
        inits={"w": w, "b": b}, inputs=["x"], outputs=["y"],
    )
    fn, params = build_onnx_fn(parse_onnx(data))
    out = fn(params, {"x": jnp.asarray(x)})["y"]
    np.testing.assert_allclose(np.asarray(out), x @ w + b, rtol=1e-5)


def test_gemm_explicit_transb():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 5)).astype(np.float32)
    w = rng.normal(size=(2, 5)).astype(np.float32)  # stored transposed
    data = model(
        nodes=[node("Gemm", ["x", "w"], ["y"], attr_i("transB", 1))],
        inits={"w": w}, inputs=["x"], outputs=["y"],
    )
    fn, params = build_onnx_fn(parse_onnx(data))
    out = fn(params, {"x": jnp.asarray(x)})["y"]
    np.testing.assert_allclose(np.asarray(out), x @ w.T, rtol=1e-5)


def test_average_pool_excludes_padding_by_default():
    """Spec default count_include_pad=0: border windows divide by the
    in-bounds sample count (torch count_include_pad=False)."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 2, 5, 5)).astype(np.float32)
    nodes = [node("AveragePool", ["x"], ["y"],
                  attr_ints("kernel_shape", [3, 3]),
                  attr_ints("strides", [1, 1]),
                  attr_ints("pads", [1, 1, 1, 1]))]
    fn, params = build_onnx_fn(
        parse_onnx(model(nodes, {}, ["x"], ["y"]))
    )
    out = fn(params, {"x": jnp.asarray(x)})["y"]
    ref = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 3, 1, padding=1, count_include_pad=False
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    nodes_inc = [node("AveragePool", ["x"], ["y"],
                      attr_ints("kernel_shape", [3, 3]),
                      attr_ints("strides", [1, 1]),
                      attr_ints("pads", [1, 1, 1, 1]),
                      attr_i("count_include_pad", 1))]
    fn2, p2 = build_onnx_fn(parse_onnx(model(nodes_inc, {}, ["x"], ["y"])))
    ref_inc = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 3, 1, padding=1, count_include_pad=True
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(fn2(p2, {"x": jnp.asarray(x)})["y"]), ref_inc,
        rtol=1e-5, atol=1e-6,
    )


def test_softmax_old_opset_flattens_at_axis_1():
    """opset<13 Softmax: default axis=1 and flatten-to-2D semantics —
    normalization runs over ALL trailing dims, not just the last."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    data = model(
        nodes=[node("Softmax", ["x"], ["y"])], inits={},
        inputs=["x"], outputs=["y"], opset=11,
    )
    graph = parse_onnx(data)
    assert graph.opset == 11
    fn, params = build_onnx_fn(graph)
    out = np.asarray(fn(params, {"x": jnp.asarray(x)})["y"])
    flat = x.reshape(2, 12)
    e = np.exp(flat - flat.max(axis=1, keepdims=True))
    ref = (e / e.sum(axis=1, keepdims=True)).reshape(x.shape)
    np.testing.assert_allclose(out, ref, rtol=1e-5)
    # modern opset keeps last-axis default
    fn13, p13 = build_onnx_fn(parse_onnx(model(
        [node("Softmax", ["x"], ["y"])], {}, ["x"], ["y"], opset=13,
    )))
    out13 = np.asarray(fn13(p13, {"x": jnp.asarray(x)})["y"])
    e3 = np.exp(x - x.max(axis=-1, keepdims=True))
    np.testing.assert_allclose(out13, e3 / e3.sum(axis=-1, keepdims=True),
                               rtol=1e-5)


def test_scrfd_detect_accepts_cast_param_tree(tmp_path):
    """load_guidance_stack-style bf16 casting must not crash the raw-lax
    interpreter: the feed follows the weight tree's dtype."""
    from fairdiff.io.checkpoints import cast_floats

    path = tmp_path / "det_tiny.onnx"
    path.write_bytes(_scrfd_like_model())
    detect, params = load_scrfd(str(path), input_size=(32, 32))
    images = jnp.asarray(
        np.random.default_rng(8).uniform(-1, 1, (2, 48, 48, 3)), jnp.float32
    )
    det = jax.jit(detect)(cast_floats(params, jnp.bfloat16), images)
    assert det.indicators.shape == (2,)


def test_conv_auto_pad_same_lower_and_upper():
    """ONNX auto_pad: SAME_UPPER puts the odd padding unit at the end,
    SAME_LOWER at the start — stride-2 on an even input makes total
    padding odd, so the two modes differ by a one-pixel shift."""
    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    w = rng.normal(size=(3, 2, 3, 3)).astype(np.float32) * 0.3

    outs = {}
    for mode in ("SAME_UPPER", "SAME_LOWER"):
        nodes = [node("Conv", ["x", "w"], ["y"],
                      attr_ints("strides", [2, 2]),
                      attr_ints("kernel_shape", [3, 3]),
                      attr_s("auto_pad", mode))]
        fn, params = build_onnx_fn(
            parse_onnx(model(nodes, {"w": w}, ["x"], ["y"]))
        )
        outs[mode] = np.asarray(fn(params, {"x": jnp.asarray(x)})["y"])

    # total = (ceil(8/2)-1)*2 + 3 - 8 = 1 -> UPPER pads (0,1), LOWER (1,0)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        ref_u = torch.nn.functional.conv2d(
            torch.nn.functional.pad(tx, (0, 1, 0, 1)),
            torch.from_numpy(w), stride=2,
        ).numpy()
        ref_l = torch.nn.functional.conv2d(
            torch.nn.functional.pad(tx, (1, 0, 1, 0)),
            torch.from_numpy(w), stride=2,
        ).numpy()
    assert outs["SAME_UPPER"].shape == outs["SAME_LOWER"].shape == (1, 3, 4, 4)
    np.testing.assert_allclose(outs["SAME_UPPER"], ref_u, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["SAME_LOWER"], ref_l, rtol=1e-5, atol=1e-5)
    assert np.abs(outs["SAME_UPPER"] - outs["SAME_LOWER"]).max() > 1e-3


def test_pool_auto_pad_same_upper():
    """MaxPool must honor auto_pad (not silently use VALID): output is
    ceil(in/stride) with -inf padding at the end for SAME_UPPER."""
    rng = np.random.default_rng(10)
    x = rng.normal(size=(1, 2, 7, 7)).astype(np.float32)
    nodes = [node("MaxPool", ["x"], ["y"],
                  attr_ints("kernel_shape", [2, 2]),
                  attr_ints("strides", [2, 2]),
                  attr_s("auto_pad", "SAME_UPPER"))]
    fn, params = build_onnx_fn(parse_onnx(model(nodes, {}, ["x"], ["y"])))
    out = np.asarray(fn(params, {"x": jnp.asarray(x)})["y"])
    assert out.shape == (1, 2, 4, 4)  # ceil(7/2), not floor
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 2, 2, ceil_mode=True
    ).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_constant_of_shape_expand_tile_range():
    """torch dynamic-axes exports emit ConstantOfShape/Expand/Tile in
    shape subgraphs; the interpreter must fold + execute them."""
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    bias = rng.normal(size=(3, 1)).astype(np.float32)

    float_one = np.asarray([1.0], np.float32)
    nodes = [
        # ones = ConstantOfShape(Shape(x), value=1.0); y1 = x + ones
        node("Shape", ["x"], ["shp"]),
        node("ConstantOfShape", ["shp"], ["ones"],
             sfield(1, "value") + lfield(5, tensor_proto("", float_one))),
        node("Add", ["x", "ones"], ["y1"]),
        # y2 = x * Expand(bias[3,1] -> [2,3,4]) (two-sided broadcast)
        node("Expand", ["bias", "shp"], ["bias_e"]),
        node("Mul", ["x", "bias_e"], ["y2"]),
        # y3 = Tile(range(0,4,1) -> [8]) as int64 shape-side data
        node("Range", ["r0", "r4", "r1"], ["rng_v"]),
        node("Tile", ["rng_v", "reps"], ["y3"]),
    ]
    inits = {
        "bias": bias,
        "r0": np.asarray(0, np.int64), "r4": np.asarray(4, np.int64),
        "r1": np.asarray(1, np.int64), "reps": np.asarray([2], np.int64),
    }
    fn, params = build_onnx_fn(
        parse_onnx(model(nodes, inits, ["x"], ["y1", "y2", "y3"]))
    )
    out = jax.jit(lambda p, f: fn(p, f))(params, {"x": jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(out["y1"]), x + 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["y2"]), x * np.broadcast_to(bias, (2, 3, 4)),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(out["y3"]), np.tile(np.arange(4, dtype=np.int64), 2)
    )


def test_tensor_double_data_and_external_data():
    """double_data (field 10) decodes; externally-stored tensors raise a
    named error instead of silently materializing zeros."""
    from fairdiff.io.onnx_bridge import _tensor

    vals = np.asarray([1.5, -2.25, 3.0], np.float64)
    buf = tag(1, 0) + vint(3)          # dims [3]
    buf += tag(2, 0) + vint(11)        # data_type DOUBLE
    buf += sfield(8, "dbl")
    buf += lfield(10, vals.tobytes())  # double_data packed
    name, arr = _tensor(buf)
    assert name == "dbl"
    np.testing.assert_allclose(arr, vals)

    ext = tag(1, 0) + vint(4)          # dims [4], float32, no inline data
    ext += tag(2, 0) + vint(1)
    ext += sfield(8, "ext_w")
    ext += lfield(13, sfield(1, "location") + sfield(2, "weights.bin"))
    ext += tag(14, 0) + vint(1)        # data_location = EXTERNAL
    with pytest.raises(NotImplementedError, match="ext_w.*external"):
        _tensor(ext)


def test_tensor_fp16_int32_data_bit_pattern():
    """fp16 without raw_data lives in int32_data as uint16 BIT PATTERNS
    (1.0 -> 15360), not numeric values."""
    from fairdiff.io.onnx_bridge import _tensor

    bits = np.asarray([1.0, -2.5, 0.0], np.float16).view(np.uint16)
    buf = tag(1, 0) + vint(3)
    buf += tag(2, 0) + vint(10)  # FLOAT16
    buf += sfield(8, "h")
    buf += lfield(5, b"".join(vint(int(b)) for b in bits))  # int32_data
    name, arr = _tensor(buf)
    assert arr.dtype == np.float16
    np.testing.assert_array_equal(arr, np.asarray([1.0, -2.5, 0.0], np.float16))
