"""Batched TPU-native face detector (SCRFD/RetinaFace-class, Flax, NHWC).

Replaces the reference's two-stage host-side detection — insightface
SCRFD via onnxruntime C++ (exp-1-debias-gender/1-main-debias.py:938-945,
:1306-1353) with dlib CNN fallback (:1232-1290) — which marshals every
image GPU->CPU->GPU per sample (SURVEY.md §3.1 names this the reference's
biggest non-GPU bottleneck). Here detection is one fixed-shape XLA program
over the whole batch, fused into the training step.

Design (anchor-free, SCRFD-style):
  backbone: residual CNN with stride-8/16/32 feature maps
  neck:     FPN (lateral 1x1 + top-down add + 3x3 smooth)
  head:     shared conv stack per level -> {score [A], bbox-distances [4A],
            5-point landmark offsets [10A]}, A anchors per position
  decode:   distance2bbox around stride-spaced centers; the consumer is the
            fairness loop which only needs the *largest confident face* per
            image (get_largest_face_app, exp-1:1306-1353), so selection is
            a masked argmax over (score >= threshold) * area — no NMS pass
            in the hot path. A full top-K + NMS decode is provided for the
            offline eval tool.

Weights: trained by fairdiff.tools.train_detector or converted from a
compatible torch checkpoint; the fairness trainer accepts any
`detect_fn(images) -> FaceDetections`, so tests inject synthetic oracles.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    # stride 4 (the P2 level) is first-party beyond SCRFD's (8,16,32):
    # the standard scale gate assigns sqrt(bw*bh) in [2*stride, 10*stride)
    # px, so without it faces under 16 px had no inside-window anchors —
    # the scale_small recall ceiling DETECTOR.md r4/r5 measured. P2
    # covers 8-40 px with real multi-anchor windows.
    strides: tuple[int, ...] = (4, 8, 16, 32)
    num_anchors: int = 2
    width: int = 32  # backbone stem width
    head_width: int = 64
    # 0.6 measured STRICTLY better than 0.5 for the shipped P2 weights
    # (DETECTOR.md r5): fp 0.09-0.16 -> 0.016-0.070 AND scale_small
    # recall 0.855 -> 0.914 (the higher bar filters spurious boxes that
    # outscored the true face in largest-area selection). Only the
    # first-party net reads this default; load_scrfd pins its own 0.5
    # (insightface det_thresh parity).
    score_threshold: float = 0.6
    # FaceDetectorNet emits raw logits; the reference's SCRFD ONNX graphs
    # end score heads with a Sigmoid node (insightface compares them to
    # det_thresh directly), so the ONNX path must NOT sigmoid again
    scores_are_logits: bool = True

    @classmethod
    def tiny(cls) -> "DetectorConfig":
        return cls(width=8, head_width=16)


class FaceDetections(NamedTuple):
    """Per-image single best face, reference fill-value contract."""

    indicators: jax.Array  # [N] bool
    bboxes: jax.Array  # [N, 4] float (x0,y0,x1,y1), -1 fill
    landmarks: jax.Array  # [N, 5, 2] float, -1 fill
    scores: jax.Array  # [N] float, -1 fill


class _Block(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.GroupNorm(8, dtype=self.dtype, name="norm1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(8, dtype=self.dtype, name="norm2")(h)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="proj")(x)
        return jax.nn.relu(x + h)


class FaceDetectorNet(nn.Module):
    config: DetectorConfig = DetectorConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> dict[str, list[jax.Array]]:
        """images [N,H,W,3] in [-1,1] -> per-level raw head outputs."""
        cfg = self.config
        w = cfg.width
        x = nn.Conv(w, (3, 3), strides=2, padding=1, dtype=self.dtype, name="stem")(images)
        x = jax.nn.relu(x)
        c2 = _Block(w, 2, self.dtype, name="c2_block")(x)  # stride 4
        c3 = _Block(w * 2, 2, self.dtype, name="c3_block")(c2)  # stride 8
        c4 = _Block(w * 4, 2, self.dtype, name="c4_block")(c3)  # stride 16
        c5 = _Block(w * 8, 2, self.dtype, name="c5_block")(c4)  # stride 32

        # FPN over whichever pyramid levels cfg.strides requests
        f = cfg.head_width
        backbone = {4: c2, 8: c3, 16: c4, 32: c5}
        strides = sorted(cfg.strides, reverse=True)  # top-down
        prev = None
        by_stride = {}
        for s in strides:
            p = nn.Conv(f, (1, 1), dtype=self.dtype, name=f"lat_s{s}")(
                backbone[s]
            )
            if prev is not None:
                p = p + jax.image.resize(prev, p.shape, "nearest")
            by_stride[s] = p
            prev = p
        feats = [
            nn.Conv(f, (3, 3), padding=1, dtype=self.dtype,
                    name=f"smooth_s{s}")(by_stride[s])
            for s in cfg.strides
        ]

        # shared head (same Conv instances applied per level => shared params)
        head_conv1 = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="head_conv1")
        head_conv2 = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")
        cls_head = nn.Conv(cfg.num_anchors, (1, 1), dtype=self.dtype, name="cls")
        box_head = nn.Conv(cfg.num_anchors * 4, (1, 1), dtype=self.dtype, name="box")
        kps_head = nn.Conv(cfg.num_anchors * 10, (1, 1), dtype=self.dtype, name="kps")

        out = {"score": [], "bbox": [], "kps": []}
        for p in feats:
            h = jax.nn.relu(head_conv2(jax.nn.relu(head_conv1(p))))
            out["score"].append(cls_head(h))
            out["bbox"].append(box_head(h))
            out["kps"].append(kps_head(h))
        return out


def _decode_level(
    score: jax.Array,  # [N, h, w, A]
    bbox: jax.Array,  # [N, h, w, 4A]
    kps: jax.Array,  # [N, h, w, 10A]
    stride: int,
    scores_are_logits: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """SCRFD distance decode: centers at stride-spaced grid points; box and
    landmark regressions are distances in stride units."""
    n, h, w, a = score.shape
    cy = (jnp.arange(h, dtype=jnp.float32) * stride).reshape(1, h, 1, 1)
    cx = (jnp.arange(w, dtype=jnp.float32) * stride).reshape(1, 1, w, 1)

    bbox = bbox.reshape(n, h, w, a, 4) * stride
    boxes = jnp.stack(
        [
            cx - bbox[..., 0],
            cy - bbox[..., 1],
            cx + bbox[..., 2],
            cy + bbox[..., 3],
        ],
        axis=-1,
    ).reshape(n, -1, 4)

    kps = kps.reshape(n, h, w, a, 5, 2) * stride
    kps_abs = jnp.stack(
        [kps[..., 0] + cx[..., None], kps[..., 1] + cy[..., None]], axis=-1
    ).reshape(n, -1, 5, 2)
    scores = score.astype(jnp.float32)
    if scores_are_logits:
        scores = jax.nn.sigmoid(scores)
    scores = scores.reshape(n, -1)
    return scores, boxes, kps_abs


def decode_detections(
    raw: dict[str, list[jax.Array]], config: DetectorConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (scores [N,K], boxes [N,K,4], kps [N,K,5,2]) over all anchors."""
    if len(raw["score"]) != len(config.strides):
        # a 3-level SCRFD raw decoded with the 4-level first-party
        # default would zip-truncate and pair levels with the WRONG
        # strides — half-scale boxes with no error
        raise ValueError(
            f"{len(raw['score'])} pyramid levels vs strides "
            f"{config.strides}: decode config does not match the net"
        )
    all_s, all_b, all_k = [], [], []
    for score, bbox, kps, stride in zip(
        raw["score"], raw["bbox"], raw["kps"], config.strides
    ):
        s, b, k = _decode_level(
            score, bbox, kps, stride, config.scores_are_logits
        )
        all_s.append(s)
        all_b.append(b)
        all_k.append(k)
    return (
        jnp.concatenate(all_s, axis=1),
        jnp.concatenate(all_b, axis=1),
        jnp.concatenate(all_k, axis=1),
    )


def select_largest_face(
    scores: jax.Array,  # [N, K]
    boxes: jax.Array,  # [N, K, 4]
    kps: jax.Array,  # [N, K, 5, 2]
    threshold: float,
    fill_value: float = -1.0,
) -> FaceDetections:
    """Largest confident face per image (get_largest_face_app semantics,
    exp-1:1306-1353) as a masked argmax — fully batched."""
    area = (boxes[..., 2] - boxes[..., 0]).clip(0) * (
        boxes[..., 3] - boxes[..., 1]
    ).clip(0)
    ok = scores >= threshold
    masked_area = jnp.where(ok, area, -jnp.inf)
    best = jnp.argmax(masked_area, axis=1)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((-1,) + (1,) * (x.ndim - 1)), axis=1
    )[:, 0]
    indicators = jnp.any(ok, axis=1)
    f = lambda x: jnp.where(
        indicators.reshape((-1,) + (1,) * (x.ndim - 1)), x, fill_value
    )
    return FaceDetections(
        indicators=indicators,
        bboxes=f(take(boxes)),
        landmarks=f(take(kps)),
        scores=jnp.where(indicators, take(scores), fill_value),
    )


def make_detect_fn(
    net: FaceDetectorNet, params_or_config, config: Optional[DetectorConfig] = None
) -> Callable[..., FaceDetections]:
    """Two forms:
      make_detect_fn(net, config)          -> detect(params, images)  (threaded;
        the GuidanceStack passes params through jit as an argument)
      make_detect_fn(net, params, config)  -> detect(images)          (closure)
    """
    if config is None:
        cfg = params_or_config

        def detect(params, images: jax.Array) -> FaceDetections:
            raw = net.apply({"params": params}, images)
            scores, boxes, kps = decode_detections(raw, cfg)
            return select_largest_face(scores, boxes, kps, cfg.score_threshold)

        return detect

    params = params_or_config

    def detect_closure(images: jax.Array) -> FaceDetections:
        raw = net.apply({"params": params}, images)
        scores, boxes, kps = decode_detections(raw, config)
        return select_largest_face(scores, boxes, kps, config.score_threshold)

    return detect_closure
