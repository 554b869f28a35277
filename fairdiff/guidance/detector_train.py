"""Face-detector training: losses, anchor assignment, synthetic data.

The reference consumes a pretrained C++/onnx detector (insightface
buffalo_l, SURVEY.md §2.4); fairdiff's detector is its own Flax model
(models/face_detector.py), so the framework carries the training utility
to produce weights: SCRFD-style per-level anchor assignment + focal/L1
losses, plus a synthetic face-scene generator that renders landmark-true
face blobs — enough to train a working detector end-to-end with no
external data (and the template for finetuning on a real face corpus).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.guidance.geometry import ARCFACE_TEMPLATE
from fairdiff.models.face_detector import DetectorConfig, FaceDetectorNet


# ---------------------------------------------------------------------------
# synthetic data
# ---------------------------------------------------------------------------

def render_face_scene(
    rng: np.random.Generator, size: int = 128
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (image [size,size,3] in [-1,1], bbox [4], landmarks [5,2]).

    A face is an elliptical skin-tone blob with dark eye/nose/mouth dots at
    similarity-transformed ArcFace template positions — geometry-true, so a
    detector trained on it learns real localisation/landmark regression.
    """
    img = rng.normal(0.0, 0.15, (size, size, 3)).astype(np.float32)
    scale = rng.uniform(0.25, 0.9) * size / 112.0
    cx = rng.uniform(0.3, 0.7) * size
    cy = rng.uniform(0.3, 0.7) * size
    lms = (ARCFACE_TEMPLATE - 56.0) * scale + np.array([cx, cy])
    half_w, half_h = 52.0 * scale, 60.0 * scale

    ys, xs = np.mgrid[0:size, 0:size]
    ell = ((xs - cx) / half_w) ** 2 + ((ys - cy) / (half_h)) ** 2 <= 1.0
    skin = np.array([0.55, 0.25, 0.05]) + rng.normal(0, 0.05, 3)
    img[ell] = skin + rng.normal(0, 0.05, (int(ell.sum()), 3))
    for lx, ly in lms:
        r = max(1, int(2 * scale))
        y0, y1 = int(ly) - r, int(ly) + r + 1
        x0, x1 = int(lx) - r, int(lx) + r + 1
        img[max(y0, 0) : y1, max(x0, 0) : x1] = -0.7
    bbox = np.array([cx - half_w, cy - half_h, cx + half_w, cy + half_h])
    return np.clip(img, -1, 1), bbox.astype(np.float32), lms.astype(np.float32)


def synthetic_batches(
    batch_size: int, size: int = 128, seed: int = 0
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    while True:
        imgs, boxes, lms = zip(*(render_face_scene(rng, size) for _ in range(batch_size)))
        yield np.stack(imgs), np.stack(boxes), np.stack(lms)


# ---------------------------------------------------------------------------
# assignment + loss
# ---------------------------------------------------------------------------

def _level_targets(
    boxes: jax.Array,  # [N, 4]
    lms: jax.Array,  # [N, 5, 2]
    hw: tuple[int, int],
    stride: int,
    num_anchors: int,
):
    """Positive = grid centers inside the central half of the gt box whose
    scale fits this level's range [stride*2, stride*8] (SCRFD-style)."""
    h, w = hw
    cy = (jnp.arange(h, dtype=jnp.float32) * stride).reshape(1, h, 1)
    cx = (jnp.arange(w, dtype=jnp.float32) * stride).reshape(1, 1, w)
    x0, y0, x1, y1 = (boxes[:, i].reshape(-1, 1, 1) for i in range(4))
    bw, bh = x1 - x0, y1 - y0
    ctr_x, ctr_y = (x0 + x1) / 2, (y0 + y1) / 2
    inside = (
        (cx > ctr_x - bw / 4) & (cx < ctr_x + bw / 4)
        & (cy > ctr_y - bh / 4) & (cy < ctr_y + bh / 4)
    )
    scale = jnp.sqrt(bw * bh)
    fits = (scale >= stride * 2) & (scale < stride * 10)
    pos = (inside & fits).astype(jnp.float32)  # [N, h, w]
    pos = jnp.repeat(pos[..., None], num_anchors, axis=-1)

    # distance targets in stride units
    d = jnp.stack(
        [cx - x0 + 0 * cy, cy - y0 + 0 * cx, x1 - cx + 0 * cy, y1 - cy + 0 * cx],
        axis=-1,
    ) / stride  # [N, h, w, 4]
    zero_hw = (0 * cx + 0 * cy)[..., None]  # [1, h, w, 1] broadcast helper
    kx = lms[:, None, None, :, 0] - cx[..., None] + zero_hw
    ky = lms[:, None, None, :, 1] - cy[..., None] + zero_hw
    k = jnp.stack([kx, ky], axis=-1) / stride  # [N, h, w, 5, 2]
    return pos, d, k


def detection_loss(
    net: FaceDetectorNet,
    params,
    images: jax.Array,
    boxes: jax.Array,
    lms: jax.Array,
    cfg: DetectorConfig,
):
    raw = net.apply({"params": params}, images)
    total_cls = total_box = total_kps = 0.0
    n_pos_total = 0.0
    for score, bbox, kps, stride in zip(
        raw["score"], raw["bbox"], raw["kps"], cfg.strides
    ):
        n, h, w, a = score.shape
        pos, d_tgt, k_tgt = _level_targets(boxes, lms, (h, w), stride, a)
        logits = score.astype(jnp.float32)
        p = jax.nn.sigmoid(logits)
        # focal BCE
        bce = -(
            pos * jnp.log(p.clip(1e-7)) * (1 - p) ** 2
            + (1 - pos) * jnp.log((1 - p).clip(1e-7)) * p**2
        )
        total_cls = total_cls + bce.sum()
        bbox = bbox.reshape(n, h, w, a, 4).astype(jnp.float32)
        kps = kps.reshape(n, h, w, a, 5, 2).astype(jnp.float32)
        box_err = jnp.abs(bbox - d_tgt[:, :, :, None, :]).sum(-1)
        kps_err = jnp.abs(kps - k_tgt[:, :, :, None, :, :]).sum((-1, -2))
        total_box = total_box + (pos * box_err).sum()
        total_kps = total_kps + (pos * kps_err).sum()
        n_pos_total = n_pos_total + pos.sum()
    n_pos_total = jnp.maximum(n_pos_total, 1.0)
    loss = (
        total_cls / (images.shape[0] * 100.0)
        + total_box / n_pos_total
        + 0.2 * total_kps / n_pos_total
    )
    return loss, {
        "cls": total_cls / (images.shape[0] * 100.0),
        "box": total_box / n_pos_total,
        "kps": total_kps / n_pos_total,
        "n_pos": n_pos_total,
    }
