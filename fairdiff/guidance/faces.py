"""The batched face-analysis front door — `get_face` re-imagined.

Reference `get_face` (exp-1-debias-gender/1-main-debias.py:1192-1215) runs
insightface per image on CPU, falls back to dlib, and assembles
indicator/bbox/chip/landmark/aligned-chip tensors with -1 fills. Here the
whole pipeline — detect -> expand bbox -> crop 224 chip -> align 112 chip —
is one fixed-shape jittable function over the batch, differentiable w.r.t.
the images (crops/warps are bilinear), which is what lets the fairness loss
backprop into the sampler without leaving the device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from fairdiff.guidance import geometry as geo
from fairdiff.models.face_detector import FaceDetections


class FaceAnalysis(NamedTuple):
    indicators: jax.Array  # [N] bool
    bboxes: jax.Array  # [N, 4] int32 (expanded), -1 fill
    chips: jax.Array  # [N, S, S, 3] in [-1,1], fill rows
    landmarks: jax.Array  # [N, 5, 2], -1 fill
    aligned: jax.Array  # [N, 112, 112, 3], fill rows


def analyze_faces(
    images: jax.Array,  # [N, H, W, 3] in [-1,1]
    detections: FaceDetections,
    *,
    chip_size: int = 224,
    aligned_size: int = 112,
    expand_coef: float = 0.5,
    fill_value: float = -1.0,
) -> FaceAnalysis:
    """detect -> expand(0.5, ratio 1) -> crop chip -> landmark-align.

    expand_coef=0.5 matches the insightface path (exp-1:1336); the dlib
    fallback used 1.1 (exp-1:1270) — with a single detector there is a
    single coefficient.
    """
    ind = detections.indicators
    # expand around a valid placeholder box for dead lanes to keep warps sane
    safe_box = jnp.where(
        ind[:, None], detections.bboxes, jnp.asarray([0.0, 0.0, 32.0, 32.0])
    )
    expanded = geo.expand_bbox(safe_box, expand_coef, 1.0)
    chips = geo.crop_and_resize(images, expanded, chip_size, fill_value)

    safe_lms = jnp.where(
        ind[:, None, None],
        detections.landmarks,
        jnp.asarray(geo.ARCFACE_TEMPLATE),
    )
    aligned = geo.align_faces(images, safe_lms, aligned_size, fill_value)

    f = lambda x: jnp.where(ind.reshape((-1,) + (1,) * (x.ndim - 1)), x, fill_value)
    return FaceAnalysis(
        indicators=ind,
        bboxes=jnp.where(ind[:, None], expanded, jnp.int32(fill_value)),
        chips=f(chips),
        landmarks=f(safe_lms),
        aligned=f(aligned),
    )


def get_face(
    images: jax.Array,
    detect_fn: Callable[[jax.Array], FaceDetections],
    **kwargs,
) -> FaceAnalysis:
    """Full `get_face` analogue: any detector honoring the FaceDetections
    contract (trained FaceDetectorNet, a composed two-stage detector, or a
    synthetic oracle in tests)."""
    return analyze_faces(images, detect_fn(images), **kwargs)


def merge_detections(a: FaceDetections, b: FaceDetections) -> FaceDetections:
    """Lanes `a` missed are filled from `b` (reference two-stage semantics:
    dlib results are only consulted where insightface found nothing,
    exp-1:1203-1213)."""
    use_b = ~a.indicators
    pick = lambda x, y: jnp.where(
        use_b.reshape((-1,) + (1,) * (x.ndim - 1)), y, x
    )
    return FaceDetections(
        indicators=a.indicators | b.indicators,
        bboxes=pick(a.bboxes, b.bboxes),
        landmarks=pick(a.landmarks, b.landmarks),
        scores=pick(a.scores, b.scores),
    )


def compose_detectors(
    primary: Callable[[jax.Array], FaceDetections],
    fallback: Callable[[jax.Array], FaceDetections],
) -> Callable[[jax.Array], FaceDetections]:
    """Two-stage detection parity (exp-1:1192-1215): lanes the primary
    misses are filled from the fallback. Both run batched (the fallback's
    cost is amortised; no host round-trip). Closure style — weights baked
    in; for the GuidanceStack's threaded-params style use
    `compose_detect_fns`."""

    def detect(images: jax.Array) -> FaceDetections:
        return merge_detections(primary(images), fallback(images))

    return detect


def compose_detect_fns(
    primary: Callable[..., FaceDetections],
    fallback: Callable[..., FaceDetections],
) -> Callable[..., FaceDetections]:
    """Threaded-params two-stage detector: `detect(params, images)` where
    `params = {"primary": ..., "fallback": ...}` — this is what
    model_zoo.load_guidance_stack stores under stack.params["detector"], so
    both weight trees ride through jit as arguments like every other frozen
    model."""

    def detect(params, images: jax.Array) -> FaceDetections:
        return merge_detections(
            primary(params["primary"], images),
            fallback(params["fallback"], images),
        )

    return detect
