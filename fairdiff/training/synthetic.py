"""Synthetic guidance oracles — CI/smoke stand-ins for the frozen zoo.

Used by the test-suite and the CLI's --tiny_smoke mode so the complete
4-phase trainer runs end-to-end on a CPU mesh with no model assets: the
detector always fires at a fixed box, attribute logits are a differentiable
function of chip statistics, features are channel means. This mirrors the
reference's design point that the trainer only consumes the guidance
*contract* (SURVEY.md §2: tensor-in/tensor-out fns with -1 fills).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fairdiff.guidance import geometry as geo
from fairdiff.guidance.attributes import AttributeSlices
from fairdiff.guidance.face_feats import FaceFeatsDB
from fairdiff.models.face_detector import FaceDetections
from fairdiff.training.stack import GuidanceStack


def oracle_detect(images: jax.Array) -> FaceDetections:
    n, h, w, _ = images.shape
    scale = h / 64.0
    lms = ((geo.ARCFACE_TEMPLATE - 56.0) * 0.3 + 32.0) * scale
    return FaceDetections(
        indicators=jnp.ones((n,), bool),
        bboxes=jnp.tile(
            jnp.asarray([[16.0, 16.0, 48.0, 48.0]]) * scale, (n, 1)
        ),
        landmarks=jnp.tile(jnp.asarray(lms)[None], (n, 1, 1)),
        scores=jnp.full((n,), 0.9),
    )


def synthetic_classifier(num_attrs: int = 1):
    """chips -> logits with 2+4+2 class blocks driven by channel stats."""

    def classify(chips: jax.Array) -> jax.Array:
        m = chips.mean(axis=(1, 2))  # [N, 3]
        gender = jnp.stack([m[:, 0] - m[:, 1], m[:, 1] - m[:, 0]], -1) * 5.0
        # Race logits are QUADRANT CONTRASTS, not global channel means.
        # The earlier global-mean race head made the exp-3 OT demo
        # degenerate two ways (both observed, r5): at x5 the posteriors
        # were so flat that every sampled transport plan disagreed, and
        # sharpened global means made all lanes argmax the SAME class
        # with near-identical probs — either way 1-max marginal
        # uncertainty sat above the production 0.2 gate (exp-3:
        # 2022-2023) and the race CE signal silently vanished. Zero-mean
        # spatial contrasts vary in sign across noise draws (lane
        # diversity, like real SD samples vary in perceived race), are
        # sharp at x12, and remain trainable (the model can shape
        # quadrant structure). Gender stays at x5 global means — the
        # exp-1 convergence regression pins its dynamics.
        h2, w2 = chips.shape[1] // 2, chips.shape[2] // 2
        tl = chips[:, :h2, :w2].mean(axis=(1, 2))
        tr = chips[:, :h2, w2:].mean(axis=(1, 2))
        bl = chips[:, h2:, :w2].mean(axis=(1, 2))
        br = chips[:, h2:, w2:].mean(axis=(1, 2))
        race = jnp.stack(
            [
                tl[:, 0] - br[:, 0],
                tr[:, 1] - bl[:, 1],
                bl[:, 2] - tr[:, 2],
                br[:, 0] - tl[:, 1],
            ],
            -1,
        ) * 12.0
        age = jnp.stack([m[:, 2] - m[:, 0], m[:, 0] - m[:, 2]], -1) * 15.0
        return jnp.concatenate([gender, race, age], axis=-1)

    return classify


def synthetic_slices(attributes: tuple[str, ...]) -> AttributeSlices:
    spans = {"gender": (0, 2), "race": (2, 6), "age": (6, 8)}

    def extract(logits):
        return {a: logits[:, spans[a][0] : spans[a][1]] for a in attributes}

    return AttributeSlices(extract)


def feat_fn(images: jax.Array) -> jax.Array:
    f = images.mean(axis=(1, 2))
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True).clip(1e-6)


def synthetic_stack(attributes: tuple[str, ...] = ("gender",)) -> GuidanceStack:
    key = jax.random.key(7)
    feats = jax.random.normal(key, (8, 3))
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return GuidanceStack(
        detect_fn=oracle_detect,
        classify_fn=synthetic_classifier(),
        slices=synthetic_slices(attributes),
        clip_feat_fn=feat_fn,
        dino_feat_fn=feat_fn,
        face_embed_fn=lambda chips: chips.mean(axis=(1, 2)),
        face_db=FaceFeatsDB(feats, jnp.zeros(8, jnp.int32), {}),
        chip_size=32,
        aligned_size=32,
        img_size_small=0,
    )
