"""Attribute-classifier heads with the reference's -1 fill-value contract.

Replaces the selector/scatter plumbing of `get_face_gender[_race[_age]]`
(exp-1-debias-gender/1-main-debias.py:1355-1401, exp-3:1387-1459,
exp-4:1378-1402, exp-6:1365-1380) with fixed-shape masked computation:
every image runs through the classifier (dead lanes compute on fill-value
chips — cheaper on TPU than dynamic gathering), and invalid rows are
overwritten with `fill_value` so downstream code sees the identical
contract (`probs == -1` rows are skipped by target generation, exp-1:1417).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class AttributeOutput(NamedTuple):
    preds: jax.Array  # [N] int32, fill_value where no face
    probs: jax.Array  # [N, C], fill_value rows where no face
    logits: jax.Array  # [N, C], fill_value rows where no face


@dataclasses.dataclass(frozen=True)
class AttributeSlices:
    """How to cut per-attribute logits out of a classifier's output."""

    extract: Callable[[jax.Array], dict[str, jax.Array]]


def celeba_slices() -> AttributeSlices:
    """CelebA 80-logit head: 40 attributes x 2; gender is attribute 20
    (exp-1:1370)."""

    def extract(logits: jax.Array) -> dict[str, jax.Array]:
        n = logits.shape[0]
        return {"gender": logits.reshape(n, -1, 2)[:, 20, :]}

    return AttributeSlices(extract)


def fairface_gender_race_slices() -> AttributeSlices:
    """FairFace 6-logit head: gender=[:, :2], race=[:, 2:6] (exp-3:1403-1406,
    exp-6 uses the race slice only, exp-6:1379-1380)."""

    def extract(logits: jax.Array) -> dict[str, jax.Array]:
        return {"gender": logits[:, :2], "race": logits[:, 2:6]}

    return AttributeSlices(extract)


def fairface_gender_race_age_slices() -> AttributeSlices:
    """FairFace 8-logit head: gender/race4/age2 (exp-4:931-937)."""

    def extract(logits: jax.Array) -> dict[str, jax.Array]:
        return {
            "gender": logits[:, :2],
            "race": logits[:, 2:6],
            "age": logits[:, 6:8],
        }

    return AttributeSlices(extract)


def classify_faces(
    classifier_fn: Callable[[jax.Array], jax.Array],
    face_chips: jax.Array,  # [N, S, S, 3] in [-1,1], fill rows where no face
    face_indicators: jax.Array,  # [N] bool
    slices: AttributeSlices,
    fill_value: float = -1.0,
) -> dict[str, AttributeOutput]:
    """Run the attribute classifier on every chip and mask invalid rows.

    classifier_fn: chips -> raw logits (e.g. MobileNetV3Large.apply bound
    with converted params).
    """
    raw = classifier_fn(face_chips).astype(jnp.float32)
    out: dict[str, AttributeOutput] = {}
    valid = face_indicators
    for name, logits in slices.extract(raw).items():
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        fill_i = jnp.int32(fill_value)
        out[name] = AttributeOutput(
            preds=jnp.where(valid, preds, fill_i),
            probs=jnp.where(valid[:, None], probs, fill_value),
            logits=jnp.where(valid[:, None], logits, fill_value),
        )
    return out
