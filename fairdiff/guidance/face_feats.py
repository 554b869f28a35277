"""Face-recognition features + the CelebA face-feature database.

- `face_embeddings`: flip-sum L2-normalised backbone features
  (`get_face_feats`, exp-1-debias-gender/1-main-debias.py:1179-1190).
- `FaceFeatsDB`: the reference's `FaceFeatsModel` (exp-1:82-117) — a frozen
  matrix of normalised CelebA face embeddings with top-1 dot-product
  semantic search; used to pick realism targets for faces whose identity
  must change (exp-1:1919-1929). `semantic_search` is one [Q,D]x[D,M]
  matmul + argmax — exactly the MXU-friendly form; no external library.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def face_embeddings(
    backbone_fn: Callable[[jax.Array], jax.Array],
    aligned_chips: jax.Array,  # [N, 112, 112, 3] in [-1,1]
    *,
    flip: bool = True,
    normalize: bool = True,
) -> jax.Array:
    feats = backbone_fn(aligned_chips)
    if flip:
        feats = feats + backbone_fn(aligned_chips[:, :, ::-1, :])
    feats = feats.astype(jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)
    return feats


class FaceFeatsDB(NamedTuple):
    feats: jax.Array  # [M, D] L2-normalised
    genders: jax.Array  # [M] int32 (and optionally more attrs)
    extra: dict  # e.g. {"race": [M]} for exp-3+

    @classmethod
    def from_pickle(cls, path: str | Path) -> "FaceFeatsDB":
        """data/3-face-features/*/face_feats.pkl — (feats, genders, logits)
        for exp-1 or (feats, genders, g_logits, races, r_logits) for exp-3+
        (SURVEY.md §2.3)."""
        with open(path, "rb") as f:
            data = pickle.load(f)
        feats = jnp.asarray(np.asarray(data[0]), jnp.float32)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-12)
        genders = jnp.asarray(np.asarray(data[1]).reshape(-1), jnp.int32)
        extra = {}
        if len(data) >= 5:
            extra["race"] = jnp.asarray(np.asarray(data[3]).reshape(-1), jnp.int32)
        return cls(feats, genders, extra)

    def semantic_search(self, queries: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Top-1 cosine match: queries [Q, D] -> (indices [Q], feats [Q, D]).
        Replaces sentence-transformers `util.semantic_search` (exp-1:98-117)."""
        scores = queries @ self.feats.T
        idx = jnp.argmax(scores, axis=-1)
        return idx, self.feats[idx]
