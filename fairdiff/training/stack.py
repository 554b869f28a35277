"""GuidanceStack: the frozen analysis models bundled as jittable callables.

The reference loads its frozen zoo as global torch modules
(exp-1-debias-gender/1-main-debias.py:929-994). Here the trainer depends
only on this small callable surface, so tests inject synthetic oracles and
production wires converted Flax models — the train step code is identical
and everything stays inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from fairdiff.guidance.attributes import AttributeSlices, classify_faces
from fairdiff.guidance.face_feats import FaceFeatsDB, face_embeddings
from fairdiff.guidance.faces import FaceAnalysis, analyze_faces
from fairdiff.models.face_detector import FaceDetections

# ImageNet-style stats used by the reference's CLIP/DINO preprocessing
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class AnalysisResult(NamedTuple):
    faces: FaceAnalysis
    attrs: dict  # name -> AttributeOutput
    clip_feats: Optional[jax.Array]
    dino_feats: Optional[jax.Array]
    face_feats: Optional[jax.Array]


@dataclasses.dataclass
class GuidanceStack:
    """Frozen-zoo callables.

    Two wiring styles per component:
      - closure style: `fn(x)` with weights baked in (synthetic oracles,
        tiny tests) — `params` has no entry for that component;
      - threaded style: `fn(component_params, x)` with the weight pytree in
        `params[<name>]` — production. The trainer passes `params` through
        jit as a real argument so multi-GB frozen weights are traced
        arguments, NOT lowering constants baked into the HLO (a 7GB+
        captured-constant bloat otherwise).
    Component keys: detector, classifier, clip, dino, face_embed, face_db.
    """

    detect_fn: Callable[..., FaceDetections]
    classify_fn: Callable[..., jax.Array]  # chips -> raw logits
    slices: AttributeSlices
    clip_feat_fn: Optional[Callable[..., jax.Array]] = None
    dino_feat_fn: Optional[Callable[..., jax.Array]] = None
    face_embed_fn: Optional[Callable[..., jax.Array]] = None
    face_db: Optional[FaceFeatsDB] = None
    chip_size: int = 224
    aligned_size: int = 112
    img_size_small: int = 256  # reference args.img_size_small resize
    params: dict = dataclasses.field(default_factory=dict)

    def _call(self, fn, key: str, params: Optional[dict], x):
        p = (params or self.params).get(key) if (params or self.params) else None
        return fn(p, x) if p is not None else fn(x)

    def get_db(self, params: Optional[dict] = None) -> Optional[FaceFeatsDB]:
        p = params or self.params
        return p.get("face_db") if p and "face_db" in p else self.face_db

    def analyze(
        self,
        images: jax.Array,
        include_semantic: bool = True,
        include_face_feats: bool = True,
        params: Optional[dict] = None,
    ) -> AnalysisResult:
        """Phases 1/3/4 shared analysis: faces -> attributes -> features.
        Everything batched/masked; differentiable w.r.t. images.

        Phase 4 passes include_semantic=False and computes CLIP/DINO feats
        separately on the grad-hooked images, preserving the reference's
        ordering (hook applied after get_face, before CLIP/DINO —
        exp-1:1903-1907)."""
        faces = analyze_faces(
            images,
            self._call(self.detect_fn, "detector", params, images),
            chip_size=self.chip_size,
            aligned_size=self.aligned_size,
        )
        attrs = classify_faces(
            lambda chips: self._call(self.classify_fn, "classifier", params, chips),
            faces.chips, faces.indicators, self.slices,
        )
        face_feats = (
            face_embeddings(
                lambda a: self._call(self.face_embed_fn, "face_embed", params, a),
                faces.aligned,
            )
            if self.face_embed_fn and include_face_feats
            else None
        )
        clip_feats = dino_feats = None
        if include_semantic:
            clip_feats, dino_feats = self.semantic_feats(images, params=params)
        return AnalysisResult(faces, attrs, clip_feats, dino_feats, face_feats)

    def semantic_feats(self, images: jax.Array, params: Optional[dict] = None):
        """CLIP/DINO preservation features on the resized image
        (reference img_size_small resize, exp-1:1904)."""
        small = images
        if self.img_size_small and images.shape[1] != self.img_size_small:
            n, h, w, c = images.shape
            small = jax.image.resize(
                images, (n, self.img_size_small, self.img_size_small, c), "bilinear"
            )
        clip_feats = (
            self._call(self.clip_feat_fn, "clip", params, small)
            if self.clip_feat_fn else None
        )
        dino_feats = (
            self._call(self.dino_feat_fn, "dino", params, small)
            if self.dino_feat_fn else None
        )
        return clip_feats, dino_feats


def normalize_for_clip(images: jax.Array) -> jax.Array:
    """[-1,1] -> CLIP normalisation (exp-1:1151)."""
    x = images * 0.5 + 0.5
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def normalize_for_dino(images: jax.Array) -> jax.Array:
    x = images * 0.5 + 0.5
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
