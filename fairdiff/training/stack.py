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
    detect_fn: Callable[[jax.Array], FaceDetections]
    classify_fn: Callable[[jax.Array], jax.Array]  # chips -> raw logits
    slices: AttributeSlices
    clip_feat_fn: Optional[Callable[[jax.Array], jax.Array]] = None
    dino_feat_fn: Optional[Callable[[jax.Array], jax.Array]] = None
    face_embed_fn: Optional[Callable[[jax.Array], jax.Array]] = None
    face_db: Optional[FaceFeatsDB] = None
    chip_size: int = 224
    aligned_size: int = 112
    img_size_small: int = 256  # reference args.img_size_small resize

    def analyze(self, images: jax.Array, include_semantic: bool = True) -> AnalysisResult:
        """Phases 1/3/4 shared analysis: faces -> attributes -> features.
        Everything batched/masked; differentiable w.r.t. images.

        Phase 4 passes include_semantic=False and computes CLIP/DINO feats
        separately on the grad-hooked images, preserving the reference's
        ordering (hook applied after get_face, before CLIP/DINO —
        exp-1:1903-1907)."""
        faces = analyze_faces(
            images,
            self.detect_fn(images),
            chip_size=self.chip_size,
            aligned_size=self.aligned_size,
        )
        attrs = classify_faces(self.classify_fn, faces.chips, faces.indicators, self.slices)
        face_feats = (
            face_embeddings(self.face_embed_fn, faces.aligned)
            if self.face_embed_fn
            else None
        )
        clip_feats = dino_feats = None
        if include_semantic:
            clip_feats, dino_feats = self.semantic_feats(images)
        return AnalysisResult(faces, attrs, clip_feats, dino_feats, face_feats)

    def semantic_feats(self, images: jax.Array):
        """CLIP/DINO preservation features on the resized image
        (reference img_size_small resize, exp-1:1904)."""
        small = images
        if self.img_size_small and images.shape[1] != self.img_size_small:
            n, h, w, c = images.shape
            small = jax.image.resize(
                images, (n, self.img_size_small, self.img_size_small, c), "bilinear"
            )
        clip_feats = self.clip_feat_fn(small) if self.clip_feat_fn else None
        dino_feats = self.dino_feat_fn(small) if self.dino_feat_fn else None
        return clip_feats, dino_feats


def normalize_for_clip(images: jax.Array) -> jax.Array:
    """[-1,1] -> CLIP normalisation (exp-1:1151)."""
    x = images * 0.5 + 0.5
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def normalize_for_dino(images: jax.Array) -> jax.Array:
    x = images * 0.5 + 0.5
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
