"""Composite fairness loss (phase-4 semantics of the reference train step).

Reference (exp-1-debias-gender/1-main-debias.py:1879-1940):
  loss = loss_fair + w_img * dyn_w * (loss_CLIP + loss_DINO) + w_face * loss_face
with the quirk that loss_fair/loss_face are the CONSTANT -1 on masked lanes
(constants don't affect gradients; the chunk mean still divides by the full
lane count). We reproduce the gradient semantics with masked zeros and keep
the -1s only in the returned per-lane logs.

  loss_fair: CE(attribute logits, dynamic target) where face & target valid
  loss_CLIP/loss_DINO: 1 - cos(feat, feat_ori) on every lane
  loss_face: 1 - cos(face_embed, target_embed); target from the ORIGINAL
    image's embedding when identity is kept with confidence >= level
    (exp-1:1917-1923), else the top-1 CelebA DB match of the current
    embedding (exp-1:1925-1929) — DB rows are constants (stop-gradient).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fairdiff.guidance.face_feats import FaceFeatsDB


class FairLossOutput(NamedTuple):
    total: jax.Array  # scalar — mean over lanes (reference chunk mean)
    logs: dict


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-sample CE with arbitrary (possibly -1) targets; caller masks."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_t = jnp.clip(targets, 0, logits.shape[-1] - 1)
    return -jnp.take_along_axis(logp, safe_t[:, None], axis=-1)[:, 0]


def cosine_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return 1.0 - (a * b).sum(axis=-1)


def fair_ce_loss(
    logits: jax.Array, targets: jax.Array, face_indicators: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """-> (per-lane CE masked to 0, valid mask) (exp-1:1920-1924)."""
    valid = face_indicators & (targets != -1)
    ce = cross_entropy(logits.astype(jnp.float32), targets)
    return jnp.where(valid, ce, 0.0), valid


def face_realism_loss(
    face_embeds: jax.Array,  # [N, D] current, normalised
    face_embeds_ori: jax.Array,  # [N, D] original image's, normalised
    face_indicators: jax.Array,  # [N]
    targets: jax.Array,  # [N]
    preds_ori: jax.Array,  # [N]
    probs_ori_max: jax.Array,  # [N] original confidence
    db: Optional[FaceFeatsDB],
    confidence_level: float = 0.9,
) -> tuple[jax.Array, jax.Array]:
    """-> (per-lane loss masked to 0, valid mask)."""
    valid = face_indicators & (targets != -1)
    from_ori = valid & (targets == preds_ori) & (probs_ori_max >= confidence_level)
    if db is not None:
        _, searched = db.semantic_search(jax.lax.stop_gradient(face_embeds))
    else:
        searched = jax.lax.stop_gradient(face_embeds)
    target_embeds = jnp.where(from_ori[:, None], face_embeds_ori, searched)
    loss = cosine_loss(face_embeds, jax.lax.stop_gradient(target_embeds))
    return jnp.where(valid, loss, 0.0), valid


def composite_loss(
    *,
    loss_fair: jax.Array,  # [N] masked-to-0
    loss_clip: jax.Array,  # [N]
    loss_dino: jax.Array,  # [N]
    loss_face: jax.Array,  # [N] masked-to-0
    dynamic_w: jax.Array,  # [N]
    weight_img: float = 8.0,
    weight_face: float = 1.0,
    fair_valid: Optional[jax.Array] = None,
    face_valid: Optional[jax.Array] = None,
) -> FairLossOutput:
    per_lane = (
        loss_fair
        + weight_img * dynamic_w * (loss_clip + loss_dino)
        + weight_face * loss_face
    )
    logs = {
        "loss_fair": jnp.where(
            fair_valid if fair_valid is not None else loss_fair != 0, loss_fair, -1.0
        ),
        "loss_face": jnp.where(
            face_valid if face_valid is not None else loss_face != 0, loss_face, -1.0
        ),
        "loss_CLIP": loss_clip,
        "loss_DINO": loss_dino,
        "loss": per_lane,
    }
    return FairLossOutput(per_lane.mean(), logs)
