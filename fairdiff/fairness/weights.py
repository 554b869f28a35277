"""Dynamic loss weights and the face-region gradient mask.

- `dynamic_weights`: vectorised `gen_dynamic_weights`
  (exp-1-debias-gender/1-main-debias.py:1619-1633): image-preservation loss
  weight 1 for no-face or kept-identity samples, `factor1` for samples whose
  attribute must change (or whose target is gated to -1).
- `face_region_grad_scale`: the `apply_grad_hook_face` treatment
  (exp-1:1584-1617): inside the intersection of the current and original
  face boxes, the image gradient is scaled by 1 (target == original pred)
  or `factor2` (target differs / gated); outside it is untouched. The
  torch clone/hook/composite dance becomes one custom_vjp with a
  per-sample rectangular mask.
- multi-attribute variants combine per-attribute factors multiplicatively
  exactly like the stacked hooks/weights in exp-3 (:2077-2150).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keep_identity(targets: jax.Array, preds_ori: jax.Array) -> jax.Array:
    """True where the sample's target keeps the originally-predicted class
    (or there is no target): weight 1 in the reference tables."""
    return (targets == preds_ori) & (targets != -1)


def dynamic_weights(
    face_indicators: jax.Array,  # [N] bool
    targets: jax.Array,  # [N] int, -1 fill
    preds_ori: jax.Array,  # [N] int, -1 fill
    factor: float = 0.2,
) -> jax.Array:
    w_face = jnp.where(keep_identity(targets, preds_ori), 1.0, factor)
    return jnp.where(face_indicators, w_face, 1.0)


def _box_mask(shape_hw: tuple[int, int], box: jax.Array) -> jax.Array:
    h, w = shape_hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return (
        (xs >= box[0]) & (xs < box[2]) & (ys >= box[1]) & (ys < box[3])
    ).astype(jnp.float32)


@jax.custom_vjp
def _scale_grad_region(images: jax.Array, scale_map: jax.Array) -> jax.Array:
    return images


def _sgr_fwd(images, scale_map):
    return images, scale_map


def _sgr_bwd(scale_map, g):
    return (g * scale_map, None)


_scale_grad_region.defvjp(_sgr_fwd, _sgr_bwd)


def face_region_grad_scale(
    images: jax.Array,  # [N, H, W, C]
    face_bboxes: jax.Array,  # [N, 4], -1 fill
    face_bboxes_ori: jax.Array,  # [N, 4], -1 fill
    targets: jax.Array,  # [N]
    preds_ori: jax.Array,  # [N]
    factor: float = 0.1,
) -> jax.Array:
    """Identity forward; backward scales the face-region gradient."""
    n, h, w, _ = images.shape
    b = jnp.maximum(face_bboxes, 0).astype(jnp.float32)
    bo = face_bboxes_ori.astype(jnp.float32)
    inter = jnp.stack(
        [
            jnp.maximum(jnp.maximum(b[:, 0], bo[:, 0]), 0.0),
            jnp.maximum(jnp.maximum(b[:, 1], bo[:, 1]), 0.0),
            jnp.minimum(jnp.minimum(b[:, 2], bo[:, 2]), float(w)),
            jnp.minimum(jnp.minimum(b[:, 3], bo[:, 3]), float(h)),
        ],
        axis=-1,
    )
    has_face = (face_bboxes != -1).any(axis=-1)
    factors = jnp.where(keep_identity(targets, preds_ori), 1.0, factor)
    masks = jax.vmap(lambda box: _box_mask((h, w), box))(inter)  # [N,H,W]
    scale = jnp.where(
        has_face[:, None, None],
        masks * factors[:, None, None] + (1.0 - masks),
        1.0,
    )[..., None]
    return _scale_grad_region(images, scale)


def multi_attr_factor(
    targets: dict[str, jax.Array],
    preds_ori: dict[str, jax.Array],
    factors: dict[str, float],
) -> jax.Array:
    """exp-3/4 combination rule (exp-3:1787-1803, :1755-1771): per-sample
    factor = 1 if every attribute keeps its original prediction, else the
    MIN of the factors of the attributes that change (target -1 counts as
    changed)."""
    names = list(targets)
    out = jnp.ones_like(targets[names[0]], dtype=jnp.float32)
    for name in names:
        v = jnp.where(keep_identity(targets[name], preds_ori[name]), 1.0, factors[name])
        out = jnp.minimum(out, v)
    return out


def dynamic_weights_multi(
    face_indicators: jax.Array,
    targets: dict[str, jax.Array],
    preds_ori: dict[str, jax.Array],
    factors: dict[str, float],
    no_face_weight: float | None = None,
) -> jax.Array:
    """Generalised `gen_dynamic_weights`. exp-1 uses no_face_weight=1
    (exp-1:1622); exp-3+ use min(factors) (exp-3:1790-1791) — pass None to
    get min(factors)."""
    if no_face_weight is None:
        no_face_weight = min(factors.values())
    w = multi_attr_factor(targets, preds_ori, factors)
    return jnp.where(face_indicators, w, no_face_weight)


def face_region_grad_scale_multi(
    images: jax.Array,
    face_bboxes: jax.Array,
    face_bboxes_ori: jax.Array,
    targets: dict[str, jax.Array],
    preds_ori: dict[str, jax.Array],
    factors: dict[str, float],
) -> jax.Array:
    """Multi-attribute `apply_grad_hook_face` (exp-3:1740-1784)."""
    n, h, w, _ = images.shape
    b = jnp.maximum(face_bboxes, 0).astype(jnp.float32)
    bo = face_bboxes_ori.astype(jnp.float32)
    inter = jnp.stack(
        [
            jnp.maximum(jnp.maximum(b[:, 0], bo[:, 0]), 0.0),
            jnp.maximum(jnp.maximum(b[:, 1], bo[:, 1]), 0.0),
            jnp.minimum(jnp.minimum(b[:, 2], bo[:, 2]), float(w)),
            jnp.minimum(jnp.minimum(b[:, 3], bo[:, 3]), float(h)),
        ],
        axis=-1,
    )
    has_face = (face_bboxes != -1).any(axis=-1)
    f = multi_attr_factor(targets, preds_ori, factors)
    masks = jax.vmap(lambda box: _box_mask((h, w), box))(inter)
    scale = jnp.where(
        has_face[:, None, None], masks * f[:, None, None] + (1.0 - masks), 1.0
    )[..., None]
    return _scale_grad_region(images, scale)
