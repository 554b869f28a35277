"""Differentiable face geometry: bbox math, batched crops, similarity
alignment — pure JAX, NHWC.

Replaces the reference's per-image host-side stack (SURVEY.md §2.4):
  - `expand_bbox` / `crop_face` (exp-1-debias-gender/1-main-debias.py:238-290,
    torchvision crop+pad+resize) -> one batched bilinear warp
  - `image_pipeline` 5-landmark alignment (:292-312, skimage estimate +
    kornia warp_affine) -> closed-form Umeyama + the same warp
All ops are fixed-shape, differentiable w.r.t. the images (the reference
backprops through crop/align in phase 4), and vmappable over the batch —
no GPU->CPU->GPU marshaling per image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ArcFace canonical 112x112 5-point template (exp-1:296-303)
ARCFACE_TEMPLATE = np.array(
    [
        [38.2946, 51.6963],  # left eye
        [73.5318, 51.5014],  # right eye
        [56.0252, 71.7366],  # nose
        [41.5493, 92.3655],  # left mouth corner
        [70.7299, 92.2041],  # right mouth corner
    ],
    dtype=np.float32,
)


def expand_bbox(
    bbox: jax.Array, expand_coef: float, target_ratio: float = 1.0
) -> jax.Array:
    """Vectorised reference `expand_bbox` (exp-1:238-265): grow the box by
    `expand_coef` along its long side and pad the short side to reach
    `target_ratio` (h/w). bbox rows are [x0, y0, x1, y1]; output is rounded
    to integers like the reference. Works on [..., 4]."""
    x0, y0, x1, y1 = jnp.moveaxis(bbox.astype(jnp.float32), -1, 0)
    w = x1 - x0
    h = y1 - y0
    ratio = h / jnp.where(w == 0, 1.0, w)

    tall = ratio > target_ratio
    more_h_tall = h * expand_coef
    more_w_tall = (h + more_h_tall) / target_ratio - w
    more_w_wide = w * expand_coef
    more_h_wide = (w + more_w_wide) * target_ratio - h
    more_w = jnp.where(tall, more_w_tall, more_w_wide)
    more_h = jnp.where(tall, more_h_tall, more_h_wide)

    out = jnp.stack(
        [
            jnp.round(x0 - 0.5 * more_w),
            jnp.round(y0 - 0.5 * more_h),
            jnp.round(x1 + 0.5 * more_w),
            jnp.round(y1 + 0.5 * more_h),
        ],
        axis=-1,
    )
    return out.astype(jnp.int32)


def bilinear_sample(
    image: jax.Array,  # [H, W, C]
    coords: jax.Array,  # [h, w, 2] (x, y) pixel coordinates
    fill_value: float = 0.0,
) -> jax.Array:
    """Bilinear sampling at pixel-center coordinates with constant padding
    (kornia warp_affine 'zeros' generalised to any fill). Differentiable in
    both image and coords."""
    H, W, _ = image.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(ix, iy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        vals = image[iy_c, ix_c]
        return jnp.where(valid[..., None], vals, fill_value)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - dx)[..., None] + v01 * dx[..., None]
    bot = v10 * (1 - dx)[..., None] + v11 * dx[..., None]
    return top * (1 - dy)[..., None] + bot * dy[..., None]


def warp_affine(
    images: jax.Array,  # [N, H, W, C]
    mats: jax.Array,  # [N, 2, 3] src->dst affine (pixel coords)
    out_hw: tuple[int, int],
    fill_value: float = 0.0,
) -> jax.Array:
    """Batched affine warp: output pixel (u,v) samples input at
    M^{-1} (u,v,1). Matches kornia.warp_affine semantics up to the
    half-pixel convention."""
    h, w = out_hw
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    grid = jnp.stack([uu, vv], axis=-1)  # [h, w, 2]

    def one(image, m):
        a = m[:, :2]  # 2x2
        t = m[:, 2]
        inv_a = jnp.linalg.inv(a)
        src = (grid - t) @ inv_a.T
        return bilinear_sample(image, src, fill_value)

    return jax.vmap(one)(images, mats.astype(jnp.float32))


def crop_and_resize(
    images: jax.Array,  # [N, H, W, C]
    bboxes: jax.Array,  # [N, 4] int or float [x0,y0,x1,y1]
    target_size: int,
    fill_value: float = -1.0,
) -> jax.Array:
    """Batched `crop_face` (exp-1:267-290): crop the (possibly
    out-of-bounds) box, pad with fill_value, resize to target.

    Implemented as a single bilinear warp whose affine maps the bbox onto
    the output square — the fused TPU form of crop+pad+resize."""
    b = bboxes.astype(jnp.float32)
    sx = (b[:, 2] - b[:, 0]) / target_size
    sy = (b[:, 3] - b[:, 1]) / target_size
    # dst->src: x_src = x0 + (u + .5) * sx - .5  (pixel-center convention)
    zeros = jnp.zeros_like(sx)
    m_inv = jnp.stack(
        [
            jnp.stack([sx, zeros, b[:, 0] + 0.5 * sx - 0.5], axis=-1),
            jnp.stack([zeros, sy, b[:, 1] + 0.5 * sy - 0.5], axis=-1),
        ],
        axis=1,
    )  # [N,2,3] maps dst->src directly

    h, w = target_size, target_size
    uu, vv = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    grid = jnp.stack([uu, vv], axis=-1)

    def one(image, m):
        src = grid @ m[:, :2].T + m[:, 2]
        return bilinear_sample(image, src, fill_value)

    return jax.vmap(one)(images, m_inv)


def estimate_similarity(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Closed-form Umeyama similarity (rotation+scale+translation) mapping
    src -> dst; both [K, 2]. Returns [2, 3] affine. Equivalent to
    skimage.transform.SimilarityTransform.estimate (exp-1:305-306)."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]  # [2,2]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.stack([1.0, d])
    r = (u * diag[None, :]) @ vt
    var_s = (sc**2).sum() / src.shape[0]
    scale = (s * diag).sum() / jnp.where(var_s == 0, 1.0, var_s)
    t = mu_d - scale * (r @ mu_s)
    return jnp.concatenate([scale * r, t[:, None]], axis=1)


def align_faces(
    images: jax.Array,  # [N, H, W, C] in [-1, 1]
    landmarks: jax.Array,  # [N, 5, 2]
    out_size: int = 112,
    fill_value: float = -1.0,
) -> jax.Array:
    """Batched `image_pipeline` (exp-1:292-312): similarity-align the
    5-point landmarks to the ArcFace template and warp. Input/output in
    [-1,1]. The reference round-trips through [0,255] and pads with 0
    there, which is -1.0 after mapping back — hence the default fill."""
    template = jnp.asarray(ARCFACE_TEMPLATE)
    mats = jax.vmap(lambda lm: estimate_similarity(lm, template))(landmarks)
    return warp_affine(images, mats, (out_size, out_size), fill_value)
