"""Geometry tests: reference-semantics bbox math, warp vs OpenCV,
Umeyama vs OpenCV's similarity estimator, differentiability."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.guidance import geometry as geo


def _ref_expand_bbox(bbox, expand_coef, target_ratio):
    # verbatim logic of exp-1:238-265 in plain python
    bw = bbox[2] - bbox[0]
    bh = bbox[3] - bbox[1]
    ratio = bh / bw
    if ratio > target_ratio:
        mh = bh * expand_coef
        mw = (bh + mh) / target_ratio - bw
    else:
        mw = bw * expand_coef
        mh = (bw + mw) * target_ratio - bh
    return [
        int(round(bbox[0] - mw * 0.5)),
        int(round(bbox[1] - mh * 0.5)),
        int(round(bbox[2] + mw * 0.5)),
        int(round(bbox[3] + mh * 0.5)),
    ]


def test_expand_bbox_matches_reference():
    rng = np.random.default_rng(0)
    for coef, ratio in [(0.5, 1.0), (1.1, 1.0), (0.3, 1.5)]:
        boxes = []
        for _ in range(20):
            x0, y0 = rng.uniform(-20, 400, 2)
            w, h = rng.uniform(5, 200, 2)
            boxes.append([x0, y0, x0 + w, y0 + h])
        got = np.asarray(geo.expand_bbox(jnp.asarray(boxes), coef, ratio))
        ref = np.asarray([_ref_expand_bbox(b, coef, ratio) for b in boxes])
        # np.round vs python round(half-away): allow 1px slack on ties
        assert np.abs(got - ref).max() <= 1
        assert (np.abs(got - ref) > 0).mean() < 0.2


def test_warp_affine_vs_cv2():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    theta = 0.3
    m = np.array(
        [[np.cos(theta) * 1.2, -np.sin(theta) * 1.2, 5.0],
         [np.sin(theta) * 1.2, np.cos(theta) * 1.2, -3.0]],
        dtype=np.float32,
    )
    got = np.asarray(
        geo.warp_affine(jnp.asarray(img)[None], jnp.asarray(m)[None], (32, 32))
    )[0]
    ref = cv2.warpAffine(
        img, m, (32, 32), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT
    )
    # interiors must match; borders differ by interpolation convention
    inner = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(got[inner], ref[inner], atol=2e-3)


def test_crop_and_resize_identity_and_padding():
    img = jnp.arange(16.0).reshape(1, 4, 4, 1)
    # identity box: crop == resize to same size
    out = geo.crop_and_resize(img, jnp.array([[0, 0, 4, 4]]), 4, fill_value=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # fully out-of-bounds box -> all fill
    out2 = geo.crop_and_resize(img, jnp.array([[10, 10, 14, 14]]), 4, fill_value=-1)
    np.testing.assert_allclose(np.asarray(out2), -1.0)


def test_estimate_similarity_vs_cv2():
    rng = np.random.default_rng(2)
    theta, scale = 0.4, 1.3
    r = scale * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    t = np.array([7.0, -2.0])
    src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
    dst = src @ r.T + t
    m = np.asarray(geo.estimate_similarity(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(m[:, :2], r, atol=1e-4)
    np.testing.assert_allclose(m[:, 2], t, atol=1e-3)

    # noisy case vs cv2 least-squares similarity
    dst_noisy = dst + rng.normal(0, 0.5, dst.shape)
    m2 = np.asarray(
        geo.estimate_similarity(jnp.asarray(src), jnp.asarray(dst_noisy))
    )
    mcv, _ = cv2.estimateAffinePartial2D(
        src.reshape(-1, 1, 2), dst_noisy.reshape(-1, 1, 2), method=cv2.LMEDS
    )
    np.testing.assert_allclose(m2, mcv, atol=0.15)


def test_align_faces_shapes_and_grad():
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    lms = jnp.asarray(
        np.stack([geo.ARCFACE_TEMPLATE * 0.5 + 10, geo.ARCFACE_TEMPLATE * 0.4 + 5])
    )
    out = geo.align_faces(imgs, lms, 112)
    assert out.shape == (2, 112, 112, 3)

    g = jax.grad(lambda im: geo.align_faces(im, lms, 112).sum())(imgs)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0
