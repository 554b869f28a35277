"""Detector training: loss decreases and the trained tiny detector finds
the synthetic face (end-to-end recall check)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fairdiff.guidance.detector_train import (
    detection_loss,
    render_face_scene,
    synthetic_batches,
)
from fairdiff.models.face_detector import (
    DetectorConfig,
    FaceDetectorNet,
    make_detect_fn,
)



import pytest

pytestmark = pytest.mark.slow  # fast subset: pytest -m 'not slow'

def test_render_scene():
    rng = np.random.default_rng(0)
    img, bbox, lms = render_face_scene(rng, 64)
    assert img.shape == (64, 64, 3)
    assert bbox[2] > bbox[0] and bbox[3] > bbox[1]
    # landmarks inside the bbox
    assert (lms[:, 0] >= bbox[0] - 1).all() and (lms[:, 0] <= bbox[2] + 1).all()


def test_detector_learns_synthetic():
    cfg = DetectorConfig.tiny()
    net = FaceDetectorNet(cfg)
    size = 64
    params = net.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, images, boxes, lms):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: detection_loss(net, p, images, boxes, lms, cfg),
            has_aux=True,
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    batches = synthetic_batches(8, size, seed=0)
    losses = []
    for _ in range(60):
        imgs, boxes, lms = next(batches)
        params, opt, loss = step(
            params, opt, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(lms)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    # recall of the trained detector on fresh scenes
    det_cfg_lo = DetectorConfig.tiny()
    detect = make_detect_fn(net, params, dataclassish(det_cfg_lo, 0.3))
    imgs, boxes, _ = next(synthetic_batches(8, size, seed=99))
    det = detect(jnp.asarray(imgs))
    found = float(np.asarray(det.indicators).mean())
    assert found >= 0.5, f"recall {found}"
    # predicted boxes overlap ground truth on found lanes
    got = np.asarray(det.bboxes)
    ok = np.asarray(det.indicators)
    for i in range(8):
        if not ok[i]:
            continue
        ix0 = max(got[i, 0], boxes[i, 0])
        iy0 = max(got[i, 1], boxes[i, 1])
        ix1 = min(got[i, 2], boxes[i, 2])
        iy1 = min(got[i, 3], boxes[i, 3])
        inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
        area_gt = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        assert inter / area_gt > 0.2


def dataclassish(cfg, thr):
    import dataclasses

    return dataclasses.replace(cfg, score_threshold=thr)


def test_small_face_anchor_rescue():
    """The r5 nearest-center rescue on the smallest level: a face below
    the standard [2*stride, 10*stride) gate (or whose central-half
    window is narrower than the grid spacing) gets EXACTLY the grid
    point nearest its center as a positive; face-free -1 boxes still
    yield zero positives; and the old behaviour is reproduced with
    rescue_floor=None (docs/DETECTOR.md scale_small ceiling)."""
    from fairdiff.guidance.detector_train import _level_targets

    stride, hw = 8, (16, 16)
    # 14.5 px face (scale ~0.13 of the 112 template): below the 16 px
    # standard gate -> zero positives without the rescue
    small = jnp.asarray([[60.0, 60.0, 74.0, 75.0]])
    lms = jnp.zeros((1, 5, 2))
    pos_old, _, _ = _level_targets(small, lms, hw, stride, 1)
    assert float(pos_old.sum()) == 0.0
    pos_new, _, _ = _level_targets(
        small, lms, hw, stride, 1, rescue_floor=1.25 * stride
    )
    assert float(pos_new.sum()) == 1.0
    # the positive is the grid point nearest the face center (67.5, 67.5)
    idx = np.unravel_index(int(jnp.argmax(pos_new[0, :, :, 0])), hw)
    assert idx == (8, 8)  # grid point (64, 64)

    # mid-band face whose +-bw/4 window is narrower than the spacing:
    # inside-test can yield zero anchors; the rescue guarantees one
    tight = jnp.asarray([[61.0, 61.0, 78.0, 78.0]])  # 17 px, window +-4.25
    pos_t, _, _ = _level_targets(
        tight, lms, hw, stride, 1, rescue_floor=1.25 * stride
    )
    assert float(pos_t.sum()) >= 1.0

    # below even the rescue floor (8 px face): still zero positives —
    # training must not learn to fire on unassignable scales
    micro = jnp.asarray([[60.0, 60.0, 68.0, 68.0]])
    pos_m, _, _ = _level_targets(
        micro, lms, hw, stride, 1, rescue_floor=1.25 * stride
    )
    assert float(pos_m.sum()) == 0.0

    # -1 fill (no face): zero positives with and without rescue
    neg = jnp.full((1, 4), -1.0)
    pos_n, _, _ = _level_targets(
        neg, lms, hw, stride, 1, rescue_floor=1.25 * stride
    )
    assert float(pos_n.sum()) == 0.0


def test_detection_loss_assigns_small_faces():
    """detection_loss with the production strides now yields positive
    anchors for a 13.4 px face (scale 0.12 — the scale_small eval
    floor), which had NO anchors under the r4 gates."""
    cfg = DetectorConfig.tiny()
    net = FaceDetectorNet(cfg)
    imgs = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.key(0), imgs)["params"]
    boxes = jnp.asarray([[30.0, 30.0, 43.4, 43.4]])
    lms = jnp.full((1, 5, 2), 36.0)
    _, aux = detection_loss(net, params, imgs, boxes, lms, cfg)
    assert float(aux["n_pos"]) >= 1.0
