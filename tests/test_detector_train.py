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
