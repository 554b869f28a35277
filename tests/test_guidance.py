"""Guidance stack tests: detector decode/selection, face analysis with fill
contract, attribute heads, face-feature DB, two-stage composition."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from fairdiff.guidance import geometry as geo
from fairdiff.guidance.attributes import (
    celeba_slices,
    classify_faces,
    fairface_gender_race_age_slices,
)
from fairdiff.guidance.face_feats import FaceFeatsDB, face_embeddings
from fairdiff.guidance.faces import analyze_faces, compose_detectors, get_face
from fairdiff.models.face_detector import (
    DetectorConfig,
    FaceDetections,
    FaceDetectorNet,
    decode_detections,
    make_detect_fn,
    select_largest_face,
)


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_detector_shapes_and_decode():
    cfg = DetectorConfig.tiny()
    net = FaceDetectorNet(cfg)
    imgs = jnp.zeros((2, 64, 64, 3))
    params = net.init(jax.random.key(0), imgs)["params"]
    raw = net.apply({"params": params}, imgs)
    # r5: a stride-4 P2 level joins SCRFD's (8,16,32) for small faces
    assert len(raw["score"]) == 4
    assert raw["score"][0].shape == (2, 16, 16, cfg.num_anchors)
    scores, boxes, kps = decode_detections(raw, cfg)
    k = (16 * 16 + 8 * 8 + 4 * 4 + 2 * 2) * cfg.num_anchors
    assert scores.shape == (2, k)
    assert boxes.shape == (2, k, 4)
    assert kps.shape == (2, k, 5, 2)

    det = make_detect_fn(net, params, cfg)(imgs)
    assert det.indicators.shape == (2,)


def test_select_largest_face():
    scores = jnp.array([[0.9, 0.8, 0.2], [0.1, 0.2, 0.3]])
    boxes = jnp.array(
        [
            [[0, 0, 10, 10], [0, 0, 30, 30], [0, 0, 100, 100]],
            [[0, 0, 10, 10], [0, 0, 20, 20], [0, 0, 5, 5]],
        ],
        jnp.float32,
    )
    kps = jnp.zeros((2, 3, 5, 2))
    det = select_largest_face(scores, boxes, kps, threshold=0.5)
    # image 0: faces 0,1 confident; face 1 is larger
    assert bool(det.indicators[0]) and not bool(det.indicators[1])
    np.testing.assert_allclose(np.asarray(det.bboxes[0]), [0, 0, 30, 30])
    np.testing.assert_allclose(np.asarray(det.bboxes[1]), -1)
    np.testing.assert_allclose(np.asarray(det.scores[1]), -1)


def _oracle_detection(n, valid_mask):
    """Synthetic oracle: face at center 16..48 with template landmarks."""
    lms = (geo.ARCFACE_TEMPLATE - 56) * 0.3 + 32
    return FaceDetections(
        indicators=jnp.asarray(valid_mask),
        bboxes=jnp.tile(jnp.asarray([[16.0, 16.0, 48.0, 48.0]]), (n, 1)),
        landmarks=jnp.tile(jnp.asarray(lms)[None], (n, 1, 1)),
        scores=jnp.full((n,), 0.99),
    )


def test_analyze_faces_fill_contract():
    imgs = jax.random.uniform(jax.random.key(0), (3, 64, 64, 3), minval=-1, maxval=1)
    det = _oracle_detection(3, [True, False, True])
    fa = analyze_faces(imgs, det, chip_size=32, aligned_size=112)
    assert fa.chips.shape == (3, 32, 32, 3)
    assert fa.aligned.shape == (3, 112, 112, 3)
    # dead lane fully filled with -1
    np.testing.assert_allclose(np.asarray(fa.chips[1]), -1.0)
    np.testing.assert_allclose(np.asarray(fa.bboxes[1]), -1)
    np.testing.assert_allclose(np.asarray(fa.landmarks[1]), -1.0)
    # live lanes contain image content (not fill)
    assert float(jnp.abs(fa.chips[0] + 1).max()) > 0.1


def test_analyze_faces_differentiable():
    det = _oracle_detection(2, [True, True])

    def loss(imgs):
        fa = analyze_faces(imgs, det, chip_size=16)
        return (fa.chips**2).sum() + (fa.aligned**2).sum()

    imgs = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3), minval=-1, maxval=1)
    g = jax.grad(loss)(imgs)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_compose_detectors():
    a = lambda im: _oracle_detection(2, [True, False])
    b_det = FaceDetections(
        indicators=jnp.asarray([True, True]),
        bboxes=jnp.full((2, 4), 7.0),
        landmarks=jnp.zeros((2, 5, 2)),
        scores=jnp.full((2,), 0.6),
    )
    b = lambda im: b_det
    det = compose_detectors(a, b)(jnp.zeros((2, 8, 8, 3)))
    assert bool(det.indicators.all())
    np.testing.assert_allclose(np.asarray(det.bboxes[0]), [16, 16, 48, 48])
    np.testing.assert_allclose(np.asarray(det.bboxes[1]), 7.0)


def test_classify_faces_masks():
    def fake_classifier(chips):
        n = chips.shape[0]
        base = jnp.arange(n, dtype=jnp.float32)[:, None]
        return jnp.tile(base, (1, 80)) + jnp.arange(80)[None, :] * 0.01

    chips = jnp.zeros((4, 8, 8, 3))
    ind = jnp.asarray([True, True, False, True])
    out = classify_faces(fake_classifier, chips, ind, celeba_slices())
    g = out["gender"]
    assert g.preds.shape == (4,) and g.probs.shape == (4, 2)
    assert int(g.preds[2]) == -1
    np.testing.assert_allclose(np.asarray(g.probs[2]), -1.0)
    assert int(g.preds[0]) == 1  # higher logit at col 41 vs 40

    def fake8(chips):
        return jnp.tile(
            jnp.asarray([[0.0, 1.0, 0, 0, 2.0, 0, 3.0, 0.0]]), (chips.shape[0], 1)
        )

    out3 = classify_faces(fake8, chips, ind, fairface_gender_race_age_slices())
    assert set(out3) == {"gender", "race", "age"}
    assert int(out3["gender"].preds[0]) == 1
    assert int(out3["race"].preds[0]) == 2
    assert int(out3["age"].preds[0]) == 0


def test_face_feats_db(tmp_path):
    import pickle

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(10, 16)).astype(np.float32)
    genders = rng.integers(0, 2, 10)
    with open(tmp_path / "f.pkl", "wb") as f:
        pickle.dump([feats, genders, None], f)
    db = FaceFeatsDB.from_pickle(tmp_path / "f.pkl")
    # querying a db row returns itself
    q = db.feats[3:5]
    idx, found = db.semantic_search(q)
    np.testing.assert_array_equal(np.asarray(idx), [3, 4])
    np.testing.assert_allclose(np.asarray(found), np.asarray(q))


def test_face_embeddings_flip_sum():
    def backbone(x):
        return x.sum(axis=(1, 2))  # [N, C]

    chips = jax.random.uniform(jax.random.key(0), (2, 8, 8, 4))
    e = face_embeddings(backbone, chips)
    norms = jnp.linalg.norm(e, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)


def test_compose_detect_fns_threaded():
    """model_zoo two-stage wiring: params={'primary','fallback'} threads
    each weight tree to its detector; the fallback fills ONLY missed lanes
    (exp-1:1203-1213 — dlib consulted only where insightface found
    nothing), and each detector provably received its own params."""
    from fairdiff.guidance.faces import compose_detect_fns

    def primary(p, im):
        d = _oracle_detection(2, [True, False])
        return d._replace(bboxes=d.bboxes + p["shift"])

    def fallback(p, im):
        return FaceDetections(
            indicators=jnp.asarray([True, True]),
            bboxes=jnp.full((2, 4), 7.0) + p["shift"],
            landmarks=jnp.zeros((2, 5, 2)),
            scores=jnp.full((2,), 0.6),
        )

    detect = compose_detect_fns(primary, fallback)
    params = {"primary": {"shift": 1.0}, "fallback": {"shift": 2.0}}
    det = jax.jit(detect)(params, jnp.zeros((2, 8, 8, 3)))
    assert bool(det.indicators.all())
    # lane 0: primary box (16..48) + primary shift, NOT overwritten
    np.testing.assert_allclose(np.asarray(det.bboxes[0]), [17, 17, 49, 49])
    # lane 1: recovered from fallback with the fallback's params
    np.testing.assert_allclose(np.asarray(det.bboxes[1]), 9.0)
    np.testing.assert_allclose(np.asarray(det.scores[1]), 0.6)


def test_composed_recovery_through_analysis():
    """End-to-end lane recovery: a primary that misses every face plus a
    trained-style fallback yields live analysis lanes (chips not -1),
    while a primary-only stack would have produced dead lanes."""
    from fairdiff.guidance.faces import compose_detect_fns

    miss_all = lambda p, im: _oracle_detection(2, [False, False])
    oracle = lambda p, im: _oracle_detection(2, [True, True])
    detect = compose_detect_fns(miss_all, oracle)
    imgs = jax.random.uniform(
        jax.random.key(0), (2, 64, 64, 3), minval=-1, maxval=1
    )
    fa = analyze_faces(imgs, detect({"primary": {}, "fallback": {}}, imgs),
                       chip_size=32)
    assert bool(fa.indicators.all())
    assert float(jnp.abs(fa.chips + 1.0).max()) > 0.1  # not the -1 fill
