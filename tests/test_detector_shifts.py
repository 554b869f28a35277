"""Distribution-shifted detector scenes (VERDICT r3 #5): contract and
plumbing tests — fast (no training; the full benchmark is
tools/eval_detector.py, results in docs/DETECTOR.md)."""

import jax.numpy as jnp
import numpy as np

from fairdiff.guidance.detector_train import render_face_scene


def test_shifted_scene_contracts():
    """Every shifted generator keeps the ground-truth contract (VERDICT r3
    #5): image in [-1,1] of the right shape, a non-degenerate bbox, and
    landmarks consistent with the bbox. multiface returns the LARGEST face
    (the detect_fn selection contract)."""
    from fairdiff.guidance.detector_train import shifted_scene_fns

    fns = shifted_scene_fns(96)
    assert len(fns) >= 8
    for name, fn in fns.items():
        rng = np.random.default_rng(3)
        for _ in range(3):
            img, bbox, lms = fn(rng)
            assert img.shape == (96, 96, 3), name
            assert img.min() >= -1.0001 and img.max() <= 1.0001, name
            assert bbox[2] > bbox[0] and bbox[3] > bbox[1], name
            assert lms.shape == (5, 2), name
            cx = (bbox[0] + bbox[2]) / 2
            assert bbox[0] - 2 <= lms[:, 0].mean() <= bbox[2] + 2, (name, cx)


def test_shifted_scenes_differ_from_training():
    """The shifts are real: blur reduces high-frequency energy; the
    structured background is not gaussian; small/large scales fall outside
    the training range."""
    from fairdiff.guidance.detector_train import shifted_scene_fns

    fns = shifted_scene_fns(96)
    rng = np.random.default_rng(0)
    img_b, _, _ = fns["blur"](rng)
    rng = np.random.default_rng(0)
    img_t, _, _ = render_face_scene(np.random.default_rng(0), 96, 2)
    hf = lambda im: np.abs(np.diff(im, axis=0)).mean()
    assert hf(img_b) < hf(img_t) * 0.6

    for name, lo, hi in (("scale_small", 0, 0.25), ("scale_large", 0.9, 2)):
        rng = np.random.default_rng(1)
        _, bbox, _ = fns[name](rng)
        scale = (bbox[2] - bbox[0]) / 104.0 / (96 / 112.0)
        assert lo <= scale <= hi * 1.05, (name, scale)


def test_evaluate_detector_scene_fn_override():
    """evaluate_detector(scene_fn=...) drives the override through the
    full metric path with an oracle detect_fn."""
    from fairdiff.guidance.detector_train import (
        evaluate_detector, shifted_scene_fns,
    )
    from fairdiff.guidance.faces import FaceDetections

    captured = {}

    def oracle_detect(images):
        n = images.shape[0]
        # fires everywhere with a fixed box: recall == how often the fixed
        # box overlaps gt — just exercises the plumbing deterministically
        return FaceDetections(
            indicators=jnp.ones(n, bool),
            bboxes=jnp.tile(jnp.asarray([24.0, 24.0, 72.0, 72.0]), (n, 1)),
            landmarks=jnp.zeros((n, 5, 2)),
            scores=jnp.ones(n),
        )

    m = evaluate_detector(
        oracle_detect, n_scenes=8, size=96, batch=4,
        scene_fn=shifted_scene_fns(96)["multiface"],
    )
    assert m["det_rate"] == 1.0
    assert 0.0 <= m["recall"] <= 1.0


def test_edge_landmark_paint_stays_local():
    """Regression (r4 review): a landmark past the left/top frame edge gave
    a NEGATIVE slice stop, and img[a:-13] painted a near-full-width dark
    band — corrupting ~2% of DR scenes. Clamped stops paint nothing
    outside the face. 400 DR scenes must contain zero wide bands."""
    from fairdiff.guidance.detector_train import render_face_scene_dr

    rng = np.random.default_rng(42)
    for _ in range(400):
        img, _, _ = render_face_scene_dr(rng, 128)
        dark_rows = (img == -0.7).all(axis=2).sum(axis=1)
        assert int(dark_rows.max()) <= 60, int(dark_rows.max())


def test_fp_rate_skip_and_standalone():
    """evaluate_detector(neg_fn=False) omits fp_rate; false_positive_rate
    prices the face-free pass standalone, per background family."""
    from fairdiff.guidance.detector_train import (
        evaluate_detector, false_positive_rate, shifted_negative_fns,
    )
    from fairdiff.guidance.faces import FaceDetections

    def never_detect(images):
        n = images.shape[0]
        return FaceDetections(
            indicators=jnp.zeros(n, bool),
            bboxes=jnp.zeros((n, 4)),
            landmarks=jnp.zeros((n, 5, 2)),
            scores=jnp.zeros(n),
        )

    m = evaluate_detector(never_detect, n_scenes=4, size=96, batch=4,
                          neg_fn=False)
    assert "fp_rate" not in m and m["det_rate"] == 0.0
    neg_fns = shifted_negative_fns(96)
    assert set(neg_fns) == {"blur", "low_contrast", "textured_bg"}
    for name, fn in neg_fns.items():
        img, bbox, lms = fn(np.random.default_rng(1))
        assert img.shape == (96, 96, 3) and (bbox == -1).all(), name
        fp = false_positive_rate(never_detect, n_scenes=4, size=96,
                                 batch=4, neg_fn=fn)
        assert fp == 0.0, name
