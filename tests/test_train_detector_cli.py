"""Drive test for the detector-training CLI (the tpu-native counterpart of
the reference's dlib-CNN fallback training; reference wiring at
exp-1-debias-gender/1-main-debias.py:1232-1290). Exercises the public
entry end-to-end at toy scale: synthetic DR batches -> jitted train step
-> save_adapters -> held-out evaluate_detector."""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast subset: pytest -m 'not slow'


def test_train_detector_cli_smoke(tmp_path):
    from fairdiff.io.adapters_io import load_adapters
    from fairdiff.tools.train_detector import DetTrainConfig, main

    out = tmp_path / "det.npz"
    params, metrics = main(DetTrainConfig(
        steps=2, batch_size=2, image_size=64, tiny=True,
        out=str(out), log_every=1, eval_scenes=4,
    ))
    assert out.exists()
    # the saved tree round-trips with identical leaves
    loaded = load_adapters(str(out))
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # held-out metrics exist and are sane probabilities/rates
    for key in ("recall", "det_rate", "fp_rate"):
        assert key in metrics, metrics
        assert 0.0 <= float(metrics[key]) <= 1.0, (key, metrics[key])


def test_train_detector_scenes_flag_selects_renderer():
    """scenes="dr" and scenes="base" draw from different generators: the
    domain-randomized batches must differ from the r1 base renderer under
    the same seed (docs/DETECTOR.md r4 de-circularization)."""
    from fairdiff.guidance.detector_train import synthetic_batches

    a, _, _ = next(synthetic_batches(2, 64, 0, scenes="dr"))
    b, _, _ = next(synthetic_batches(2, 64, 0, scenes="base"))
    assert a.shape == b.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))
