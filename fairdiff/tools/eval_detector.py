"""Distribution-shift benchmark for a trained fallback face detector.

The same-distribution held-out eval in `tools.train_detector` scores the
detector on fresh scenes from the renderer it TRAINED on — circular as
generalisation evidence (docs/DETECTOR.md caveats; VERDICT r3 #5). This
tool evaluates a saved `detector.npz` on the shifted-scene suite
(`guidance.detector_train.shifted_scene_fns`): blur, occlusion, scale
extremes, off-center crops, multi-face, unseen skin tones, low contrast,
structured backgrounds — each breaking one training-renderer assumption
while keeping the ground-truth contract.

  python -m fairdiff.tools.eval_detector --weights assets/detector.npz \
      --n_scenes 256 [--json_out docs/detector_shifts.json]

Reference parity target: the dlib CNN fallback the reference consults on
SCRFD misses (exp-1-debias-gender/1-main-debias.py:1232-1290).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp

from fairdiff.guidance.detector_train import (
    evaluate_detector, false_positive_rate, shifted_negative_fns,
    shifted_scene_fns,
)
from fairdiff.io.adapters_io import load_adapters
from fairdiff.models.face_detector import (
    DetectorConfig, FaceDetectorNet, make_detect_fn,
)
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class DetEvalConfig:
    platform: str = ""  # jax backend override
    num_cpu_devices: int = 1
    weights: str = "assets/detector.npz"
    image_size: int = 128
    n_scenes: int = 256
    seed: int = 777
    tiny: bool = False
    json_out: str = ""
    shifts: str = ""  # comma-separated subset; empty = all
    # 0 keeps DetectorConfig's default (0.6 since r5 — measured strictly
    # better for the shipped weights, DETECTOR.md); the knob trades
    # recall against false-positive rate
    score_threshold: float = 0.0


def main(cfg: DetEvalConfig) -> dict[str, dict[str, float]]:
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    det_cfg = DetectorConfig.tiny() if cfg.tiny else DetectorConfig()
    if cfg.score_threshold > 0:
        det_cfg = dataclasses.replace(
            det_cfg, score_threshold=cfg.score_threshold
        )
    net = FaceDetectorNet(det_cfg)
    params = load_adapters(cfg.weights)
    detect = jax.jit(make_detect_fn(net, params, det_cfg))
    _ = detect(jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))

    fns = shifted_scene_fns(cfg.image_size)
    names = [s for s in cfg.shifts.split(",") if s] or (
        ["train_dist"] + sorted(fns)
    )
    results: dict[str, dict[str, float]] = {}
    for name in names:
        scene_fn = None if name == "train_dist" else fns[name]
        # neg_fn=False: the shifts transform the FACE, not the face-free
        # background — fp is priced once per background family below
        # instead of re-running identical base negatives per shift
        m = evaluate_detector(
            detect, n_scenes=cfg.n_scenes, size=cfg.image_size,
            seed=cfg.seed, scene_fn=scene_fn, neg_fn=False,
        )
        results[name] = m
        print(json.dumps({"shift": name, **{
            k: round(v, 4) for k, v in m.items()
        }}), flush=True)

    # false-positive rate per background family (base noise + the three
    # background-transforming shifts applied to face-free scenes)
    neg_fns = {"base": None, **shifted_negative_fns(cfg.image_size)}
    fp_rates = {
        name: false_positive_rate(
            detect, n_scenes=cfg.n_scenes, size=cfg.image_size,
            seed=cfg.seed, neg_fn=fn,
        )
        for name, fn in neg_fns.items()
    }
    results["fp_rates"] = fp_rates
    print(json.dumps({"fp_rates": {
        k: round(v, 4) for k, v in fp_rates.items()
    }}), flush=True)
    if cfg.json_out:
        with open(cfg.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[eval-detector] wrote {cfg.json_out}")
    return results


if __name__ == "__main__":
    main(cfglib.cli_parse(DetEvalConfig))
