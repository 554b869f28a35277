"""Offline bias evaluation of generated image folders — parity with the
reference's eval-generated-images.py.

Pipeline (eval-generated-images.py:570-709): per prompt folder, per image:
load -> [-1,1] -> batched face detection -> crop -> three HELD-OUT test
classifiers (gender-2 / race-4 / age-2 MobileNetV3, the classifier-level
train/test split of SURVEY.md §4) -> annotated grid + pickled
[face_indicators, face_bboxs, gender_logits, race_logits, age_logits]
-> test_results.pkl. TPU-native: detection/classification run batched
per folder instead of per image.

Detection runs the SAME stack as training: SCRFD primary (exact reference
det_10g.onnx weights via io/onnx_bridge) composed with the FaceDetectorNet
fallback — mirroring the reference eval's identical insightface->dlib
two-stage (eval-generated-images.py:343-366,:574-580). Offline bias
numbers therefore come from the detector the training loop optimized
against, not a weaker stand-in.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.guidance.faces import analyze_faces
from fairdiff.io.images import load_image
from fairdiff.training.metrics import multi_attr_metrics
from fairdiff.utils import config as cfglib
from fairdiff.utils.grids import plot_in_grid, plot_in_grid_multi


@dataclasses.dataclass(frozen=True)
class EvalImagesConfig:
    # jax backend override: "cpu" (with num_cpu_devices for a virtual
    # mesh) or "" = default real-TPU backend
    platform: str = ""
    num_cpu_devices: int = 8
    generated_imgs_dir: str = "outputs/gen-images"
    save_dir: str = "outputs/eval-images"
    # converted held-out classifier params (.npz trees); '' => synthetic
    gender_classifier: str = ""
    race_classifier: str = ""
    age_classifier: str = ""
    # detection weights — same two-stage contract as the training zoo
    # (model_zoo.load_detector): SCRFD det_10g.onnx primary and/or
    # FaceDetectorNet .npz fallback; at least one required
    scrfd_onnx: str = ""
    detector_params: str = ""
    scrfd_input_size: tuple[int, int] = (640, 640)
    batch_size: int = 32
    chip_size: int = 224
    synthetic_smoke: bool = False  # CI mode: oracle detector + stats heads


def _load_stack(cfg: EvalImagesConfig):
    """-> (detect_fn(det_params, images), stack_params, head_fns) with all
    weights in `stack_params` so the jitted analyze threads them as
    arguments (the training-path convention, training/stack.py)."""
    if cfg.synthetic_smoke:
        from fairdiff.training.synthetic import oracle_detect, synthetic_classifier

        classify = synthetic_classifier()
        heads = {
            "gender": lambda p, chips: classify(chips)[:, 0:2],
            "race": lambda p, chips: classify(chips)[:, 2:6],
            "age": lambda p, chips: classify(chips)[:, 6:8],
        }
        params = {"detector": {}, "heads": {k: {} for k in heads}}
        return (lambda p, images: oracle_detect(images)), params, heads

    from fairdiff.io.adapters_io import load_adapters
    from fairdiff.models.mobilenet_v3 import MobileNetV3Large
    from fairdiff.training.model_zoo import load_detector

    detect_fn, det_params = load_detector(
        cfg.scrfd_onnx or None,
        cfg.detector_params or None,
        # eval runs the detector in its stored f32, as the reference's
        # onnxruntime eval does (eval-generated-images.py:574-580)
        dtype=jnp.float32,
        scrfd_input_size=tuple(cfg.scrfd_input_size),
    )

    heads, head_params = {}, {}
    for name, path, n_cls in (
        ("gender", cfg.gender_classifier, 2),
        ("race", cfg.race_classifier, 4),
        ("age", cfg.age_classifier, 2),
    ):
        if not path:
            continue
        net = MobileNetV3Large(num_classes=n_cls)
        head_params[name] = load_adapters(path)
        heads[name] = (
            lambda p, chips, net=net: net.apply({"params": p}, chips)
        )
    return detect_fn, {"detector": det_params, "heads": head_params}, heads


def main(cfg: EvalImagesConfig) -> dict:
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    detect_fn, stack_params, heads = _load_stack(cfg)
    root = Path(cfg.generated_imgs_dir)
    save_root = Path(cfg.save_dir)
    save_root.mkdir(parents=True, exist_ok=True)

    @jax.jit
    def analyze(params, batch):
        faces = analyze_faces(
            batch, detect_fn(params["detector"], batch), chip_size=cfg.chip_size
        )
        logits = {
            name: jnp.where(
                faces.indicators[:, None],
                head(params["heads"].get(name), faces.chips).astype(jnp.float32),
                -1.0,
            )
            for name, head in heads.items()
        }
        return faces.indicators, faces.bboxes, logits

    summary = {}
    for prompt_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        files = sorted(prompt_dir.glob("*.jpg")) + sorted(prompt_dir.glob("*.png"))
        if not files:
            continue
        imgs = np.stack([load_image(f) for f in files])
        inds, bboxes, logits = [], [], {k: [] for k in heads}
        for s in range(0, len(imgs), cfg.batch_size):
            batch = jnp.asarray(imgs[s : s + cfg.batch_size])
            i, b, lg = analyze(stack_params, batch)
            inds.append(np.asarray(i))
            bboxes.append(np.asarray(b))
            for k in heads:
                logits[k].append(np.asarray(lg[k]))
        inds = np.concatenate(inds)
        bboxes = np.concatenate(bboxes)
        logits = {k: np.concatenate(v) for k, v in logits.items()}

        def _softmax(v):
            # max-subtracted: a confident classifier logit >= ~88 would
            # overflow plain np.exp to NaN probs that pass the -1 filter
            e = np.exp(v - v.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        probs = {
            k: np.where(
                (v != -1).all(-1, keepdims=True), _softmax(v), -1.0
            )
            for k, v in logits.items()
        }
        preds = {
            k: np.where(inds, v.argmax(-1), -1) for k, v in probs.items()
        }
        metrics = multi_attr_metrics(probs, preds)
        summary[prompt_dir.name] = metrics

        # gender x race (x age) annotated grid — reference
        # plot_in_grid_gender_race[_age] (eval-generated-images.py:65-263)
        attrs = {
            k: (preds[k], np.where(inds, probs[k].max(-1), -1.0))
            for k in ("gender", "race", "age")
            if k in preds
        }
        if len(attrs) > 1:
            plot_in_grid_multi(
                imgs,
                save_root / f"{prompt_dir.name}_grid.jpg",
                attrs,
                face_indicators=inds,
                face_bboxes=bboxes,
            )
        else:
            # annotate whichever single attribute was evaluated — never
            # fabricate gender labels when only race/age ran
            (attr_name,) = list(preds) or [""]
            if attr_name:
                plot_in_grid(
                    imgs,
                    save_root / f"{prompt_dir.name}_grid.jpg",
                    face_indicators=inds,
                    preds=preds[attr_name],
                    probs_max=probs[attr_name].max(-1),
                )
        with open(save_root / f"{prompt_dir.name}_test_results.pkl", "wb") as f:
            pickle.dump(
                [
                    inds, bboxes,
                    logits.get("gender"), logits.get("race"), logits.get("age"),
                ],
                f,
            )
        print(f"[eval-images] {prompt_dir.name}: {metrics}")

    with open(save_root / "summary.pkl", "wb") as f:
        pickle.dump(summary, f)
    return summary


if __name__ == "__main__":
    main(cfglib.cli_parse(EvalImagesConfig))
