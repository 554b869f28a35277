"""Train the face detector (synthetic pretraining or a real face corpus).

  python -m fairdiff.tools.train_detector --steps 2000 \
      --out fairdiff-guidance/detector.npz
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from fairdiff.guidance.detector_train import detection_loss, synthetic_batches
from fairdiff.io.adapters_io import save_adapters
from fairdiff.models.face_detector import DetectorConfig, FaceDetectorNet
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class DetTrainConfig:
    platform: str = ""  # jax backend override ("cpu" for virtual mesh)
    num_cpu_devices: int = 8
    steps: int = 2000
    batch_size: int = 16
    image_size: int = 128
    lr: float = 3e-4
    seed: int = 0
    tiny: bool = False
    out: str = "outputs/detector.npz"
    log_every: int = 100
    # hard negatives: face-free scenes + non-face distractor blobs teach
    # score suppression, which is what makes the held-out fp_rate honest
    neg_frac: float = 0.25
    distractors: int = 2
    # "dr" (default): domain-randomized scenes covering every shift axis
    # the eval suite probes (docs/DETECTOR.md r4); "base": the r1 renderer
    scenes: str = "dr"
    eval_scenes: int = 256  # 0 disables the held-out eval


def main(cfg: DetTrainConfig):
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    det_cfg = DetectorConfig.tiny() if cfg.tiny else DetectorConfig()
    net = FaceDetectorNet(det_cfg)
    params = net.init(
        jax.random.key(cfg.seed),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
    )["params"]
    tx = optax.adam(cfg.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, images, boxes, lms):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: detection_loss(net, p, images, boxes, lms, det_cfg),
            has_aux=True,
        )(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, aux

    batches = synthetic_batches(
        cfg.batch_size, cfg.image_size, cfg.seed,
        neg_frac=cfg.neg_frac, distractors=cfg.distractors,
        scenes=cfg.scenes,
    )
    for i in range(cfg.steps):
        imgs, boxes, lms = next(batches)
        params, opt, loss, aux = step(
            params, opt, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(lms)
        )
        if i % cfg.log_every == 0:
            print(
                f"[train-detector] {i}: loss={float(loss):.4f} "
                f"cls={float(aux['cls']):.4f} box={float(aux['box']):.4f} "
                f"kps={float(aux['kps']):.4f}"
            )
    save_adapters(cfg.out, params)
    print(f"[train-detector] saved -> {cfg.out}")
    if cfg.eval_scenes:
        from fairdiff.guidance.detector_train import evaluate_detector
        from fairdiff.models.face_detector import make_detect_fn

        detect = jax.jit(make_detect_fn(net, params, det_cfg))
        metrics = evaluate_detector(
            detect, n_scenes=cfg.eval_scenes, size=cfg.image_size,
            seed=cfg.seed + 777, distractors=cfg.distractors,
        )
        print(
            "[train-detector] held-out "
            + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
        )
        return params, metrics
    return params


if __name__ == "__main__":
    main(cfglib.cli_parse(DetTrainConfig))
