"""Train the face detector (synthetic pretraining or a real face corpus).

  python -m fairdiff.tools.train_detector --steps 2000 \
      --out fairdiff-guidance/detector.npz
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
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
    # online hard-negative mining (r5, DETECTOR.md): from
    # mine_start_frac of training on, each step renders mine_pool
    # candidate face-free scenes, scores them with the CURRENT weights,
    # and appends the top-scoring mine_k to the batch — targeted score
    # suppression that pulls the DR model's false-positive rates back
    # toward the base model's without retraining away its recall gains.
    # mine_k=0 disables (restores the r4 recipe exactly).
    mine_k: int = 4
    mine_pool: int = 64
    mine_start_frac: float = 0.4
    # hard POSITIVES appended alongside the mined negatives: small-scale
    # faces (the weak axis) so the added suppression pressure cannot
    # trade away small-face recall (measured r5: mining alone pulled fp
    # 0.13->0.05 but collapsed scale_small recall 0.62->0.37)
    mine_small_pos: int = 2
    small_pos_scale: tuple[float, float] = (0.12, 0.30)


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

    from fairdiff.guidance.detector_train import (
        render_face_scene_dr, render_negative_scene, render_negative_scene_dr,
    )
    from fairdiff.models.face_detector import decode_detections

    neg_render = (
        render_negative_scene_dr if cfg.scenes == "dr"
        # base mode: mined candidates must sample the SAME negative
        # distribution as the training batches (incl. distractor count)
        else (lambda rng, size: render_negative_scene(rng, size, cfg.distractors))
    )
    mine_rng = np.random.default_rng(cfg.seed + 31337)

    @jax.jit
    def max_scores(params, imgs):
        raw = net.apply({"params": params}, imgs)
        scores, _, _ = decode_detections(raw, det_cfg)
        return scores.max(-1)

    mine_start = int(cfg.steps * cfg.mine_start_frac)
    for i in range(cfg.steps):
        imgs, boxes, lms = next(batches)
        if cfg.mine_k and i >= mine_start:
            pool = [neg_render(mine_rng, cfg.image_size) for _ in range(cfg.mine_pool)]
            pimgs = np.stack([p[0] for p in pool])
            s = np.asarray(max_scores(params, jnp.asarray(pimgs)))
            top = np.argsort(-s)[: cfg.mine_k]
            extra_imgs = [pimgs[top]]
            extra_boxes = [np.full((cfg.mine_k, 4), -1.0, np.float32)]
            extra_lms = [np.full((cfg.mine_k, 5, 2), -1.0, np.float32)]
            if cfg.mine_small_pos and cfg.scenes == "dr":
                sp = [
                    render_face_scene_dr(
                        mine_rng, cfg.image_size,
                        lead_scale_range=tuple(cfg.small_pos_scale),
                    )
                    for _ in range(cfg.mine_small_pos)
                ]
                extra_imgs.append(np.stack([z[0] for z in sp]))
                extra_boxes.append(np.stack([z[1] for z in sp]).astype(np.float32))
                extra_lms.append(np.stack([z[2] for z in sp]).astype(np.float32))
            imgs = np.concatenate([imgs, *extra_imgs])
            boxes = np.concatenate([boxes, *extra_boxes])
            lms = np.concatenate([lms, *extra_lms])
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
