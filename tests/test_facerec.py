"""Face-recognition subsystem: datasets, verification metrics, trainer
convergence on a separable toy problem, SFNet shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairdiff.facerec.datasets import ClassDataset, verification_metrics
from fairdiff.facerec.trainer import FaceRecConfig, FaceRecTrainer
from fairdiff.models.sfnet import SFNet, SFNetConfig, convert_sfnet


def test_verification_metrics_perfect_and_random():
    labels = [1] * 50 + [0] * 50
    scores = [0.9] * 50 + [0.1] * 50
    m = dict(verification_metrics(labels, scores, [1e-3]))
    assert m["ACC"] == 100.0 and m["AUC"] == 100.0 and m["EER"] < 1.0

    rng = np.random.default_rng(0)
    m2 = dict(verification_metrics(labels, list(rng.random(100)), []))
    assert 40 < m2["AUC"] < 65


def test_class_dataset(tmp_path):
    import cv2

    for i in range(4):
        img = np.full((8, 8, 3), i * 40, np.uint8)
        cv2.imwrite(str(tmp_path / f"im{i}.png"), img)
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(f"im{i}.png {i % 2}" for i in range(4)))
    ds = ClassDataset(str(tmp_path), str(ann), test_mode=True)
    assert len(ds) == 4 and ds.num_classes == 2
    img, label = ds[1]
    assert img.shape == (8, 8, 3) and -1 <= img.min() <= img.max() <= 1
    batches = ds.batches(2, seed=0)
    b_imgs, b_labels = next(batches)
    assert b_imgs.shape == (2, 8, 8, 3)

    # label noise corrupts some labels deterministically
    ds_noisy = ClassDataset(str(tmp_path), str(ann), noise_ratio=0.5, noise_seed=1)
    assert len(ds_noisy.labels) == 4


def test_sfnet_shapes_and_convert():
    cfg = SFNetConfig.tiny()
    net = SFNet(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = net.init(jax.random.key(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 32)

    # structural converter check via synthesized torch layout
    sd = {}
    for li, n_blocks in enumerate(cfg.layers, 1):
        p = np.asarray(params[f"layer{li}_0"]["conv1"]["kernel"])
        sd[f"layer{li}.0.conv1.weight"] = p.transpose(3, 2, 0, 1)
        sd[f"layer{li}.0.conv1.bias"] = np.asarray(
            params[f"layer{li}_0"]["conv1"]["bias"]
        )
    w = np.asarray(params["fc"]["kernel"])  # [HWC, out]
    side = cfg.in_size // 16
    c = cfg.channels[3]
    w_t = w.T.reshape(-1, side, side, c).transpose(0, 3, 1, 2).reshape(w.shape[1], -1)
    sd["fc.weight"] = w_t
    sd["fc.bias"] = np.asarray(params["fc"]["bias"])
    rec = convert_sfnet(sd, cfg)
    np.testing.assert_allclose(rec["fc"]["kernel"], w, atol=0)
    out2 = net.apply({"params": rec}, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def test_facerec_trainer_learns_toy():
    """Tiny backbone + cocoloss head must separate two synthetic classes."""
    import flax.linen as nn

    class ToyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(8)(x)

    cfg = FaceRecConfig(
        head="cocoloss", feat_dim=8, num_classes=2, lr=0.5,
        lr_decay_steps=(1000,), max_iters=30, val_interval=1000,
        clip_grad_norm=10.0,
    )
    trainer = FaceRecTrainer(ToyBackbone(), cfg)
    state = trainer.init_state(jax.random.key(0), jnp.zeros((1, 4, 4, 3)))

    rng = np.random.default_rng(0)

    def gen():
        while True:
            labels = rng.integers(0, 2, 16)
            imgs = rng.normal(size=(16, 4, 4, 3)).astype(np.float32) * 0.1
            imgs[labels == 1] += 1.0
            yield imgs, labels

    losses = []
    batches = gen()
    for _ in range(30):
        imgs, labels = next(batches)
        state, loss = trainer.train_step(state, jnp.asarray(imgs), jnp.asarray(labels))
        losses.append(loss)
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]

    feats = trainer.extract_features(state, jnp.asarray(next(batches)[0]))
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(feats, axis=-1)), 1.0, rtol=1e-5
    )


def test_all_facerec_configs_build():
    """Every shipped facerec YAML (mirroring the reference's 20+ opensphere
    configs) must resolve: base inheritance, backbone registry, head
    registry, and head kwargs matching the head fn signature."""
    import inspect
    from pathlib import Path

    import yaml

    from fairdiff.facerec.builder import (
        build_backbone, build_head, fill_config,
    )

    cfg_dir = Path(__file__).parent.parent / "fairdiff" / "configs" / "facerec"
    files = sorted(p for p in cfg_dir.glob("*.yml") if p.name != "base.yml")
    assert len(files) >= 20, [p.name for p in files]
    for path in files:
        with open(path) as f:
            cfg = fill_config(yaml.safe_load(f), base_dir=cfg_dir)
        build_backbone(cfg["model"]["backbone"])
        if "head" in cfg["model"]:
            fn, kwargs = build_head(cfg["model"]["head"])
            params = set(inspect.signature(fn).parameters)
            unknown = set(kwargs) - params
            assert not unknown, (path.name, unknown)
