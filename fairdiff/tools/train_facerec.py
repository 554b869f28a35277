"""Face-recognition training CLI — parity with opensphere's
`python train.py --config config/train/...yml` entry (opensphere/train.py,
builder.py). Config-driven: YAML with `base`-block inheritance, registry
backbones (sfnet*/iresnet*), all 11 margin heads, ClassDataset training,
optional PairDataset verification validation. mp.spawn/DDP becomes a jitted
step over the data mesh.

Schema (keys mirror the reference's data/model blocks):

  data:
    train:
      dataset: {type: ClassDataset, data_dir: ..., ann_path: ...,
                noise_ratio: 0.0}
      batch_size: 512
    val:                                 # optional
      dataset: {type: PairDataset, data_dir: ..., ann_path: ...}
  model:
    backbone: {type: sfnet20, out_channel: 512}   # or a `base:` yml
    head: {type: sphereface, s: 30.0, m: 1.5}
  trainer:                               # FaceRecConfig fields
    lr: 0.1
    max_iters: 80000
    lr_decay_steps: [40000, 60000, 70000]

Usage:
  python -m fairdiff.tools.train_facerec --config cfg.yml \
      --output_dir outputs/facerec [--max_iters N] [--data_mesh 8]
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from fairdiff.facerec.builder import build_backbone, build_head, fill_config
from fairdiff.facerec.datasets import ClassDataset, PairDataset, image_pipeline
from fairdiff.facerec.trainer import FaceRecConfig, FaceRecTrainer
from fairdiff.io.adapters_io import save_adapters
from fairdiff.training.logging import MetricsLogger
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class FaceRecCLIConfig:
    # jax backend override: "cpu" (with num_cpu_devices for a virtual
    # mesh) or "" = default real-TPU backend
    platform: str = ""
    num_cpu_devices: int = 8
    config: str = ""
    output_dir: str = "outputs/facerec"
    max_iters: int = 0  # 0 => config value
    data_mesh: int = 0  # 0 => no mesh (single device)
    log_every: int = 100
    save_every: int = 10000
    seed: int = 0


def build_all(cli: FaceRecCLIConfig):
    with open(cli.config) as f:
        cfg = fill_config(yaml.safe_load(f), base_dir=Path(cli.config).parent)

    train_ds_cfg = dict(cfg["data"]["train"]["dataset"])
    assert train_ds_cfg.pop("type") == "ClassDataset"
    train_ds = ClassDataset(**train_ds_cfg)
    batch_size = int(cfg["data"]["train"].get("batch_size", 512))

    val_ds = None
    if "val" in cfg.get("data", {}):
        val_cfg = dict(cfg["data"]["val"]["dataset"])
        if val_cfg.pop("type") == "PairDataset":
            val_ds = PairDataset(**val_cfg)

    backbone_cfg = dict(cfg["model"]["backbone"])
    backbone = build_backbone(backbone_cfg)
    head_fn, head_kwargs = build_head(cfg["model"]["head"])
    head_name = cfg["model"]["head"]["type"].lower()

    tcfg_dict = dict(cfg.get("trainer", {}))
    if cli.max_iters:
        tcfg_dict["max_iters"] = cli.max_iters
    if "lr_decay_steps" in tcfg_dict:
        tcfg_dict["lr_decay_steps"] = tuple(tcfg_dict["lr_decay_steps"])
    tcfg = FaceRecConfig(
        head=head_name,
        head_kwargs=tuple(head_kwargs.items()),
        feat_dim=int(backbone_cfg.get("out_channel", 512)),
        num_classes=train_ds.num_classes,
        seed=cli.seed,
        **tcfg_dict,
    )

    mesh = None
    if cli.data_mesh > 1:
        from fairdiff.parallel import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(data=cli.data_mesh, model=1))
    trainer = FaceRecTrainer(backbone, tcfg, mesh=mesh)
    return trainer, train_ds, val_ds, batch_size, int(backbone_cfg.get("in_size", 112))


def main(cli: FaceRecCLIConfig):
    cfglib.apply_platform(cli.platform, cli.num_cpu_devices)
    trainer, train_ds, val_ds, batch_size, in_size = build_all(cli)
    out = Path(cli.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(out, run_name="facerec")

    sample = jnp.zeros((1, in_size, in_size, 3))
    state = trainer.init_state(jax.random.key(cli.seed), sample)

    def val_fn(state):
        if val_ds is None:
            return {}
        paths = sorted({p for pair in val_ds.pairs for p in pair[:2]})
        feats = {}
        for i in range(0, len(paths), 64):
            chunk = paths[i : i + 64]
            imgs = np.stack(
                [image_pipeline({"path": p}, True) for p in chunk]
            )
            f = trainer.extract_features(state, jnp.asarray(imgs))
            for p, v in zip(chunk, np.asarray(f)):
                feats[p] = v
        return dict(val_ds.evaluate(feats))

    def checkpoint_cb(st):
        save_adapters(out / f"backbone_{st['step']}.npz", st["params"]["backbone"])

    state = trainer.fit(
        state,
        train_ds.batches(batch_size, seed=cli.seed, image_size=in_size),
        log_every=cli.log_every,
        logger=logger,
        val_fn=val_fn if val_ds is not None else None,
        checkpoint_cb=checkpoint_cb,
        save_interval=cli.save_every,
    )
    save_adapters(out / "backbone_final.npz", state["params"]["backbone"])
    print(json.dumps({"final_step": state["step"]}))
    logger.close()
    return state


if __name__ == "__main__":
    main(cfglib.cli_parse(FaceRecCLIConfig))
