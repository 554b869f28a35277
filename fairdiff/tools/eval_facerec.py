"""Face-recognition evaluation CLI — parity with opensphere's test entry
(`python test.py --config config/test/...yml`, opensphere/test.py:30-176:
DataParallel flip-sum feature extraction over val datasets, then
dataset.evaluate + tabulated metrics).

TPU-native: one jitted batched feature extractor (flip-sum, L2-normalized);
PairDataset (ACC/EER/AUC/TPR@FPR) and IJBDataset (template 1:1 / 1:N)
evaluation run on host over the extracted feature table.

Config schema (mirrors the reference's data/model blocks):

  data:
    val:
    - dataset: {type: PairDataset, data_dir: ..., ann_path: ..., name: LFW}
    - dataset: {type: IJBDataset, data_dir: ..., meta_dir: ..., ...}
  model:
    backbone: {type: sfnet20_deprecated, out_channel: 512, in_size: 112}

Usage:
  python -m fairdiff.tools.eval_facerec --config cfg.yml \
      --weights outputs/facerec/backbone_final.npz
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from fairdiff.facerec.builder import build_backbone, fill_config
from fairdiff.facerec.datasets import (
    IJBDataset, PairDataset, image_pipeline,
)
from fairdiff.guidance.face_feats import face_embeddings
from fairdiff.io.adapters_io import load_adapters
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class EvalFaceRecCLIConfig:
    platform: str = ""  # jax backend override ("cpu" for virtual mesh)
    num_cpu_devices: int = 8
    config: str = ""
    weights: str = ""  # backbone params .npz ('' => random init, smoke only)
    batch_size: int = 64
    seed: int = 0


def _extractor(backbone, params):
    fn = jax.jit(
        lambda imgs: face_embeddings(
            lambda x: backbone.apply({"params": params}, x), imgs
        )
    )
    return fn


def _extract_paths(paths, extract, batch_size, align=True):
    feats = {}
    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        imgs = np.stack([image_pipeline({"path": p}, align) for p in chunk])
        f = np.asarray(extract(jnp.asarray(imgs)))
        for p, v in zip(chunk, f):
            feats[p] = v
    return feats


def main(cli: EvalFaceRecCLIConfig) -> dict:
    cfglib.apply_platform(cli.platform, cli.num_cpu_devices)
    with open(cli.config) as f:
        cfg = fill_config(yaml.safe_load(f), base_dir=Path(cli.config).parent)

    backbone_cfg = dict(cfg["model"]["backbone"])
    backbone = build_backbone(backbone_cfg)
    in_size = int(backbone_cfg.get("in_size", 112))
    if cli.weights:
        params = load_adapters(cli.weights)
    else:
        print("[eval-facerec] WARNING: no --weights; random backbone")
        params = backbone.init(
            jax.random.key(cli.seed), jnp.zeros((1, in_size, in_size, 3))
        )["params"]
    extract = _extractor(backbone, params)

    val_entries = cfg["data"]["val"]
    if isinstance(val_entries, dict):
        val_entries = [val_entries]
    results: dict[str, list] = {}
    for entry in val_entries:
        ds_cfg = dict(entry["dataset"])
        kind = ds_cfg.pop("type")
        name = ds_cfg.pop("name", kind)
        if kind == "PairDataset":
            ds = PairDataset(**ds_cfg)
            paths = sorted({p for pair in ds.pairs for p in pair[:2]})
            feats = _extract_paths(paths, extract, cli.batch_size)
            metrics = ds.evaluate(feats)
        elif kind == "IJBDataset":
            ds = IJBDataset(**ds_cfg)
            feats_list = []
            for i in range(0, len(ds), cli.batch_size):
                batch = jnp.asarray(
                    np.stack(
                        [ds[j][0] for j in range(i, min(i + cli.batch_size, len(ds)))]
                    )
                )
                feats_list.append(np.asarray(extract(batch)))
            metrics = ds.evaluate(np.concatenate(feats_list))
        else:
            raise ValueError(f"unknown val dataset type {kind}")
        results[name] = metrics
        row = "  ".join(f"{k}={v:.4f}" for k, v in metrics)
        print(f"[eval-facerec] {name}: {row}")
    return results


if __name__ == "__main__":
    main(cfglib.cli_parse(EvalFaceRecCLIConfig))
