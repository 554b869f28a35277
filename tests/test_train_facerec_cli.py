"""End-to-end facerec training CLI (opensphere train.py parity): YAML
config -> builder -> 3 optimizer steps -> saved backbone + metrics."""

import json

import numpy as np

from fairdiff.tools.train_facerec import FaceRecCLIConfig, main



import pytest

pytestmark = pytest.mark.slow  # fast subset: pytest -m 'not slow'

def test_train_facerec_cli_end_to_end(tmp_path):
    import cv2

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        cv2.imwrite(str(data / f"im{i}.png"), img)
        lines.append(f"im{i}.png {i % 2}")
    (tmp_path / "ann.txt").write_text("\n".join(lines))
    # pair file for verification validation
    (tmp_path / "pairs.txt").write_text(
        "im0.png im2.png 1\nim0.png im1.png 0\n"
    )

    base = tmp_path / "backbone_base.yml"
    base.write_text("type: sfnet4\nout_channel: 16\nin_size: 32\n")
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(f"""
data:
  train:
    dataset:
      type: ClassDataset
      data_dir: {data}
      ann_path: {tmp_path}/ann.txt
    batch_size: 4
  val:
    dataset:
      type: PairDataset
      data_dir: {data}
      ann_path: {tmp_path}/pairs.txt
model:
  backbone:
    base: {base}
    out_channel: 8
  head:
    type: CosFace
    s: 8.0
    m: 0.1
trainer:
  lr: 0.01
  max_iters: 3
  val_interval: 2
""")

    out = tmp_path / "out"
    state = main(FaceRecCLIConfig(config=str(cfg), output_dir=str(out),
                                  save_every=2, log_every=1))
    assert state["step"] == 3
    assert (out / "backbone_final.npz").exists()
    assert (out / "backbone_2.npz").exists()
    logs = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("loss" in l for l in logs)
    assert any("EER" in l for l in logs)  # validation ran at step 2


def test_shipped_facerec_configs_build():
    """Every fairdiff/configs/facerec YAML must resolve (base inheritance)
    and build its backbone + head."""
    from pathlib import Path

    import yaml

    import jax
    import jax.numpy as jnp
    from fairdiff.facerec.builder import build_backbone, build_head, fill_config

    cfg_dir = Path("fairdiff/configs/facerec")
    ymls = [p for p in cfg_dir.glob("*.yml") if p.name != "base.yml"]
    assert len(ymls) >= 3
    for p in ymls:
        cfg = fill_config(yaml.safe_load(p.read_text()), base_dir=p.parent)
        assert cfg["trainer"]["lr"] == 0.1, p  # from base.yml
        net = build_backbone(cfg["model"]["backbone"])
        params = net.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
        out = net.apply(params, jnp.zeros((1, 112, 112, 3)))
        assert out.shape == (1, cfg["model"]["backbone"]["out_channel"]), p
        if "head" in cfg["model"]:  # eval-only configs (test_ijb*, combined)
            fn, kwargs = build_head(cfg["model"]["head"])
            assert callable(fn), p
        # dataset kwargs must match the constructors eval_facerec /
        # the trainer will call them with (file IO aside) — a config
        # shipping an unknown or missing kwarg is broken even if the
        # data dirs only exist on the user's machine
        import inspect

        from fairdiff.facerec import datasets as ds_lib

        for section in ("train", "val"):
            entries = cfg.get("data", {}).get(section, [])
            if isinstance(entries, dict):
                entries = [entries]
            for entry in entries:
                ds_cfg = dict(entry["dataset"])
                kind = ds_cfg.pop("type")
                ds_cfg.pop("name", None)
                sig = inspect.signature(getattr(ds_lib, kind))
                sig.bind_partial(**ds_cfg)  # raises on unknown kwargs
                required = {
                    n for n, prm in sig.parameters.items()
                    if prm.default is inspect.Parameter.empty
                    and prm.kind is not inspect.Parameter.VAR_KEYWORD
                }
                missing = required - set(ds_cfg)
                assert not missing, (p, kind, missing)


def test_create_facerec_list(tmp_path):
    """List creator writes sorted, relative, integer-labeled lines that
    ClassDataset consumes directly."""
    import numpy as np
    from PIL import Image

    from fairdiff.facerec.datasets import ClassDataset
    from fairdiff.tools.create_facerec_list import CreateListConfig, create_list

    root = tmp_path / "train"
    for cls in ("id_b", "id_a"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8)
            ).save(d / f"img{i}.jpg")
    (root / "id_a" / "notes.txt").write_text("skip me")

    out = create_list(CreateListConfig(dataset_dir=str(root),
                                       list_path=str(tmp_path / "ann.txt")))
    lines = out.read_text().splitlines()
    assert len(lines) == 4
    assert lines[0].split()[1] == "0" and lines[-1].split()[1] == "1"
    ds = ClassDataset(data_dir=str(root), ann_path=str(out))
    assert ds.num_classes == 2 and len(ds.items) == 4
