"""Full-pipeline fixture run of the real-weights contract (VERDICT r3 #6).

The reference consumes external checkpoints in four on-disk layouts
(SURVEY.md §2.3; exp-1-debias-gender/1-main-debias.py:722-994):
diffusers SD subfolders, torchvision MobileNetV3 .pt, opensphere SFNet
.pth, insightface SCRFD .onnx, plus the face-feats pickle. The per-module
converter tests pin tensor math against torch goldens; what they do NOT
exercise is the *pipeline*: every converter driven through its public
CLI, reading real files in the exact external layout, producing the
model_zoo directory, validated by setup_data, loaded by
load_guidance_stack, and driven through a real optimizer step.

This test does exactly that, at fixture scale: random weights in the
exact external layouts (real SD-1.5/buffalo_l assets are unreachable in
a zero-egress environment — docs/MIGRATION.md records what remains
environmental), tiny SD architecture (convert_sd --preset tiny), and a
one-step exp-1 train run through the tools/train_debias CLI.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # compiles real-architecture guidance on CPU


# -- fixture checkpoint writers (exact external layouts) -----------------

def _write_sd_checkpoint(root: Path) -> Path:
    """Diffusers-layout SD dir: {text_encoder,unet,vae}/*.bin state dicts
    (the layout from_pretrained reads, exp-1:722-741), tiny architecture."""
    from torch_refs import TUNet, TVAE

    from fairdiff.sampling.pipeline import SDConfig

    cfg = SDConfig.tiny()
    t = cfg.text
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        max_position_embeddings=t.max_position_embeddings,
        hidden_act=t.hidden_act, eos_token_id=t.eos_token_id,
        bos_token_id=0,
    )
    torch.manual_seed(0)
    parts = {
        "text_encoder/pytorch_model.bin":
            transformers.CLIPTextModel(hf_cfg).eval().state_dict(),
        "unet/diffusion_pytorch_model.bin":
            TUNet(cfg.unet).eval().state_dict(),
        "vae/diffusion_pytorch_model.bin":
            TVAE(cfg.vae).eval().state_dict(),
    }
    for rel, sd in parts.items():
        path = root / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        torch.save(sd, path)
    return root


def _bn(n: int) -> dict:
    return {
        "weight": torch.ones(n), "bias": torch.zeros(n),
        "running_mean": torch.zeros(n), "running_var": torch.ones(n),
        "num_batches_tracked": torch.tensor(0),
    }


def _conv_w(out: int, in_: int, k: int) -> torch.Tensor:
    return torch.randn(out, in_, k, k) * 0.05


def _write_mobilenet_pt(path: Path, num_classes: int) -> Path:
    """torchvision mobilenet_v3_large state_dict with a replaced final
    Linear (the reference's trained-classifier format,
    data/2-trained-classifiers; exp-1:929-935) — synthesized key by key
    from torchvision's published structure, NOT from our converter, so a
    layout drift in io/classifiers.py fails here."""
    from fairdiff.models.mobilenet_v3 import LARGE_CONF, _make_divisible

    torch.manual_seed(1)
    sd: dict[str, torch.Tensor] = {"features.0.0.weight": _conv_w(16, 3, 3)}
    sd.update({f"features.0.1.{k}": v for k, v in _bn(16).items()})
    for i, (k, exp, out, se, _act, _s) in enumerate(LARGE_CONF):
        p = f"features.{i + 1}.block"
        in_ch = 16 if i == 0 else LARGE_CONF[i - 1][2]
        idx = 0
        if exp != in_ch:  # 1x1 expansion Conv2dNormActivation
            sd[f"{p}.{idx}.0.weight"] = _conv_w(exp, in_ch, 1)
            sd.update({f"{p}.{idx}.1.{n}": v for n, v in _bn(exp).items()})
            idx += 1
        # depthwise Conv2dNormActivation (groups=exp -> in dim 1)
        sd[f"{p}.{idx}.0.weight"] = _conv_w(exp, 1, k)
        sd.update({f"{p}.{idx}.1.{n}": v for n, v in _bn(exp).items()})
        idx += 1
        if se:  # SqueezeExcitation: fc1/fc2 1x1 convs with bias
            sq = _make_divisible(exp // 4)
            sd[f"{p}.{idx}.fc1.weight"] = _conv_w(sq, exp, 1)
            sd[f"{p}.{idx}.fc1.bias"] = torch.zeros(sq)
            sd[f"{p}.{idx}.fc2.weight"] = _conv_w(exp, sq, 1)
            sd[f"{p}.{idx}.fc2.bias"] = torch.zeros(exp)
            idx += 1
        sd[f"{p}.{idx}.0.weight"] = _conv_w(out, exp, 1)  # projection
        sd.update({f"{p}.{idx}.1.{n}": v for n, v in _bn(out).items()})
    sd["features.16.0.weight"] = _conv_w(960, LARGE_CONF[-1][2], 1)
    sd.update({f"features.16.1.{n}": v for n, v in _bn(960).items()})
    sd["classifier.0.weight"] = torch.randn(1280, 960) * 0.02
    sd["classifier.0.bias"] = torch.zeros(1280)
    sd["classifier.3.weight"] = torch.randn(num_classes, 1280) * 0.02
    sd["classifier.3.bias"] = torch.zeros(num_classes)
    torch.save(sd, path)
    return path


def _write_sfnet_pth(path: Path) -> Path:
    """opensphere sfnet20 state_dict (data/4-opensphere_checkpoints
    layout, exp-1:970-989): layer{i}.{j}.conv{1,2}.{weight,bias} + the
    CHW-flattened fc — shapes taken from the flax init (the layer
    topology IS the spec), keys written in the torch layout."""
    from fairdiff.models.sfnet import SFNet, SFNetConfig

    cfg = SFNetConfig.for_variant("sfnet20_deprecated")
    params = jax.eval_shape(
        lambda: SFNet(cfg).init(
            jax.random.key(0), jnp.zeros((1, cfg.in_size, cfg.in_size, 3))
        )
    )["params"]
    torch.manual_seed(2)
    sd: dict[str, torch.Tensor] = {}
    for li, n_blocks in enumerate(cfg.layers, 1):
        for bi in range(n_blocks + 1):
            node = params[f"layer{li}_{bi}"]
            for cname, leaf in node.items():
                kh, kw, cin, cout = leaf["kernel"].shape
                sd[f"layer{li}.{bi}.{cname}.weight"] = (
                    torch.randn(cout, cin, kh, kw) * 0.05
                )
                sd[f"layer{li}.{bi}.{cname}.bias"] = torch.zeros(cout)
    side = cfg.in_size // 16
    c = cfg.channels[3]
    sd["fc.weight"] = torch.randn(cfg.out_channel, c * side * side) * 0.02
    sd["fc.bias"] = torch.zeros(cfg.out_channel)
    torch.save(sd, path)
    return path


# -- the pipeline ---------------------------------------------------------

def test_full_weight_pipeline_convert_check_load_train(tmp_path):
    from test_onnx_bridge import _scrfd_like_model

    from fairdiff.tools.convert_guidance import (
        GuidanceConvertConfig, main as convert_guidance,
    )
    from fairdiff.tools.convert_sd import ConvertConfig, main as convert_sd
    from fairdiff.tools.setup_data import SetupDataConfig, check, synthesize

    # 1. external checkpoints, exact layouts, in the reference's hardcoded
    # data/ directory scheme (SURVEY.md §2.3)
    sd_dir = _write_sd_checkpoint(tmp_path / "sd15-fixture")
    data_dir = synthesize(
        SetupDataConfig(synthetic_out=str(tmp_path / "data"))
    )
    cls_dir = data_dir / "2-trained-classifiers"
    cls_dir.mkdir()
    classifier_pt = _write_mobilenet_pt(
        cls_dir / "CelebA-MobileNetLarge-09191318.pt", 80
    )
    os_dir = data_dir / "4-opensphere_checkpoints/20220424_210641/models"
    os_dir.mkdir(parents=True)
    sfnet_pth = _write_sfnet_pth(os_dir / "backbone_100000.pth")
    onnx_path = tmp_path / "det_10g.onnx"
    onnx_path.write_bytes(_scrfd_like_model())
    feats_pkl = data_dir / "3-face-features/exp1/face_feats.pkl"

    # 2. converter CLIs
    store = convert_sd(ConvertConfig(
        sd_dir=str(sd_dir), out_dir=str(tmp_path / "sd-store"),
        preset="tiny",
    ))
    zoo = convert_guidance(GuidanceConvertConfig(
        out_dir=str(tmp_path / "zoo"),
        classifier_pth=str(classifier_pt),
        sfnet_pth=str(sfnet_pth),
        sfnet_variant="sfnet20_deprecated",
        face_feats_pkl=str(feats_pkl),
        detector_onnx=str(onnx_path),
    ))
    for name in ("classifier.npz", "face_embedder.npz", "face_feats.pkl",
                 "det_10g.onnx", "face_embedder_variant.txt"):
        assert (zoo / name).exists(), name

    # 3. data-contract validation over the converted artifacts
    missing = check(SetupDataConfig(
        data_dir=str(data_dir), assets_dir=str(zoo), model_dir=str(store),
    ))
    assert "exp1" not in missing and "sd" not in missing, missing
    # assets: only the optional CLIP/DINO trees may be absent (their
    # converters are golden-tested per-module; full-size ViT weights are
    # out of scope for a CPU fixture run)
    assert all(
        "CLIP" in m or "DINO" in m for m in missing.get("assets", [])
    ), missing

    # 4. converted classifier is tree-isomorphic to the flax model (a
    # key-layout drift would otherwise surface only as an apply error)
    import chex

    from fairdiff.io.adapters_io import load_adapters
    from fairdiff.models.mobilenet_v3 import MobileNetV3Large

    mnv3 = MobileNetV3Large(num_classes=80)
    init_sds = jax.eval_shape(
        lambda: mnv3.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    )["params"]
    chex.assert_trees_all_equal_shapes(
        load_adapters(zoo / "classifier.npz"), init_sds
    )

    # 5. one real optimizer step through the training CLI on the
    # converted store + zoo (model_zoo.load_guidance_stack inside)
    import yaml

    from fairdiff.tools.train_debias import TrainCLIConfig, main as train_main
    from fairdiff.utils.config import cli_parse

    shrink = tmp_path / "shrink.yaml"
    shrink.write_text(yaml.safe_dump({
        "steps_low": 2, "steps_high": 2, "eval_denoising_steps": 2,
        "val_images_per_prompt": 2, "lora_rank": 2,
    }))
    out_dir = tmp_path / "train"
    train_main(cli_parse(TrainCLIConfig, [
        "--experiment", "exp1", "--sd_config", "tiny",
        "--model_dir", str(store), "--guidance_dir", str(zoo),
        "--prompts_json", str(data_dir / "1-prompts/occupation.json"),
        "--output_dir", str(out_dir), "--debias_config", str(shrink),
        "--max_train_steps", "1", "--train_images_per_prompt", "4",
        "--train_micro_batch", "2", "--eval_interval", "50",
    ]))

    metrics = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [m["train_loss"] for m in metrics if "train_loss" in m]
    assert losses and np.isfinite(losses).all(), metrics
    assert (out_dir / "exported").exists() or any(
        out_dir.glob("**/*.npz")
    ), "no exported adapters"
