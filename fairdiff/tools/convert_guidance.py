"""Assemble the production guidance-stack directory from the reference's
torch artifacts — the one-command weight pipeline for the frozen zoo.

The reference loads these pieces ad hoc (exp-1-debias-gender/
1-main-debias.py:929-994): MobileNetV3 attribute classifiers
(data/2-trained-classifiers), the CLIP-ViT-H vision tower, DINOv2
(torch.hub), the opensphere face-rec backbone
(data/4-opensphere_checkpoints/.../backbone_100000.pth), the CelebA
face-feature DB pickle (data/3-face-features), and insightface's SCRFD
detector onnx. This CLI converts whichever of them you have into the
layout `fairdiff.training.model_zoo.load_guidance_stack` consumes:

  python -m fairdiff.tools.convert_guidance \\
      --out_dir /path/guidance \\
      --classifier_pth data/2-trained-classifiers/CelebA-MobileNetLarge.pt \\
      --clip_vision_dir /path/CLIP-ViT-H-14/ \\
      --dinov2_pth /path/dinov2_vitb14.pth \\
      --sfnet_pth data/4-opensphere_checkpoints/.../backbone_100000.pth \\
      --face_feats_pkl data/3-face-features/.../face_feats.pkl \\
      --detector_onnx /path/buffalo_l/det_10g.onnx

Missing inputs are skipped (the stack degrades gracefully; see
model_zoo docstring for which components are optional).
"""

from __future__ import annotations

import dataclasses
import shutil
from pathlib import Path

import numpy as np

from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class GuidanceConvertConfig:
    out_dir: str = "converted-guidance"
    classifier_pth: str = ""
    clip_vision_dir: str = ""
    dinov2_pth: str = ""
    sfnet_pth: str = ""
    sfnet_variant: str = "sfnet20_deprecated"
    face_feats_pkl: str = ""
    detector_onnx: str = ""
    detector_npz: str = ""


def _torch_sd(path: str) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {
        k.removeprefix("module."): v.numpy() for k, v in sd.items()
        if hasattr(v, "numpy")
    }


def main(cfg: GuidanceConvertConfig) -> Path:
    from fairdiff.io.adapters_io import save_adapters

    out = Path(cfg.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = []

    if cfg.classifier_pth:
        from fairdiff.io.classifiers import convert_mobilenet_v3

        save_adapters(
            out / "classifier.npz", convert_mobilenet_v3(_torch_sd(cfg.classifier_pth))
        )
        done.append("classifier")

    if cfg.clip_vision_dir:
        from fairdiff.io.checkpoints import save_params
        from fairdiff.io.feature_models import convert_clip_vision
        from fairdiff.models.clip_vision import CLIPVisionConfig
        from fairdiff.tools.convert_sd import load_state_dict

        sd = load_state_dict(Path(cfg.clip_vision_dir))
        n = CLIPVisionConfig.vit_h14().num_hidden_layers
        save_params(out, {"clip_vision": convert_clip_vision(sd, n)})
        done.append("clip_vision")

    if cfg.dinov2_pth:
        from fairdiff.io.checkpoints import save_params
        from fairdiff.io.feature_models import convert_dinov2
        from fairdiff.models.dinov2 import DINOv2Config

        n = DINOv2Config.vitb14().num_hidden_layers
        save_params(out, {"dinov2": convert_dinov2(_torch_sd(cfg.dinov2_pth), n)})
        done.append("dinov2")

    if cfg.sfnet_pth:
        from fairdiff.models.sfnet import SFNetConfig, convert_sfnet

        sfcfg = SFNetConfig.for_variant(cfg.sfnet_variant)
        save_adapters(
            out / "face_embedder.npz", convert_sfnet(_torch_sd(cfg.sfnet_pth), sfcfg)
        )
        # record the variant: the weight tree is shape-identical across
        # variants, so the loader cannot infer the residual ordering
        (out / "face_embedder_variant.txt").write_text(cfg.sfnet_variant)
        done.append("face_embedder")

    if cfg.face_feats_pkl:
        shutil.copyfile(cfg.face_feats_pkl, out / "face_feats.pkl")
        done.append("face_feats")

    if cfg.detector_onnx:
        # validated + executed by fairdiff.io.onnx_bridge at load time
        shutil.copyfile(cfg.detector_onnx, out / "det_10g.onnx")
        done.append("detector(onnx)")
    elif cfg.detector_npz:
        shutil.copyfile(cfg.detector_npz, out / "detector.npz")
        done.append("detector(npz)")

    print(f"[convert_guidance] wrote {', '.join(done) or 'nothing'} -> {out}")
    return out


if __name__ == "__main__":
    main(cfglib.cli_parse(GuidanceConvertConfig))
