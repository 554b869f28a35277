"""Convert a diffusers-layout Stable Diffusion checkpoint directory into
fairdiff's orbax parameter store.

Input: a local `runwayml/stable-diffusion-v1-5`-style directory with
{text_encoder,unet,vae}/ subfolders holding torch .bin or .safetensors
weights (the reference consumes the same layout via from_pretrained,
exp-1-debias-gender/1-main-debias.py:722-741).

  python -m fairdiff.tools.convert_sd --sd_dir /path/sd15 --out_dir /path/converted
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from fairdiff.io.checkpoints import save_params
from fairdiff.io.sd_loader import convert_unet, convert_vae
from fairdiff.io.torch_convert import convert_clip_text
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class ConvertConfig:
    sd_dir: str = ""
    out_dir: str = "converted-sd15"
    # architecture preset the input checkpoint matches: "sd15" (production)
    # or "tiny" (fixture-scale checkpoints in the same diffusers layout —
    # lets tests/test_weights_pipeline_e2e.py drive this CLI end-to-end)
    preset: str = "sd15"


def load_state_dict(model_dir: Path) -> dict[str, np.ndarray]:
    """Read all .safetensors or torch .bin weights in a model subfolder."""
    sts = sorted(model_dir.glob("*.safetensors"))
    if sts:
        try:
            from safetensors.numpy import load_file

            out = {}
            for f in sts:
                out.update(load_file(f))
            return out
        except ImportError:
            pass
    bins = sorted(model_dir.glob("*.bin")) + sorted(model_dir.glob("*.pth"))
    if not bins:
        raise FileNotFoundError(f"no weights in {model_dir}")
    import torch

    out = {}
    for f in bins:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        out.update({k: v.numpy() for k, v in sd.items()})
    return out


def main(cfg: ConvertConfig) -> Path:
    from fairdiff.sampling.pipeline import SDConfig

    arch = {"sd15": SDConfig.sd15, "tiny": SDConfig.tiny}[cfg.preset]()
    sd_dir = Path(cfg.sd_dir)
    params = {
        "text_encoder": convert_clip_text(
            load_state_dict(sd_dir / "text_encoder"),
            arch.text.num_hidden_layers,
        ),
        "unet": convert_unet(load_state_dict(sd_dir / "unet"), arch.unet),
        "vae": convert_vae(load_state_dict(sd_dir / "vae"), arch.vae),
    }
    out = Path(cfg.out_dir)
    save_params(out, params)
    print(f"[convert-sd] wrote {out}")
    return out


if __name__ == "__main__":
    main(cfglib.cli_parse(ConvertConfig))
