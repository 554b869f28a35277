"""Converted-model parameter store (orbax-backed directory layout).

`convert_sd` tooling writes each converted model under
<dir>/{text_encoder,unet,vae}/ as an orbax StandardCheckpoint;
`load_sd_params` restores the pytree the sampling pipeline consumes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


def save_params(directory: str | Path, params: dict[str, Any]) -> None:
    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        for name, tree in params.items():
            ckptr.save(directory / name, tree, force=True)


def load_params(directory: str | Path, names: list[str]) -> dict[str, Any]:
    directory = Path(directory).absolute()
    out = {}
    with ocp.StandardCheckpointer() as ckptr:
        for name in names:
            out[name] = ckptr.restore(directory / name)
    return out


def load_sd_params(directory: str | Path) -> dict[str, Any]:
    """-> {"text_encoder", "unet", "vae"} param trees for StableDiffusion."""
    return load_params(directory, ["text_encoder", "unet", "vae"])
