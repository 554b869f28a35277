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


def load_params(
    directory: str | Path, names: list[str], *, cast: Any = None
) -> dict[str, Any]:
    directory = Path(directory).absolute()
    out = {}
    with ocp.StandardCheckpointer() as ckptr:
        for name in names:
            tree = ckptr.restore(directory / name)
            if cast is not None:
                tree = cast_floats(tree, cast)
            out[name] = tree
    return out


def cast_floats(tree: Any, dtype: Any) -> Any:
    """Cast float leaves (frozen-weight bf16 policy — the TPU analogue of
    the reference's fp16 inference cast, exp-1:722-794). Non-float leaves
    (ids, masks) pass through."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype)
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def load_sd_params(directory: str | Path, *, cast: Any = "bfloat16") -> dict[str, Any]:
    """-> {"text_encoder", "unet", "vae"} param trees for StableDiffusion.
    Frozen weights default to bf16 residency (LoRA/prefix adapters are
    created separately in f32)."""
    return load_params(directory, ["text_encoder", "unet", "vae"], cast=cast)
