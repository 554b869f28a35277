"""Import adapters exported BY THE REFERENCE implementation.

The reference's `2-export-checkpoint.py` writes torch .pth files
(exp-1-debias-gender/2-export-checkpoint.py:619-642, exp-2 variant
:556-576):

  text_encoder_lora[_EMA].pth  dict keyed by the patched parameter names,
      e.g. text_model.encoder.layers.3.self_attn.q_proj.
           lora_linear_layer.down.weight              (diffusers
      LoraLoaderMixin._modify_text_encoder(patch_mlp=True) layout)
  unet_lora[_EMA].pth          AttnProcsLayers.state_dict(), e.g.
      down_blocks.0.attentions.1.transformer_blocks.0.attn2.processor.
           to_q_lora.up.weight
  prefix_embedding[_EMA].pth   FairEmbeddings state dict
      (token_embedding.weight [n_prefix+1, D])

These loaders remap them into fairdiff adapter pytrees so a user can
continue from (or just run) checkpoints trained with the reference.
torch Linear weights are [out, in]; our down/up kernels are [in, rank] /
[rank, out], hence the transposes. diffusers' LoRA scale and
network_alpha are 1.0/None in the reference configuration, so the merged
math W + down@up matches exactly.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Mapping

import numpy as np

_TE_KEY = re.compile(
    r"^(?:text_model\.)?encoder\.layers\.(\d+)\."
    r"(self_attn\.(?:q|k|v|out)_proj|mlp\.fc[12])"
    r"\.lora_linear_layer\.(down|up)\.weight$"
)
_UNET_BLOCK = re.compile(
    r"^(down_blocks\.(\d+)\.attentions\.(\d+)"
    r"|mid_block\.attentions\.0"
    r"|up_blocks\.(\d+)\.attentions\.(\d+))\."
    r"transformer_blocks\.(\d+)\.attn([12])\.processor\."
    r"to_(q|k|v|out)_lora\.(down|up)\.weight$"
)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def _load_sd(sd_or_path) -> Mapping[str, Any]:
    if isinstance(sd_or_path, (str, Path)):
        import torch

        return torch.load(sd_or_path, map_location="cpu", weights_only=True)
    return sd_or_path


def _place(tree: dict, path: list[str], leaf: np.ndarray) -> None:
    node = tree
    for name in path[:-1]:
        node = node.setdefault(name, {})
    node[path[-1]] = leaf


def load_reference_te_lora(sd_or_path) -> dict:
    """text_encoder_lora[_EMA].pth -> fairdiff te_lora tree."""
    sd = _load_sd(sd_or_path)
    tree: dict = {}
    for key, val in sd.items():
        m = _TE_KEY.match(key)
        if not m:
            raise KeyError(f"unrecognised TE LoRA key: {key}")
        layer, proj, du = m.groups()
        path = [f"layers_{layer}", *proj.split("."), du]
        _place(tree, path, _np(val).T)
    if not tree:
        raise ValueError("empty TE LoRA state dict")
    return tree


def load_reference_unet_lora(sd_or_path) -> dict:
    """unet_lora[_EMA].pth (AttnProcsLayers layout) -> unet_lora tree."""
    sd = _load_sd(sd_or_path)
    tree: dict = {}
    for key, val in sd.items():
        m = _UNET_BLOCK.match(key)
        if not m:
            raise KeyError(f"unrecognised UNet LoRA key: {key}")
        block, d_i, d_j, u_i, u_j, tb, attn, proj, du = m.groups()
        if block.startswith("down_blocks"):
            node = f"down_{d_i}_attn_{d_j}"
        elif block.startswith("up_blocks"):
            node = f"up_{u_i}_attn_{u_j}"
        else:
            node = "mid_attn_0"
        path = [node, f"transformer_blocks_{tb}", f"attn{attn}",
                f"to_{proj}", du]
        _place(tree, path, _np(val).T)
    if not tree:
        raise ValueError("empty UNet LoRA state dict")
    return tree


def load_reference_prefix(sd_or_path) -> np.ndarray:
    """prefix_embedding[_EMA].pth -> prefix table [n_prefix+1, D]."""
    sd = _load_sd(sd_or_path)
    for key in ("token_embedding.weight", "weight"):
        if key in sd:
            return _np(sd[key])
    raise KeyError(f"no prefix embedding table in keys {list(sd)[:5]}")


def _walk(tree: Mapping, prefix=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def save_reference_te_lora(tree: Mapping) -> dict[str, np.ndarray]:
    """fairdiff te_lora tree -> the reference's text_encoder_lora.pth key
    layout (inverse of load_reference_te_lora)."""
    out = {}
    for path, val in _walk(tree):
        layer, *proj, du = path
        i = layer.removeprefix("layers_")
        key = (
            f"text_model.encoder.layers.{i}.{'.'.join(proj)}"
            f".lora_linear_layer.{du}.weight"
        )
        out[key] = _np(val).T
    return out


def save_reference_unet_lora(tree: Mapping) -> dict[str, np.ndarray]:
    """fairdiff unet_lora tree -> AttnProcsLayers.state_dict() key layout
    (inverse of load_reference_unet_lora)."""
    out = {}
    for path, val in _walk(tree):
        node, tb, attn, proj, du = path
        if node == "mid_attn_0":
            block = "mid_block.attentions.0"
        else:
            side, i, _, j = node.split("_")
            block = f"{side}_blocks.{i}.attentions.{j}"
        key = (
            f"{block}.transformer_blocks.{tb.removeprefix('transformer_blocks_')}"
            f".{attn}.processor.{proj}_lora.{du}.weight"
        )
        out[key] = _np(val).T
    return out


def load_reference_adapters(path: str | Path):
    """Dispatch on the reference's exported file name / key layout.

    -> ("unet_lora" | "te_lora" | "prefix", tree-or-array)
    """
    sd = _load_sd(path)
    keys = list(sd)
    if any("processor.to_" in k for k in keys):
        return "unet_lora", load_reference_unet_lora(sd)
    if any("lora_linear_layer" in k for k in keys):
        return "te_lora", load_reference_te_lora(sd)
    return "prefix", load_reference_prefix(sd)
