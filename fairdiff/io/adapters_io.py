"""Flat-file adapter serialization (.npz), the analogue of the reference's
exported `text_encoder_lora[_EMA].pth` / `unet_lora[_EMA].pth` /
`prefix_embedding[_EMA].pth` artifacts (exp-1 2-export-checkpoint.py:619-642,
exp-2 2-export-checkpoint.py:556-576)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

_SEP = "|"


def save_adapters(path: str | Path, tree: Any) -> None:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for keypath, leaf in flat:
        name = _SEP.join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        out[name] = np.asarray(leaf)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **out)


def load_adapters(path: str | Path) -> Any:
    data = np.load(path)
    tree: dict[str, Any] = {}
    for name in data.files:
        node = tree
        parts = name.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[name]
    return tree
