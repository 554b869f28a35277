"""EMA shadows for adapter trees.

Reference: torch_ema `ExponentialMovingAverage(decay=0.996)` over UNet-LoRA
and TE-LoRA params (exp-1-debias-gender/1-main-debias.py:823-824,:874-879),
stepped after each optimizer step (:2025-2029) and swapped in for EMA
evaluation (:1659-1685). Here EMA is a plain pytree updated functionally —
no store/restore dance: evaluation simply applies the EMA tree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.asarray, params)


def update_ema(ema: Any, params: Any, decay: float = 0.996, count: int | None = None) -> Any:
    """One EMA step. If `count` is given, uses torch_ema's ramp-in decay
    min(decay, (1+count)/(10+count)) so early steps track the params."""
    if count is not None:
        decay = min(decay, (1.0 + count) / (10.0 + count))
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )
