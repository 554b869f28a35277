"""LoRA adapters as functional parameter trees.

The reference injects LoRA by monkey-patching attention processors into the
torch UNet (exp-1-debias-gender/1-main-debias.py:798-827) and rewriting the
text encoder's linear modules via `LoraLoaderMixin._modify_text_encoder`
(:829-883). TPU-first, LoRA is instead a *separate pytree* `{path ->
(down, up)}`; at apply time the deltas are merged into the frozen kernels
inside the jitted step:

    merged_kernel = frozen_kernel + scale * down @ up

This is differentiable w.r.t. (down, up), keeps the model code adapter-free,
costs one rank-r matmul per target kernel per step (negligible next to the
UNet), and means optimizer state exists only for the tiny LoRA tree — the
same parameter-partition the reference gets via `AttnProcsLayers` +
ParameterList, without any module surgery.

Init matches diffusers `LoRALinearLayer`: down ~ N(0, 1/rank), up = 0, so
step 0 is an exact no-op (the reference asserts the same via its
rank-broadcast identical-init prints, :827/:883).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

Path = tuple[str, ...]


def _iter_kernels(params: Mapping, prefix: Path = ()):
    # sorted: the per-kernel PRNG key sequence in init_lora must not depend
    # on dict insertion order (jax tree_map returns key-sorted dicts, so a
    # mesh-replicated param tree would otherwise seed LoRA differently than
    # the raw flax tree — found by test_mesh_matches_single_device)
    for k in sorted(params):
        v = params[k]
        p = prefix + (k,)
        if isinstance(v, Mapping):
            yield from _iter_kernels(v, p)
        elif k == "kernel" and getattr(v, "ndim", 0) == 2:
            yield p, v


def unet_attention_targets(path: Path) -> bool:
    """UNet LoRA surface (reference :798-827 — every attn processor's
    q/k/v/out)."""
    return any(m in path for m in ("to_q", "to_k", "to_v", "to_out"))


def text_encoder_targets(path: Path) -> bool:
    """TE LoRA surface (reference :829-883 — self_attn q/k/v/out + MLP,
    patch_mlp=True)."""
    in_attn = "self_attn" in path and any(
        m in path for m in ("q_proj", "k_proj", "v_proj", "out_proj")
    )
    in_mlp = "mlp" in path and any(m in path for m in ("fc1", "fc2"))
    return in_attn or in_mlp


def init_lora(
    params: Mapping,
    target: Callable[[Path], bool],
    rank: int,
    key: jax.Array,
    dtype=jnp.float32,
) -> dict:
    """Build a LoRA tree for every targeted 2-D kernel in `params`."""
    lora: dict[str, Any] = {}
    for path, kernel in _iter_kernels(params):
        if not target(path[:-1]):
            continue
        d_in, d_out = kernel.shape
        key, sub = jax.random.split(key)
        node = lora
        for name in path[:-1]:
            node = node.setdefault(name, {})
        node["down"] = (
            jax.random.normal(sub, (d_in, rank), dtype) / rank
        )
        node["up"] = jnp.zeros((rank, d_out), dtype)
    return lora


def apply_lora(params: Mapping, lora: Mapping, scale: float = 1.0):
    """Merge LoRA deltas into a copy of `params` (differentiable in lora)."""

    def merge(p_node: Mapping, l_node: Mapping):
        out = {}
        for k, v in p_node.items():
            if k == "kernel" and "down" in l_node:
                # merge in f32 and round ONCE: with bf16 frozen kernels,
                # adding a pre-rounded bf16 delta would round twice and
                # can drop sub-ulp(W) updates entirely. Numerically this
                # matches the reference's precision story: its fp32 TE
                # LoRA branch (exp-1:829-883, diffusers LoRALinearLayer)
                # is also summed into fp16 activations, i.e. rounded to
                # half precision at the add — weight-space vs activation-
                # space rounding of the same magnitude (see
                # tests/test_adapters.py::test_lora_bf16_merge_precision).
                delta = l_node["down"].astype(jnp.float32) @ l_node[
                    "up"
                ].astype(jnp.float32)
                out[k] = (v.astype(jnp.float32) + scale * delta).astype(v.dtype)
            elif isinstance(v, Mapping) and k in l_node:
                out[k] = merge(v, l_node[k])
            else:
                out[k] = v
        return out

    return merge(params, lora)


def lora_param_count(lora: Mapping) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(lora))
