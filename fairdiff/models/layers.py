"""Shared neural-net building blocks (Flax linen).

One attention implementation serves every transformer in the zoo (CLIP
text/vision, DINOv2, SD U-Net): a fused-friendly einsum formulation with
fp32 softmax that XLA maps onto the MXU, optionally swapped for the Pallas
flash-attention kernel in fairdiff.ops when sequence length and head dims
are TPU-tile friendly.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation (matches transformers' `quick_gelu`)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "hardswish": jax.nn.hard_swish,
}


class FusedGroupNorm(nn.Module):
    """GroupNorm with an optional fused SiLU epilogue.

    Drop-in for `nn.GroupNorm` (+ `jax.nn.silu`): same param names/shapes
    (`scale`, `bias` of [C]), f32 statistics. On TPU, single-VMEM-pass
    Pallas kernel when one sample's activation fits (fairdiff.ops.group_norm);
    XLA everywhere else.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    use_silu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fairdiff.ops.group_norm import fused_group_norm_silu

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return fused_group_norm_silu(
            x.astype(self.dtype), scale, bias, self.num_groups, self.epsilon,
            self.use_silu,
        )


# minimum key length for the flash kernel (module-level so tests can
# force the flash path at tiny shapes)
# 512 since r5: the roofline ledger showed the 256-token self-attention
# running the Pallas path at 2-4% of roof (pure per-call overhead), and
# the full-step A/B measured routing it to the rematerialized XLA path
# at 37.33 vs 37.92 chip*s (PERF.md r5). 1024-token KV stays flash
# (flash 0.98 vs XLA 1.46 ms, r2). FAIRDIFF_FLASH_MIN_KV overrides.
FLASH_MIN_KV = 512


def _flash_min_kv() -> int:
    import os

    return int(os.environ.get("FAIRDIFF_FLASH_MIN_KV", "0")) or FLASH_MIN_KV


def dot_product_attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, T, H, D]
    v: jax.Array,  # [B, T, H, D]
    bias: Optional[jax.Array] = None,  # additive, broadcastable to [B,H,S,T]
    *,
    use_flash: bool = False,
) -> jax.Array:
    """Multi-head attention core. fp32 softmax regardless of input dtype
    (the TPU analogue of the reference's fp16-with-fp32-softmax numerics)."""
    # flash only where it wins: long-key self-attention (the 1024/4096-token
    # UNet latents). Short keys (77-token cross-attn, 257-token CLIP) pad to
    # the 512-lane tile and lose to the fused XLA softmax path.
    if use_flash and bias is None and k.shape[1] >= _flash_min_kv():
        from fairdiff.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    # rematerialized: the backward otherwise saves probs [B,H,S,T] per
    # layer — at the UNet's S=4096 q-rows with T=77 cross-attn keys
    # that is ~80MB/layer (~1.3GB across SD-1.5), which OOMs the
    # one-step pair VJP on 16G. Recomputing this softmax in the VJP is
    # ~2% of block FLOPs; no-grad paths are unaffected by checkpoint.
    #
    # FAIRDIFF_COMPACT_RESIDUALS=1 additionally merges heads at the
    # checkpoint boundary: jax.checkpoint saves its INPUTS, and a
    # [B,S,H,D] array tile-pads D to the 128-lane boundary in HBM (3.2x
    # for SD-1.5's 40-wide heads — see PERF.md round 3). The merged
    # [B,S,H*D] residual is lane-aligned; the split back to heads happens
    # inside the checkpointed region, where it is a transient temp. A
    # memory lever, default OFF (see ops.flash_attention
    # .compact_residuals_enabled for the measured tradeoff).
    from fairdiff.ops.flash_attention import compact_residuals_enabled

    if compact_residuals_enabled():
        H = q.shape[2]
        merge = lambda x: x.reshape(x.shape[0], x.shape[1], -1)
        return _xla_attention_merged(merge(q), merge(k), merge(v), bias, H)
    return _xla_attention_ckpt(q, k, v, bias)


@functools.partial(jax.checkpoint, static_argnums=(4,))
def _xla_attention_merged(q, k, v, bias, n_heads):
    split = lambda x: x.reshape(*x.shape[:2], n_heads, -1)
    return _xla_attention(split(q), split(k), split(v), bias)


def _xla_attention(q, k, v, bias=None):
    orig_dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    # preferred_element_type: the MXU accumulates bf16 products in fp32
    # anyway — asking for fp32 out keeps full-precision logits for the
    # softmax at identical cost (the old astype-after rounded to bf16 first)
    logits = (
        jnp.einsum(
            "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
        )
        * scale
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


_xla_attention_ckpt = jax.checkpoint(_xla_attention)


class MultiHeadAttention(nn.Module):
    """Pre-projection MHA with separate q/k/v/out kernels.

    Parameter names (q_proj/k_proj/v_proj/out_proj) deliberately match the
    HF transformers naming so weight conversion is mechanical.
    """

    embed_dim: int
    num_heads: int
    out_dim: Optional[int] = None
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        hidden: jax.Array,  # [B, S, C]
        context: Optional[jax.Array] = None,  # [B, T, Cc] for cross-attn
        bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        context = hidden if context is None else context
        head_dim = self.embed_dim // self.num_heads
        dense = lambda name, feats: nn.Dense(
            feats, use_bias=self.use_bias, dtype=self.dtype, name=name
        )
        q = dense("q_proj", self.embed_dim)(hidden)
        k = dense("k_proj", self.embed_dim)(context)
        v = dense("v_proj", self.embed_dim)(context)

        B, S, _ = q.shape
        T = k.shape[1]
        q = q.reshape(B, S, self.num_heads, head_dim)
        k = k.reshape(B, T, self.num_heads, head_dim)
        v = v.reshape(B, T, self.num_heads, head_dim)

        out = dot_product_attention(q, k, v, bias, use_flash=self.use_flash)
        out = out.reshape(B, S, self.embed_dim)
        return dense("out_proj", self.out_dim or self.embed_dim)(out)


class TransformerMLP(nn.Module):
    """fc1 -> act -> fc2 (HF naming)."""

    hidden_dim: int
    out_dim: int
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = ACTIVATIONS[self.activation](x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


def make_causal_mask(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal bias [1, 1, S, S]."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), jnp.finfo(dtype).min), k=1)
    return mask[None, None].astype(dtype)


def expand_padding_mask(attention_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, T] {0,1} -> additive bias [B, 1, 1, T] (HF `_expand_mask`,
    replicated by the reference's custom CLIP forward at
    exp-2-debias-gender-token/1-main-debias.py:357-448)."""
    bias = (1.0 - attention_mask.astype(dtype)) * jnp.finfo(dtype).min
    return bias[:, None, None, :]
