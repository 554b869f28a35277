"""CLIP text encoder (Flax linen), SD-1.5's conditioning model.

Functional re-design of the HF `CLIPTextModel` the reference loads at
exp-1-debias-gender/1-main-debias.py:723-728. Two capabilities the
reference bolts on are first-class here:

- `inputs_embeds` injection: the soft-prompt path (exp-2) monkey-patches
  `text_model_forward` to splice trainable prefix-token embeddings past the
  frozen embedding table (exp-2-debias-gender-token/1-main-debias.py:357-448).
  Here the model simply accepts pre-computed token embeddings.
- the pooled output uses the *argmax-of-token-ids* rule of the CLIP
  checkpoint generation SD-1.5 ships with (reference keeps HF's behavior,
  including the knowingly-wrong pooled output under added tokens —
  gen-images.py:256 — which we reproduce for parity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.models.layers import (
    MultiHeadAttention,
    TransformerMLP,
    expand_padding_mask,
    make_causal_mask,
)


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407

    @classmethod
    def sd15(cls) -> "CLIPTextConfig":
        return cls()


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, bias: jax.Array) -> jax.Array:
        cfg = self.config
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = MultiHeadAttention(
            cfg.hidden_size,
            cfg.num_attention_heads,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="self_attn",
        )(x, bias=bias)
        x = residual + x
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        x = TransformerMLP(
            cfg.intermediate_size, cfg.hidden_size, cfg.hidden_act, self.dtype, name="mlp"
        )(x)
        return residual + x


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # [B, S] int32
        attention_mask: Optional[jax.Array] = None,  # [B, S] {0,1}
        inputs_embeds: Optional[jax.Array] = None,  # [B, S, C] overrides table
    ) -> dict[str, jax.Array]:
        cfg = self.config
        B, S = input_ids.shape

        token_embedding = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )
        if inputs_embeds is None:
            inputs_embeds = token_embedding(input_ids)
        else:
            token_embedding(jnp.zeros((1, 1), jnp.int32))  # materialize params
        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = inputs_embeds + position_embedding[None, :S].astype(inputs_embeds.dtype)

        bias = make_causal_mask(S)
        if attention_mask is not None:
            bias = bias + expand_padding_mask(attention_mask)

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(
                cfg, self.dtype, self.use_flash, name=f"layers_{i}"
            )(x, bias)

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)

        # SD-1.5's CLIP predates eos_token_id-aware pooling: HF uses
        # argmax(input_ids) (the highest id == eos 49407 in-vocab). We keep
        # that rule — including its known wrongness once extra tokens are
        # appended (exp-2 soft prompts; gen-images.py:256).
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        return {"last_hidden_state": x, "pooler_output": pooled}
