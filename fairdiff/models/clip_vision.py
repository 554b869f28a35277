"""CLIP vision tower with projection (Flax) — the image-preservation loss
backbone.

Reference: `CLIPVisionModelWithProjection` CLIP-ViT-H-14 at
exp-1-debias-gender/1-main-debias.py:948-959, consumed via `get_clip_feat`
(:1139-1157): normalised `image_embeds`. Same encoder-layer stack as the
text model (shared fairdiff.models.layers); no causal mask; gelu act.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.models.clip_text import CLIPEncoderLayer, CLIPTextConfig


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_h14(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            projection_dim=16,
        )

    def _text_view(self) -> CLIPTextConfig:
        return CLIPTextConfig(
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            hidden_act=self.hidden_act,
            layer_norm_eps=self.layer_norm_eps,
        )


class CLIPVisionModel(nn.Module):
    """images [N,H,W,3] (CLIP-normalised) -> {image_embeds, pooler_output}."""

    config: CLIPVisionConfig = CLIPVisionConfig.vit_h14()
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, images: jax.Array) -> dict[str, jax.Array]:
        cfg = self.config
        lcfg = cfg._text_view()
        n = images.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(images.astype(self.dtype))
        patches = patches.reshape(n, -1, cfg.hidden_size)
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.tile(cls_tok[None, None], (n, 1, 1)).astype(self.dtype), patches],
            axis=1,
        )
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (num_pos, cfg.hidden_size),
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x)
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(lcfg, self.dtype, self.use_flash, name=f"layers_{i}")(
                x, bias=None
            )
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(x[:, 0])
        image_embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        return {"image_embeds": image_embeds, "pooler_output": pooled}
