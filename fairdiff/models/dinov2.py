"""DINOv2 ViT (Flax) — the second image-preservation backbone.

Reference loads `dinov2_vitb14` from torch.hub and uses the normalised CLS
feature (exp-1-debias-gender/1-main-debias.py:962-966, get_dino_feat
:1158-1177). Architecture: ViT with 14px patches, LayerScale residual
gains, interpolated position embeddings, final LayerNorm; forward returns
the CLS token of the normed output (x_norm_clstoken).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.models.layers import MultiHeadAttention, TransformerMLP


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    patch_size: int = 14
    pos_embed_size: int = 37  # 518/14 grid the checkpoint was trained with
    layer_norm_eps: float = 1e-6

    @classmethod
    def vitb14(cls) -> "DINOv2Config":
        return cls()

    @classmethod
    def tiny(cls) -> "DINOv2Config":
        return cls(
            hidden_size=32, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, pos_embed_size=4,
        )


class DINOv2Layer(nn.Module):
    config: DINOv2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm1")(x)
        h = MultiHeadAttention(
            cfg.hidden_size, cfg.num_attention_heads, dtype=self.dtype, name="attention"
        )(h)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (cfg.hidden_size,))
        x = x + h * ls1.astype(self.dtype)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(x)
        h = TransformerMLP(
            cfg.intermediate_size, cfg.hidden_size, "gelu", self.dtype, name="mlp"
        )(h)
        ls2 = self.param("layer_scale2", nn.initializers.ones, (cfg.hidden_size,))
        return x + h * ls2.astype(self.dtype)


class DINOv2Model(nn.Module):
    """images [N,H,W,3] (ImageNet-normalised, H=W multiple of patch) ->
    CLS feature [N, hidden] after the final LayerNorm."""

    config: DINOv2Config = DINOv2Config.vitb14()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.config
        n, h, w, _ = images.shape
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size, padding="VALID", dtype=self.dtype,
            name="patch_embedding",
        )(images.astype(self.dtype))
        patches = patches.reshape(n, gh * gw, cfg.hidden_size)
        cls_tok = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size)
        )
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (cfg.pos_embed_size * cfg.pos_embed_size + 1, cfg.hidden_size),
        )
        # bicubic-interpolate the grid part of the position table to (gh, gw)
        # (dinov2 interpolate_pos_encoding)
        pos_cls, pos_grid = pos[:1], pos[1:]
        if (gh, gw) != (cfg.pos_embed_size, cfg.pos_embed_size):
            grid = pos_grid.reshape(
                cfg.pos_embed_size, cfg.pos_embed_size, cfg.hidden_size
            )
            grid = jax.image.resize(grid, (gh, gw, cfg.hidden_size), "cubic")
            pos_grid = grid.reshape(gh * gw, cfg.hidden_size)
        x = jnp.concatenate(
            [jnp.tile(cls_tok, (n, 1, 1)).astype(self.dtype), patches], axis=1
        )
        x = x + jnp.concatenate([pos_cls, pos_grid], axis=0)[None].astype(self.dtype)
        for i in range(cfg.num_hidden_layers):
            x = DINOv2Layer(cfg, self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return x[:, 0]
