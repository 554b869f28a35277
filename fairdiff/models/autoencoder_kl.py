"""SD-1.5 VAE (AutoencoderKL) in Flax linen, NHWC.

Re-design of the diffusers `AutoencoderKL` the reference decodes through at
the end of every sampling chain (exp-1-debias-gender/1-main-debias.py:1059,
:1133) with gradient checkpointing enabled for the differentiable pass
(:748-749). Decode is the hot direction; encode exists for completeness
(latent-space preservation losses, tooling).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.models.unet2d import Downsample2D, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def sd15(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 16, 32, 32), norm_num_groups=8)


class VAEAttention(nn.Module):
    """Single-head full self-attention over spatial positions (VAE mid)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = jnp.einsum("bsc,btc->bst", q, k).astype(jnp.float32) * (C ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        h = jnp.einsum("bst,btc->bsc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        ch = cfg.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch,
                    cfg.norm_num_groups,
                    use_temb=False,
                    dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(h)
            if i < len(ch) - 1:
                # diffusers VAE downsample: asymmetric (0,1,0,1) pad, stride 2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    out_ch, (3, 3), strides=2, padding="VALID",
                    dtype=self.dtype, name=f"down_{i}_downsample",
                )(h)
        h = ResnetBlock2D(
            ch[-1], cfg.norm_num_groups, use_temb=False, dtype=self.dtype, name="mid_resnet_0"
        )(h)
        h = VAEAttention(ch[-1], cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(
            ch[-1], cfg.norm_num_groups, use_temb=False, dtype=self.dtype, name="mid_resnet_1"
        )(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        ch = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock2D(
            ch[0], cfg.norm_num_groups, use_temb=False, dtype=self.dtype, name="mid_resnet_0"
        )(h)
        h = VAEAttention(ch[0], cfg.norm_num_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(
            ch[0], cfg.norm_num_groups, use_temb=False, dtype=self.dtype, name="mid_resnet_1"
        )(h)
        for i, out_ch in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(
                    out_ch,
                    cfg.norm_num_groups,
                    use_temb=False,
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h)
            if i < len(ch) - 1:
                h = Upsample2D(out_ch, self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig.sd15()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """-> (mean, logvar) of the latent posterior, NHWC."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        """latents [B,h,w,4] (already divided by scaling_factor) -> image
        [B,H,W,3]; caller clamps to [-1,1] per reference convention."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = mean
        if key is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)
        return self.decode(z), mean, logvar
