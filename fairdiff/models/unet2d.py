"""SD-1.5 conditional U-Net (Flax linen, NHWC, TPU-first).

Functional re-design of the diffusers `UNet2DConditionModel` the reference
finetunes through (exp-1-debias-gender/1-main-debias.py:733-737, hot loops
at :998-1136). Differences from the torch original are deliberate TPU
choices, not omissions:

- NHWC layout end-to-end (XLA:TPU's native conv layout; avoids the
  transposes a naive port would insert around every conv).
- attention runs through one shared einsum/flash path with fp32 softmax
  (fairdiff.models.layers / fairdiff.ops.flash_attention).
- LoRA is not monkey-patched into attention processors (reference
  :798-827); it is a separate parameter tree merged functionally at apply
  time (fairdiff.adapters.lora).
- gradient checkpointing is a `jax.checkpoint` policy wrapped around each
  transformer/resnet block by the caller, not a mutable model flag.

Weight conversion from the torch checkpoint layout lives in
fairdiff.io.torch_convert / sd_loader.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.models.layers import dot_product_attention, expand_padding_mask


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # diffusers quirk: this is the head *count*
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # which down/up blocks carry cross-attention transformers
    cross_attn_down: tuple[bool, ...] = (True, True, True, False)
    cross_attn_up: tuple[bool, ...] = (False, True, True, True)

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "UNetConfig":
        """CPU-testable miniature with the same topology."""
        return cls(
            sample_size=8,
            block_out_channels=(32, 64, 64, 64),
            cross_attention_dim=32,
            attention_head_dim=2,
            norm_num_groups=8,
        )


def timestep_embedding(
    timesteps: jax.Array, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0
) -> jax.Array:
    """Sinusoidal embedding, matching diffusers `get_timestep_embedding`."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array) -> jax.Array:
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = jax.nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_temb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                jax.nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class CrossAttention(nn.Module):
    """diffusers-style attention (to_q/to_k/to_v biasless, to_out biased)."""

    query_dim: int
    heads: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        context_mask: Optional[jax.Array] = None,  # [B, T] {0,1} key mask
    ) -> jax.Array:
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, S, _ = q.shape
        T = k.shape[1]
        q = q.reshape(B, S, self.heads, head_dim)
        k = k.reshape(B, T, self.heads, head_dim)
        v = v.reshape(B, T, self.heads, head_dim)
        # masking pad keys makes the static-77 context numerically equal to
        # the reference's compact-length cross-attention (exp-1:1010-1027)
        bias = None if context_mask is None else expand_padding_mask(context_mask)
        out = dot_product_attention(q, k, v, bias, use_flash=self.use_flash)
        out = out.reshape(B, S, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class _DenseParams(nn.Module):
    """Declares an nn.Dense-shaped {kernel, bias} without running its
    matmul — the fused-GEGLU path consumes the weights directly while the
    param tree (and so every converter/checkpoint) stays byte-identical."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from fairdiff.ops.geglu import fused_geglu, fused_geglu_enabled

        inner = self.dim * self.mult
        if fused_geglu_enabled():
            # Pallas kernel: gate computed in VMEM, the 8*d projection
            # never hits HBM (ops/geglu.py; default ON for single-TPU,
            # FAIRDIFF_FUSED_GEGLU=0 opts out)
            k, b = _DenseParams(x.shape[-1], inner * 2, name="proj")()
            h = fused_geglu(
                x.astype(self.dtype), k.astype(self.dtype),
                b.astype(self.dtype),
            )
        else:
            proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
            h, gate = jnp.split(proj, 2, axis=-1)
            h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        context_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        # epsilon=1e-5: torch nn.LayerNorm default (diffusers uses it);
        # flax defaults to 1e-6 — caught by the torch activation goldens
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.dim, self.heads, dtype=self.dtype, use_flash=self.use_flash, name="attn1"
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.dim,
            self.heads,
            self.context_dim,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="attn2",
        )(h, context, context_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForwardGEGLU(self.dim, dtype=self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 proj -> blocks -> 1x1 proj + residual."""

    heads: int
    context_dim: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: jax.Array,
        context_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        h = BasicTransformerBlock(
            C,
            self.heads,
            self.context_dim,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="transformer_blocks_0",
        )(h, context, context_mask)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.channels, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    """The SD U-Net epsilon-predictor.

    __call__(latents [B,H,W,4], timesteps [B] or scalar, context [B,T,768])
      -> noise prediction [B,H,W,4]
    """

    config: UNetConfig = UNetConfig.sd15()
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False

    def _block(self, cls, *args, **kwargs):
        if self.remat:
            cls = nn.remat(cls, static_argnums=())
        return cls(*args, **kwargs)

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_attention_mask: Optional[jax.Array] = None,  # [B,T] {0,1}
    ) -> jax.Array:
        cfg = self.config
        ch = cfg.block_out_channels
        heads = cfg.attention_head_dim
        temb_dim = ch[0] * 4

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(
            timesteps, ch[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(temb_dim, self.dtype, name="time_embedding")(t_emb)

        sample = sample.astype(self.dtype)
        context = encoder_hidden_states.astype(self.dtype)

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        skips = [h]

        # ----- down path -----
        for i, out_ch in enumerate(ch):
            has_attn = cfg.cross_attn_down[i]
            for j in range(cfg.layers_per_block):
                h = self._block(
                    ResnetBlock2D,
                    out_ch,
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(h, temb)
                if has_attn:
                    h = self._block(
                        Transformer2D,
                        heads,
                        cfg.cross_attention_dim,
                        cfg.norm_num_groups,
                        dtype=self.dtype,
                        use_flash=self.use_flash,
                        name=f"down_{i}_attn_{j}",
                    )(h, context, encoder_attention_mask)
                skips.append(h)
            if i < len(ch) - 1:
                h = Downsample2D(out_ch, self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # ----- mid -----
        h = self._block(
            ResnetBlock2D,
            ch[-1],
            cfg.norm_num_groups,
            cfg.norm_eps,
            dtype=self.dtype,
            name="mid_resnet_0",
        )(h, temb)
        h = self._block(
            Transformer2D,
            heads,
            cfg.cross_attention_dim,
            cfg.norm_num_groups,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="mid_attn_0",
        )(h, context, encoder_attention_mask)
        h = self._block(
            ResnetBlock2D,
            ch[-1],
            cfg.norm_num_groups,
            cfg.norm_eps,
            dtype=self.dtype,
            name="mid_resnet_1",
        )(h, temb)

        # ----- up path -----
        rev = tuple(reversed(ch))
        for i in range(len(ch)):
            out_ch = rev[i]
            has_attn = cfg.cross_attn_up[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = self._block(
                    ResnetBlock2D,
                    out_ch,
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h, temb)
                if has_attn:
                    h = self._block(
                        Transformer2D,
                        heads,
                        cfg.cross_attention_dim,
                        cfg.norm_num_groups,
                        dtype=self.dtype,
                        use_flash=self.use_flash,
                        name=f"up_{i}_attn_{j}",
                    )(h, context, encoder_attention_mask)
            if i < len(ch) - 1:
                h = Upsample2D(out_ch, self.dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(
            cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=self.dtype, name="conv_norm_out"
        )(h)
        h = jax.nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h
