"""Stable Diffusion sampling pipeline (pure functions over param pytrees).

The TPU-native equivalent of the reference's `generate_image_no_gradient` /
`generate_image_w_gradient` (exp-1-debias-gender/1-main-debias.py:998-1136)
and gen-images.py:112-175. One jitted function covers all four reference
sampling roles by closing over different parameter trees:

  phase 1: current adapters, no grad        (exp-1:1783)
  phase 3: frozen base, no grad             (exp-1:1840)
  phase 4: current adapters, grad_mode      (exp-1:1879)
  eval:    EMA adapters                     (exp-1:1659-1685)

CFG batching matches the reference ([uncond; cond] concat through one UNet
call, exp-1:1035-1052); prompt/uncond embeddings are computed once outside
the scan and reused by all steps.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fairdiff.adapters import lora as lora_lib
from fairdiff.adapters import prefix as prefix_lib
from fairdiff.models.autoencoder_kl import AutoencoderKL, VAEConfig
from fairdiff.models.clip_text import CLIPTextConfig, CLIPTextModel
from fairdiff.models.unet2d import UNet2DCondition, UNetConfig
from fairdiff.sampling import dpm_solver as dpm


def eos_attention_mask(input_ids: jax.Array, eos_token_id: int) -> jax.Array:
    """Reconstruct the tokenizer attention_mask from ids alone.

    CLIP pads with the eos token, so "valid through the FIRST eos" equals
    the HF tokenizer's attention_mask exactly. The reference threads that
    mask into the text encoder in every sampler (exp-1:1010-1027,
    :1076-1100); deriving it in-graph means every caller gets the masked
    semantics without plumbing extra arrays. Soft-prefix ids >= vocab_size
    (exp-2) never equal eos and correctly count as real tokens — which
    also fixes the mask for prefix-shifted sequences.
    """
    is_eos = input_ids == eos_token_id
    first = jnp.argmax(is_eos, axis=1)
    has = is_eos.any(axis=1)
    idx = jnp.arange(input_ids.shape[1])[None, :]
    valid = idx <= first[:, None]
    return jnp.where(has[:, None], valid, True).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class SDConfig:
    text: CLIPTextConfig = CLIPTextConfig.sd15()
    unet: UNetConfig = UNetConfig.sd15()
    vae: VAEConfig = VAEConfig.sd15()
    solver: dpm.DPMSolverConfig = dpm.DPMSolverConfig.sd15()
    guidance_scale: float = 7.5
    dtype: str = "bfloat16"  # compute dtype for the big models

    @classmethod
    def sd15(cls) -> "SDConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SDConfig":
        return cls(
            text=CLIPTextConfig(
                vocab_size=64,
                hidden_size=32,
                intermediate_size=64,
                num_hidden_layers=2,
                num_attention_heads=4,
                max_position_embeddings=16,
                eos_token_id=63,
            ),
            unet=UNetConfig.tiny(),
            vae=VAEConfig.tiny(),
            dtype="float32",
        )


class StableDiffusion:
    """Model bundle; all state lives in caller-owned param pytrees."""

    def __init__(self, config: SDConfig = SDConfig.sd15(), *,
                 use_flash: Optional[bool] = None, remat: bool = False):
        if use_flash is None:
            # Pallas kernels need a real TPU; measured 1.8x on the whole
            # UNet forward vs the XLA attention path (v5e, batch 4, 64x64)
            use_flash = jax.default_backend() == "tpu"
        self.config = config
        dtype = jnp.dtype(config.dtype)
        self.text_encoder = CLIPTextModel(config.text, dtype=dtype)
        self.unet = UNet2DCondition(
            config.unet, dtype=dtype, use_flash=use_flash, remat=remat
        )
        self.vae = AutoencoderKL(config.vae, dtype=dtype)
        self.schedule = dpm.make_schedule(config.solver)

    # -- init (random weights; real weights come from fairdiff.io loaders) --
    def init_params(self, key: jax.Array) -> dict:
        cfg = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        sample = self.latent_shape(1)
        ids = jnp.zeros((1, 4), jnp.int32)
        ctx = jnp.zeros((1, 4, cfg.unet.cross_attention_dim))
        img = jnp.zeros((1, sample[1] * 8, sample[2] * 8, 3))
        return {
            "text_encoder": self.text_encoder.init(k1, ids)["params"],
            "unet": self.unet.init(k2, jnp.zeros(sample), jnp.array([0]), ctx)["params"],
            "vae": self.vae.init(k3, img)["params"],
        }

    def latent_shape(self, batch: int) -> tuple[int, int, int, int]:
        s = self.config.unet.sample_size
        return (batch, s, s, self.config.unet.in_channels)

    # -- building blocks ---------------------------------------------------
    def encode_prompt(
        self,
        te_params: Any,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        prefix_table: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Prompt -> encoder hidden states. With a soft-prefix table, ids >=
        vocab_size select trainable rows (exp-2 path). attention_mask=None
        derives the mask from the ids (reference parity, exp-1:1076-1080);
        pass an explicit mask only to override."""
        if attention_mask is None:
            attention_mask = eos_attention_mask(
                input_ids, self.config.text.eos_token_id
            )
        inputs_embeds = None
        if prefix_table is not None:
            inputs_embeds = prefix_lib.splice_prefix_embeds(
                te_params["token_embedding"]["embedding"], prefix_table, input_ids
            )
            # pooling/causal shapes still come from clipped ids
            input_ids = jnp.minimum(input_ids, self.config.text.vocab_size - 1)
        out = self.text_encoder.apply(
            {"params": te_params},
            input_ids,
            attention_mask=attention_mask,
            inputs_embeds=inputs_embeds,
        )
        return out["last_hidden_state"]

    def build_context(
        self,
        params: dict,
        cond_ids: jax.Array,  # [1 or N, S]
        uncond_ids: jax.Array,
        N: int,
        *,
        cond_mask: Optional[jax.Array] = None,
        uncond_mask: Optional[jax.Array] = None,
        te_lora: Optional[Any] = None,
        prefix_table: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        """-> (context [2N, S, D], key mask [2N, S]) in reference CFG order
        [uncond; cond] (exp-1:1035), broadcast to the lane count. The key
        mask feeds the UNet cross-attention so pad positions are excluded
        exactly as in the reference's compact-length contexts."""
        eos = self.config.text.eos_token_id
        if cond_mask is None:
            cond_mask = eos_attention_mask(cond_ids, eos)
        if uncond_mask is None:
            uncond_mask = eos_attention_mask(uncond_ids, eos)
        te_params = params["text_encoder"]
        if te_lora is not None:
            te_params = lora_lib.apply_lora(te_params, te_lora)
        cond = self.encode_prompt(te_params, cond_ids, cond_mask, prefix_table)
        uncond = self.encode_prompt(te_params, uncond_ids, uncond_mask)
        bcast = lambda x: (
            jnp.broadcast_to(x, (N,) + x.shape[1:]) if x.shape[0] == 1 else x
        )
        context = jnp.concatenate([bcast(uncond), bcast(cond)], axis=0)
        key_mask = jnp.concatenate(
            [bcast(uncond_mask), bcast(cond_mask)], axis=0
        )
        return context, key_mask

    def unet_eps(
        self,
        params: dict,
        lat2: jax.Array,  # [2B, h, w, 4] CFG-doubled
        t: jax.Array,  # scalar or [2B]
        context: jax.Array,  # [2B, S, D]
        key_mask: Optional[jax.Array] = None,  # [2B, S]
        *,
        unet_lora: Optional[Any] = None,
    ) -> jax.Array:
        unet_params = params["unet"]
        if unet_lora is not None:
            unet_params = lora_lib.apply_lora(unet_params, unet_lora)
        return self.unet.apply({"params": unet_params}, lat2, t, context, key_mask)

    def decode_images(
        self, params: dict, latents: jax.Array, *, grad_mode: bool = False
    ) -> jax.Array:
        """Final latents -> images in [-1, 1], NHWC (exp-1:1060 clamp)."""
        latents = latents / self.config.vae.scaling_factor
        N = latents.shape[0]

        def decode(vae_params, lat):
            return self.vae.apply({"params": vae_params}, lat, method=self.vae.decode)

        if grad_mode:
            # grad-checkpoint the decoder like the reference's
            # vae.enable_gradient_checkpointing (exp-1:748-749), and decode
            # per-image under lax.map: the decoder's full-resolution
            # GroupNorm temps dominate grad-pass HBM, and images are
            # independent, so peak memory becomes one image's worth while
            # spatial dims keep the MXU busy.
            decode1 = jax.checkpoint(
                lambda lat1: decode(params["vae"], lat1[None])[0]
            )
            images = jax.lax.map(decode1, latents)
        else:
            # decode in chunks: a single batch-N decode holds ~N x 0.55G of
            # full-resolution decoder temps (13.6G of the 16G HBM at N=24 —
            # the phase-1 OOM edge); chunks of 8 bound the arena at ~4.5G
            # with negligible serialization cost at 512^2 spatial dims.
            chunk = next(c for c in (8, 6, 4, 3, 2, 1) if N % c == 0)
            images = jax.lax.map(
                lambda lc: decode(params["vae"], lc),
                latents.reshape((N // chunk, chunk) + latents.shape[1:]),
            )
            images = images.reshape((N,) + images.shape[2:])
        return jnp.clip(images.astype(jnp.float32), -1.0, 1.0)

    def generate(
        self,
        params: dict,
        noises: jax.Array,  # [N, h, w, 4]
        cond_ids: jax.Array,  # [1 or N, S]
        uncond_ids: jax.Array,
        num_steps: int,
        *,
        cond_mask: Optional[jax.Array] = None,
        uncond_mask: Optional[jax.Array] = None,
        unet_lora: Optional[Any] = None,
        te_lora: Optional[Any] = None,
        prefix_table: Optional[jax.Array] = None,
        grad_mode: bool = False,
        guidance_scale: Optional[float] = None,
        return_latents: bool = False,
    ):
        """Full chain: encode -> denoise (scan) -> decode. Returns images in
        [-1, 1], NHWC (reference clamp at exp-1:1060).

        return_latents=True additionally returns (final_latents, trajectory)
        where trajectory is the [T, N, h, w, 4] stack of per-step UNet-input
        latents — the state the linearized phase-4 backward resumes from
        (training/debias.py)."""
        cfg = self.config
        N = noises.shape[0]
        gs = cfg.guidance_scale if guidance_scale is None else guidance_scale

        context, key_mask = self.build_context(
            params, cond_ids, uncond_ids, N,
            cond_mask=cond_mask, uncond_mask=uncond_mask,
            te_lora=te_lora, prefix_table=prefix_table,
        )
        unet_params = params["unet"]
        if unet_lora is not None:
            unet_params = lora_lib.apply_lora(unet_params, unet_lora)

        bundle = dpm.make_step_bundle(cfg.solver, self.schedule, num_steps)

        def eps_fn(lat2, t):
            return self.unet.apply(
                {"params": unet_params}, lat2, t, context, key_mask
            )

        out = dpm.denoise(
            eps_fn, noises, bundle, guidance_scale=gs, grad_mode=grad_mode,
            return_trajectory=return_latents,
        )
        latents, traj = out if return_latents else (out, None)
        images = self.decode_images(params, latents, grad_mode=grad_mode)
        if return_latents:
            return images, latents, traj
        return images
