"""Batch image generation CLI — parity with the reference's gen-images.py.

Reference behavior reproduced (gen-images.py):
  - deterministic per-(prompt, image-index) noise bank (:546-557) — here via
    stable blake2 hashing instead of Python's per-process `hash`
  - optional adapters: TE-LoRA (:493-497), UNet-LoRA (:499-521), soft
    prefix (:523-538)
  - skip-existing resume (:564-571); saves `prompt_i/img_j.jpg` (:610-612)
  - defaults: 30 denoise steps, batch 10, guidance 7.5 (:425-441)

TPU-native: one jitted generate() covers the batch; with multiple chips the
batch axis shards over the data mesh (the reference is single-GPU here).

Usage:
  python -m fairdiff.tools.gen_images --config cfg.yaml
  python -m fairdiff.tools.gen_images --tiny_smoke 1 --save_dir /tmp/out \
      --prompts_json '' --num_imgs_per_prompt 2 --batch_size 2 --num_denoising_steps 2
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.adapters import lora as lora_lib
from fairdiff.io.adapters_io import load_adapters
from fairdiff.io.images import save_image
from fairdiff.io.tokenizer import load_tokenizer
from fairdiff.sampling.pipeline import SDConfig, StableDiffusion
from fairdiff.utils import config as cfglib
from fairdiff.utils.rng import prompt_noise_key, root_key


@dataclasses.dataclass(frozen=True)
class GenImagesConfig:
    # jax backend override: "cpu" (with num_cpu_devices for a virtual
    # mesh) or "" = default real-TPU backend
    platform: str = ""
    num_cpu_devices: int = 8
    # model/weights
    model_dir: str = ""  # converted SD-1.5 params dir ('' => random init)
    tokenizer_dir: str = ""
    load_text_encoder_lora_from: str = ""
    load_unet_lora_from: str = ""
    load_prefix_embedding_from: str = ""
    num_prefix_tokens: int = 5
    # prompts
    prompts_json: str = ""
    prompts_key: str = "test_prompts"
    prompt: str = "a photo of the face of a firefighter, a person"
    # generation (reference defaults, gen-images.py:425-441)
    num_imgs_per_prompt: int = 60
    batch_size: int = 10
    num_denoising_steps: int = 30
    guidance_scale: float = 7.5
    random_seed: int = 42
    save_dir: str = "outputs/gen-images"
    # harness
    tiny_smoke: bool = False  # tiny random model for CI / smoke tests


def _load_params(sd: StableDiffusion, cfg: GenImagesConfig):
    if cfg.model_dir:
        from fairdiff.io.checkpoints import load_sd_params

        return load_sd_params(cfg.model_dir)
    return sd.init_params(root_key(cfg.random_seed))


def main(cfg: GenImagesConfig) -> list[Path]:
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    sd_cfg = SDConfig.tiny() if cfg.tiny_smoke else SDConfig.sd15()
    sd = StableDiffusion(sd_cfg, remat=False)
    params = _load_params(sd, cfg)
    tokenizer = load_tokenizer(cfg.tokenizer_dir or None)
    if cfg.tiny_smoke:
        tokenizer.vocab_size = sd_cfg.text.vocab_size
        tokenizer.bos_token_id = 0
        tokenizer.eos_token_id = sd_cfg.text.vocab_size - 1
        tokenizer.pad_token_id = sd_cfg.text.vocab_size - 1

    # .pth files are the REFERENCE's exported adapters
    # (2-export-checkpoint.py output) — directly loadable here
    def _load(path, kind):
        if str(path).endswith((".pth", ".pt", ".bin")):
            from fairdiff.io import reference_adapters as ra

            got_kind, tree = ra.load_reference_adapters(path)
            if got_kind != kind:
                raise ValueError(
                    f"{path}: contains {got_kind}, expected {kind}"
                )
            return tree
        return load_adapters(path)

    unet_lora = te_lora = prefix_table = None
    if cfg.load_unet_lora_from:
        unet_lora = _load(cfg.load_unet_lora_from, "unet_lora")
    if cfg.load_text_encoder_lora_from:
        te_lora = _load(cfg.load_text_encoder_lora_from, "te_lora")
    if cfg.load_prefix_embedding_from:
        p = cfg.load_prefix_embedding_from
        if str(p).endswith((".pth", ".pt", ".bin")):
            from fairdiff.io import reference_adapters as ra

            prefix_table = jnp.asarray(ra.load_reference_prefix(p))
        else:
            prefix_table = jnp.asarray(load_adapters(p)["prefix"])

    if cfg.prompts_json:
        with open(cfg.prompts_json) as f:
            prompts = json.load(f)[cfg.prompts_key]
    else:
        prompts = [cfg.prompt]

    max_len = min(tokenizer.model_max_length, sd_cfg.text.max_position_embeddings)
    root = root_key(cfg.random_seed)
    save_root = Path(cfg.save_dir)

    # masks are derived in-graph from the ids (pipeline.eos_attention_mask)
    # — also correct for prefix-shifted sequences, where the tokenizer's
    # pre-prefix mask would be stale (reference exp-2 gen-images.py:89-109)
    @jax.jit
    def generate(p, noises, cond_ids, uncond_ids, ul, tl, pt):
        return sd.generate(
            p, noises, cond_ids, uncond_ids,
            cfg.num_denoising_steps,
            unet_lora=ul, te_lora=tl, prefix_table=pt,
            guidance_scale=cfg.guidance_scale,
        )

    written: list[Path] = []
    for pi, prompt in enumerate(prompts):
        prompt_dir = save_root / f"prompt_{pi}"
        todo = [
            j
            for j in range(cfg.num_imgs_per_prompt)
            if not (prompt_dir / f"img_{j}.jpg").exists()  # resume (:564-571)
        ]
        if not todo:
            continue
        tok_c = tokenizer([prompt], padding="max_length", max_length=max_len)
        tok_u = tokenizer([""], padding="max_length", max_length=max_len)
        if prefix_table is not None:
            from fairdiff.adapters.prefix import prepend_prefix_ids

            ids = jnp.asarray(tok_c.input_ids)
            ids = prepend_prefix_ids(
                ids, cfg.num_prefix_tokens, sd_cfg.text.vocab_size, max_len
            )
            if not dataclasses.is_dataclass(tok_c):
                # never fall through silently: a tokenizer returning a
                # non-dataclass here would drop the prefix ids and
                # generate with the UNPREFIXED prompt while claiming to
                # use the loaded prefix table
                raise TypeError(
                    f"tokenizer returned {type(tok_c).__name__}; prefix "
                    "injection requires the Tokenized dataclass"
                )
            tok_c = dataclasses.replace(tok_c, input_ids=np.asarray(ids))

        t0 = time.time()
        for start in range(0, len(todo), cfg.batch_size):
            chunk = todo[start : start + cfg.batch_size]
            noises = jnp.stack(
                [
                    jax.random.normal(
                        prompt_noise_key(root, prompt, j), sd.latent_shape(1)[1:]
                    )
                    for j in chunk
                ]
            )
            imgs = generate(
                params, noises,
                jnp.asarray(tok_c.input_ids), jnp.asarray(tok_u.input_ids),
                unet_lora, te_lora, prefix_table,
            )
            imgs = np.asarray(imgs)
            for j, img in zip(chunk, imgs):
                out = prompt_dir / f"img_{j}.jpg"
                save_image(img, out)
                written.append(out)
        dt = time.time() - t0
        print(
            f"[gen-images] prompt {pi}: {len(todo)} imgs in {dt:.1f}s "
            f"({len(todo)/dt:.2f} img/s) -> {prompt_dir}"
        )
    return written


if __name__ == "__main__":
    main(cfglib.cli_parse(GenImagesConfig))
