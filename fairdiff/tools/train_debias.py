"""Fairness-finetuning CLI — parity with the reference's
`accelerate launch 1-main-debias.py --config ...` entry points (all six
experiments through one binary; the experiment preset replaces the
per-experiment script forks).

Usage:
  python -m fairdiff.tools.train_debias --experiment exp1 \
      --model_dir /path/to/converted-sd15 --prompts_json occupation.json
  python -m fairdiff.tools.train_debias --experiment exp1 --tiny_smoke true \
      --max_train_steps 2          # CPU/CI smoke with synthetic guidance
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.io.adapters_io import save_adapters
from fairdiff.io.prompts import load_occupation_prompts
from fairdiff.io.tokenizer import load_tokenizer
from fairdiff.sampling.pipeline import SDConfig, StableDiffusion
from fairdiff.training.checkpoints import DualCadenceCheckpointer
from fairdiff.training.debias import DebiasConfig, DebiasTrainer
from fairdiff.training.logging import MetricsLogger
from fairdiff.training.presets import PRESETS
from fairdiff.training.synthetic import synthetic_stack
from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class TrainCLIConfig:
    # jax backend override: "cpu" (with num_cpu_devices for a virtual
    # mesh) or "" = default real-TPU backend
    platform: str = ""
    num_cpu_devices: int = 8
    # device mesh: mesh_data=1, mesh_model=1 (default) = single-program,
    # no mesh (the 1-chip case). mesh_data=0 = auto: all visible devices
    # divided by mesh_model. mesh_model>1 Megatron-shards attention/TE-MLP
    # over the "model" axis (fairdiff/parallel/tp.py); SD-1.5 allows
    # mesh_model in {1, 2, 4} (UNet 8 heads, TE 12).
    mesh_data: int = 1
    mesh_model: int = 1
    # multi-host SPMD: --distributed true calls jax.distributed.initialize
    # before device enumeration, so jax.device_count() spans every host's
    # chips and the ("data","model") mesh lays lanes across the full slice
    # (ICI within a slice, DCN across slices — handled by XLA, not us).
    # On TPU pods the coordinator/process args auto-detect from the TPU
    # runtime environment; set them explicitly only off-pod. The default
    # (false) is the single-host v4-8 target, where initialize() is
    # unnecessary — this replaces the reference's accelerate_config.yaml
    # launcher topology (SURVEY.md L0, exp-1:664-670).
    distributed: bool = False
    coordinator_address: str = ""
    num_processes: int = 0
    process_id: int = -1
    experiment: str = "exp1"
    # SD architecture preset: "sd15" (production) or "tiny" (fixture-scale
    # converted checkpoints — the real-weights-contract e2e path; unlike
    # tiny_smoke this loads model_dir/guidance_dir instead of synthetics)
    sd_config: str = "sd15"
    model_dir: str = ""
    tokenizer_dir: str = ""
    guidance_dir: str = ""  # converted detector/classifier/feat model params
    prompts_json: str = ""
    # exp-5 multi-domain mixing: comma-separated json list + repeats
    # (reference repeats x1/x6/x20/x4, exp-5:947)
    multi_prompts_json: str = ""
    multi_prompts_repeats: str = "1,6,20,4"
    output_dir: str = "outputs/debias"
    # optional YAML merged onto the experiment preset's DebiasConfig
    # (full-hyperparameter control, reference exp-1:632-638 semantics)
    debias_config: str = ""
    resume_from_checkpoint: bool = False
    use_wandb: bool = False
    tiny_smoke: bool = False
    seed: int = 42
    # frequent overrides (full control via --debias.* once nested configs land)
    max_train_steps: int = 0  # 0 => preset default
    train_images_per_prompt: int = 0
    train_micro_batch: int = 0
    eval_interval: int = 0
    checkpoint_tmp_every: int = 20
    checkpoint_perm_every: int = 200
    # >0: capture an xplane trace of the first N optimizer steps to
    # <output_dir>/trace (view in Perfetto/TensorBoard)
    profile_steps: int = 0


def build_trainer(cfg: TrainCLIConfig, *, abstract_params: bool = False):
    """abstract_params=True builds the frozen tree as ShapeDtypeStructs
    (jax.eval_shape) — for callers that only need parameter SHAPES (e.g.
    export_checkpoint's restore template), skipping minutes of full
    SD-1.5 random init whose values would be discarded."""
    preset = PRESETS[cfg.experiment]
    overrides = {"seed": cfg.seed, "output_dir": cfg.output_dir}
    for field in (
        "max_train_steps", "train_images_per_prompt", "train_micro_batch",
        "eval_interval",
    ):
        v = getattr(cfg, field)
        if v:
            overrides[field] = v
    dcfg: DebiasConfig = preset(**overrides)
    if cfg.debias_config:
        dcfg = cfglib.load_yaml(dcfg, cfg.debias_config)

    if cfg.tiny_smoke:
        sd = StableDiffusion(SDConfig.tiny())
        params = (
            jax.eval_shape(sd.init_params, jax.random.key(cfg.seed))
            if abstract_params
            else sd.init_params(jax.random.key(cfg.seed))
        )
        guidance = synthetic_stack(dcfg.attributes)
        dcfg = dataclasses.replace(
            dcfg, steps_low=2, steps_high=2, eval_denoising_steps=2,
            train_images_per_prompt=min(dcfg.train_images_per_prompt, 4),
            train_micro_batch=2, val_images_per_prompt=2, lora_rank=2,
        )
    else:
        arch = {"sd15": SDConfig.sd15, "tiny": SDConfig.tiny}[
            cfg.sd_config or "sd15"
        ]()
        sd = StableDiffusion(arch, remat=cfg.sd_config != "tiny")
        if abstract_params:
            params = jax.eval_shape(sd.init_params, jax.random.key(cfg.seed))
        elif cfg.model_dir:
            from fairdiff.io.checkpoints import load_sd_params

            params = load_sd_params(cfg.model_dir, cast=sd.config.dtype)
        else:
            print("[train] WARNING: no --model_dir; random-init SD weights")
            params = sd.init_params(jax.random.key(cfg.seed))
        if cfg.guidance_dir:
            from fairdiff.training.model_zoo import load_guidance_stack

            guidance = load_guidance_stack(cfg.guidance_dir, dcfg.attributes)
        else:
            print("[train] WARNING: no --guidance_dir; synthetic guidance")
            guidance = synthetic_stack(dcfg.attributes)

    mesh = None
    model_axis = max(cfg.mesh_model, 1)
    data_axis = cfg.mesh_data if cfg.mesh_data else (
        jax.device_count() // model_axis
    )
    if (data_axis > 1 or model_axis > 1) and not abstract_params:
        from fairdiff.parallel import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(data=data_axis, model=model_axis))
    trainer = DebiasTrainer(sd, params, guidance, dcfg, mesh=mesh)
    return sd, trainer, dcfg


def tokenize_prompts(sd, tokenizer, prompts: list[str]):
    max_len = min(tokenizer.model_max_length, sd.config.text.max_position_embeddings)
    out = []
    for p in prompts:
        c = tokenizer([p], padding="max_length", max_length=max_len)
        u = tokenizer([""], padding="max_length", max_length=max_len)
        out.append((jnp.asarray(c.input_ids), jnp.asarray(u.input_ids)))
    return out


def init_distributed(cfg: TrainCLIConfig) -> None:
    """Guarded multi-host bring-up: a no-op unless --distributed true.
    Must run before any other jax call (device enumeration is frozen at
    first use)."""
    if not cfg.distributed:
        return
    kwargs = {}
    if cfg.coordinator_address:
        kwargs["coordinator_address"] = cfg.coordinator_address
    if cfg.num_processes:
        kwargs["num_processes"] = cfg.num_processes
    if cfg.process_id >= 0:
        kwargs["process_id"] = cfg.process_id
    jax.distributed.initialize(**kwargs)
    print(
        f"[train] distributed: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )


def main(cfg: TrainCLIConfig):
    # platform override FIRST: init_distributed's post-init prints touch
    # jax.process_index()/device_count(), which freeze backend
    # enumeration — running it before apply_platform would silently
    # ignore --platform/--num_cpu_devices (an off-pod multi-process
    # smoke would never get its virtual CPU mesh). apply_platform is
    # pure jax.config updates, safe before distributed init.
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    init_distributed(cfg)
    sd, trainer, dcfg = build_trainer(cfg)
    tokenizer = load_tokenizer(cfg.tokenizer_dir or None)
    if cfg.tiny_smoke or cfg.sd_config == "tiny":
        tokenizer.vocab_size = sd.config.text.vocab_size
        tokenizer.bos_token_id = 0
        tokenizer.eos_token_id = sd.config.text.vocab_size - 1
        tokenizer.pad_token_id = sd.config.text.vocab_size - 1

    if cfg.multi_prompts_json:
        from fairdiff.io.prompts import load_multi_domain_prompts

        paths = cfg.multi_prompts_json.split(",")
        repeats = [int(r) for r in cfg.multi_prompts_repeats.split(",")]
        data = load_multi_domain_prompts(paths, repeats)
        train_prompts = data["train_prompts"]
        val_prompts = data.get("val_prompts") or train_prompts[:4]
    elif cfg.prompts_json:
        data = load_occupation_prompts(cfg.prompts_json)
        train_prompts = data["train_prompts"]
        val_prompts = data.get("val_prompts", train_prompts[:4])
    else:
        train_prompts = [
            "a photo of the face of a doctor, a person",
            "a photo of the face of a firefighter, a person",
        ]
        val_prompts = train_prompts[:1]

    train_ids = tokenize_prompts(sd, tokenizer, train_prompts)
    val_ids = tokenize_prompts(sd, tokenizer, val_prompts)

    logger = MetricsLogger(cfg.output_dir, use_wandb=cfg.use_wandb,
                           run_name=cfg.experiment,
                           config=cfglib.to_dict(dcfg))
    ckpt = DualCadenceCheckpointer(
        Path(cfg.output_dir) / "checkpoints",
        tmp_every=cfg.checkpoint_tmp_every,
        perm_every=cfg.checkpoint_perm_every,
    )
    trainer.logger = logger

    state = trainer.init_state(jax.random.key(cfg.seed))
    if cfg.resume_from_checkpoint and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"[train] resumed from step {state.step}")

    if cfg.profile_steps > 0:
        from fairdiff.utils.profiling import trace_to

        with trace_to(Path(cfg.output_dir) / "trace"):
            state = trainer.fit(
                state, train_ids,
                max_steps=state.step + cfg.profile_steps,
            )
        print(f"[train] trace written to {cfg.output_dir}/trace")

    state = trainer.fit(
        state, train_ids, val_prompt_ids=val_ids,
        checkpoint_cb=ckpt.maybe_save,
        val_prompt_texts=val_prompts,
    )
    ckpt.wait()

    # export adapters like 2-export-checkpoint.py (SURVEY.md §3.2)
    export_dir = Path(cfg.output_dir) / "exported"
    for name, tree in state.adapters.items():
        wrap = lambda t: t if isinstance(t, dict) else {"prefix": t}
        save_adapters(export_dir / f"{name}.npz", wrap(tree))
        save_adapters(export_dir / f"{name}_EMA.npz", wrap(state.ema[name]))
    print(f"[train] done at step {state.step}; adapters -> {export_dir}")
    logger.close()
    return state


if __name__ == "__main__":
    main(cfglib.cli_parse(TrainCLIConfig))
