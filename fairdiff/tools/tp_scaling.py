"""TP memory-scaling evidence: numbers behind parallel/tp.py's claim.

parallel/tp.py argues the ("data","model") mesh's model axis divides the
per-chip *activation* footprint, scaling the differentiable-sampling
micro-batch past one 16G HBM (the reference never needed this — its 2-GPU
DP setup trains tiny LoRA trees; SURVEY.md §2.5). This tool turns that
claim into measurements. The memory-critical program is the linearized
phase-4 pair-VJP: a single-step UNet VJP over p lanes at CFG batch 2p
(training/debias.py; PERF.md: p=8 fits on one v5e, p=12 is
RESOURCE_EXHAUSTED). Everything here is AOT — `.lower().compile()` +
`memory_analysis()` — nothing executes, so it runs anywhere:

  --mode unet_vjp   (CPU virtual mesh, default): compile the UNet
      step-VJP under ("data","model") meshes for model in {1,2} x the
      requested lane counts; report per-device argument/temp bytes. The
      sharded-shape arithmetic GSPMD applies is target-independent even
      though XLA:CPU fusion details differ from TPU.
  --mode trainer_pair  (real TPU): compile the EXACT production pair-VJP
      via DebiasTrainer.aot_jobs(pair_lanes=p) for each p; report HBM
      temp/argument bytes -> the per-lane activation slope and which p
      fits under a given HBM budget. Lane counts that do not divide
      train_images_per_prompt are skipped (recorded as a "skipped" row);
      for divisors, XLA reports the bytes even for programs that would
      not fit, so an over-HBM point like p=12 is measurable without an
      OOM crash.

  python -m fairdiff.tools.tp_scaling --platform cpu             # CPU sweep
  python -m fairdiff.tools.tp_scaling --mode trainer_pair        # on-TPU

Results are recorded in PERF.md ("TP scaling evidence").
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from fairdiff.utils import config as cfglib


@dataclasses.dataclass(frozen=True)
class TPScalingConfig:
    platform: str = ""  # "cpu" -> virtual device mesh
    num_cpu_devices: int = 8
    mode: str = "unet_vjp"  # unet_vjp | trainer_pair
    # divisors of the production train_images_per_prompt=24 so every
    # default lane count is measurable in trainer_pair mode (8 fits one
    # v5e, 12 is the known over-HBM point — PERF.md)
    lanes: tuple[int, ...] = (4, 8, 12)
    model_axes: tuple[int, ...] = (1, 2)
    tiny: bool = False  # tiny SD config (smoke/tests)
    lora_rank: int = 50
    hbm_budget_gb: float = 16.0  # v5e
    json_out: str = ""  # optional results file


def _gb(n: int) -> float:
    return round(n / 2**30, 3)


def _build_sd(cfg: TPScalingConfig):
    from fairdiff.sampling.pipeline import SDConfig, StableDiffusion

    sdc = SDConfig.tiny() if cfg.tiny else SDConfig.sd15()
    # flash off: the CPU sweep can't run Pallas; for the byte arithmetic
    # the XLA attention path is the conservative (larger-buffer) choice
    return StableDiffusion(sdc, use_flash=False)


def _sds_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), tree
    )


def unet_vjp_sweep(cfg: TPScalingConfig) -> list[dict]:
    """Per-device memory of the one-step UNet VJP across mesh layouts."""
    from fairdiff.adapters import lora as lora_lib
    from fairdiff.parallel import MeshConfig, create_mesh
    from fairdiff.parallel.tp import unet_param_specs
    from jax.sharding import NamedSharding, PartitionSpec as P

    sd = _build_sd(cfg)
    sdc = sd.config
    # shapes only — params never materialize
    params_sds = jax.eval_shape(sd.init_params, jax.random.key(0))
    unet_sds = params_sds["unet"]
    lora_sds = _sds_tree(
        jax.eval_shape(
            lambda k: lora_lib.init_lora(
                jax.tree_util.tree_map(jnp.zeros_like, unet_sds),
                lora_lib.unet_attention_targets, cfg.lora_rank, k,
            ),
            jax.random.key(1),
        )
    )
    s = sdc.unet.sample_size
    S, D = 16 if cfg.tiny else 77, sdc.unet.cross_attention_dim
    rows = []
    n_dev = jax.device_count()
    for m_ax in cfg.model_axes:
        mesh = create_mesh(MeshConfig(data=n_dev // m_ax, model=m_ax))
        u_specs = unet_param_specs(unet_sds, m_ax, sdc.unet.attention_head_dim)
        sh = lambda spec: NamedSharding(mesh, spec)
        u_shardings = jax.tree_util.tree_map(sh, u_specs)
        repl = lambda tree: jax.tree_util.tree_map(lambda _: sh(P()), tree)

        def step_eps(unet_params, lora, lat2, ctx):
            # the pair-VJP body: one CFG-doubled UNet application with
            # LoRA merged (training/debias.py pair program)
            merged = lora_lib.apply_lora(unet_params, lora)
            return sd.unet.apply(
                {"params": merged}, lat2, jnp.full((lat2.shape[0],), 501), ctx
            )

        def vjp_all(unet_params, lora, lat2, ctx, cot):
            out, pull = jax.vjp(
                lambda l, x, c: step_eps(unet_params, l, x, c), lora, lat2, ctx
            )
            return pull(cot)

        for p in cfg.lanes:
            b = 2 * p  # CFG doubling
            lat2 = jax.ShapeDtypeStruct((b, s, s, 4), jnp.float32)
            ctx = jax.ShapeDtypeStruct((b, S, D), jnp.float32)
            # cotangent dtype must match the model's output dtype (bf16
            # UNet -> bf16 eps); derive it instead of assuming f32
            out_sds = jax.eval_shape(step_eps, unet_sds, lora_sds, lat2, ctx)
            cot = jax.ShapeDtypeStruct(out_sds.shape, out_sds.dtype)
            batch_sh = sh(P("data"))
            jitted = jax.jit(
                vjp_all,
                in_shardings=(
                    u_shardings, repl(lora_sds),
                    batch_sh, batch_sh, batch_sh,
                ),
            )
            t0 = time.time()
            compiled = jitted.lower(
                unet_sds, lora_sds, lat2, ctx, cot
            ).compile()
            ma = compiled.memory_analysis()
            rows.append({
                "mode": "unet_vjp",
                "mesh": f"data={n_dev // m_ax} model={m_ax}",
                "lanes": p,
                "arg_gb": _gb(ma.argument_size_in_bytes),
                "temp_gb": _gb(ma.temp_size_in_bytes),
                "out_gb": _gb(ma.output_size_in_bytes),
                "compile_s": round(time.time() - t0, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
    return rows


def trainer_pair_sweep(cfg: TPScalingConfig) -> list[dict]:
    """HBM bytes of the production pair-VJP at several lane counts."""
    import sys

    sys.argv = [sys.argv[0]]  # keep bench.build from eating our flags
    import bench

    from fairdiff.training.debias import DebiasTrainer

    sd, params, guidance, dcfg = bench.build(cfg.tiny)
    trainer = DebiasTrainer(sd, params, guidance, dcfg)
    state = trainer.init_state(jax.random.key(1))
    v = sd.config.text.vocab_size
    S = sd.config.text.max_position_embeddings
    cond = jnp.full((1, S), v - 1, jnp.int32).at[0, 0].set(0)
    uncond = jnp.full((1, S), v - 1, jnp.int32).at[0, 0].set(0)
    rows = []
    n_lanes = dcfg.train_images_per_prompt
    for p in cfg.lanes:
        if p <= 0 or n_lanes % p:
            # aot_jobs silently resets a non-divisor p to the default,
            # which would duplicate an earlier row (measured: p=16 -> p=8).
            # The skip is RECORDED in rows (not just stdout) so a
            # --json_out file shows the lane was requested-and-skipped;
            # downstream consumers filter on the presence of "temp_gb".
            rows.append({
                "mode": "trainer_pair", "lanes": p,
                "skipped": f"{p} does not divide {n_lanes} total lanes",
            })
            print(json.dumps(rows[-1]), flush=True)
            continue
        dict_jobs = {
            name: (prog, args)
            for name, prog, args in trainer.aot_jobs(
                state, (cond, uncond), pair_lanes=p
            )
        }
        prog, args = dict_jobs["pair_grad"]
        t0 = time.time()
        ma = prog.jitted.lower(*args).compile().memory_analysis()
        total = ma.argument_size_in_bytes + ma.temp_size_in_bytes
        rows.append({
            "mode": "trainer_pair",
            "lanes": p,
            "arg_gb": _gb(ma.argument_size_in_bytes),
            "temp_gb": _gb(ma.temp_size_in_bytes),
            "total_gb": _gb(total),
            "fits_hbm": total <= cfg.hbm_budget_gb * 2**30,
            "compile_s": round(time.time() - t0, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    measured = [r for r in rows if "temp_gb" in r]
    if len(measured) < 2:
        print(json.dumps({
            "mode": "trainer_pair_fit",
            "skipped": f"need >=2 measured lane counts for the slope fit, "
                       f"got {len(measured)} (skipped rows excluded)",
        }), flush=True)
    else:
        # per-lane slope from the first/last points (arguments are
        # lane-independent frozen weights; temps scale with lanes)
        a, b = measured[0], measured[-1]
        slope = (b["temp_gb"] - a["temp_gb"]) / (b["lanes"] - a["lanes"])
        fixed = a["temp_gb"] - slope * a["lanes"] + a["arg_gb"]
        print(json.dumps({
            "mode": "trainer_pair_fit",
            "gb_per_lane": round(slope, 3),
            "fixed_gb": round(fixed, 3),
            "max_lanes_1chip": int(
                (cfg.hbm_budget_gb - fixed) // max(slope, 1e-9)
            ),
            # data-axis scaling: lanes are embarrassingly parallel, so
            # n chips carry n x max_lanes_1chip. A TP=2 projection is
            # deliberately NOT printed: the unet_vjp CPU sweep measured
            # that model=2 does not shrink per-device temps (the binding
            # conv/GN hiddens are batch-dim'd and replicate under
            # "model") — see PERF.md "TP scaling evidence".
            "max_lanes_2chip_dp": 2 * int(
                (cfg.hbm_budget_gb - fixed) // max(slope, 1e-9)
            ),
        }), flush=True)
    return rows


def main(cfg: TPScalingConfig):
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)
    rows = (
        unet_vjp_sweep(cfg) if cfg.mode == "unet_vjp"
        else trainer_pair_sweep(cfg)
    )
    if cfg.json_out:
        with open(cfg.json_out, "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    main(cfglib.cli_parse(TPScalingConfig))
