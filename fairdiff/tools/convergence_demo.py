"""Bias-convergence demo on the synthetic stack — no model assets needed.

The reference demonstrates bias convergence only with real SD-1.5 weights
(the wandb curves in exp-1-debias-gender/README.md, train_gender_gap
falling toward 0 over ~2k steps). Real checkpoints cannot exist in a
zero-egress environment, so this CLI produces the in-env analogue: the
FULL 4-phase loop (sample -> detect/classify -> dynamic targets ->
linearized differentiable-sampling backward -> AdamW+EMA) on the tiny
CPU stack, driving |gender_gap| from its degenerate 1.0 start toward the
0.5/0.5 target. A sign error anywhere in the gradient chain (eps
cotangents, grad rescale, dynamic weights, OT targets) shows up here as
a flat or rising curve.

  python -m fairdiff.tools.convergence_demo --steps 120 \\
      --output_dir outputs/convergence

Renders the same wandb-parity panels as tools/plot_curves afterwards
(train_loss_fair, gender_gap, ...). The 20-step assertion version of
this run is tests/test_trainer.py::test_bias_convergence_end_to_end.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from fairdiff.utils import config as cfglib


@dataclass
class DemoConfig:
    # "exp1": rank/binomial gender targets (the r2 committed run);
    # "exp3": gender x race sampled-OT joint targets — the OT-path
    # convergence evidence (exp-3-debias-gender-race/1-main-debias.py:
    # 1460-1569 target math, :2077-2150 joint loss);
    # "exp6": race-only enumerated-multinomial OT
    # (exp-6-debias-race/1-main-debias.py:1414-1482);
    # "exp4": gender x race x age 3-attr sampled OT with the asymmetric
    # 75/25 age target (exp-4-debias-gender-race-age:1478-1620)
    experiment: str = "exp1"
    steps: int = 120
    learning_rate: float = 2e-3  # tiny models need a larger lr to move
    # 0 = auto: 8 lanes for exp1 (the pinned regression dynamics), 16
    # for exp3 — a 16-lane batch over 8 joint classes gives the sampled
    # OT enough room that a useful fraction of race targets clears the
    # production uncertainty gate (at 8 lanes the assignment is
    # near-degenerate and most targets gate to -1; measured r5)
    train_images_per_prompt: int = 0
    train_micro_batch: int = 4
    ot_num_samples: int = 50  # exp3 demo: draws per step (prod preset: 200)
    # NOTE: random-init tiny models have arbitrary per-seed dynamics — some
    # inits start so saturated that 120 steps can't flip a prediction (the
    # fairness loss still falls). seed=0 is the init the 20-step regression
    # test (test_bias_convergence_end_to_end) pins; real-weight runs do not
    # share this sensitivity (the reference converges from the one SD-1.5
    # init it has).
    seed: int = 0
    output_dir: str = "outputs/convergence"
    platform: str = "cpu"
    num_cpu_devices: int = 0
    plot: bool = True


def main(cfg: DemoConfig) -> None:
    cfglib.apply_platform(cfg.platform, cfg.num_cpu_devices)

    import jax.numpy as jnp  # noqa: F401  (after platform selection)

    from fairdiff.sampling.pipeline import SDConfig, StableDiffusion
    from fairdiff.training.debias import DebiasConfig, DebiasTrainer
    from fairdiff.training.logging import MetricsLogger
    from fairdiff.training.synthetic import synthetic_stack

    sd = StableDiffusion(SDConfig.tiny())
    params = sd.init_params(jax.random.key(cfg.seed))
    lanes = cfg.train_images_per_prompt or {
        "exp3": 16, "exp6": 16, "exp4": 24,
    }.get(cfg.experiment, 8)
    common = dict(
        train_text_encoder=True,
        lora_rank=2,
        learning_rate=cfg.learning_rate,
        train_images_per_prompt=lanes,
        train_micro_batch=cfg.train_micro_batch,
        steps_low=2,
        steps_high=2,
        eval_interval=0,
        max_train_steps=cfg.steps,
        output_dir=cfg.output_dir,
        seed=cfg.seed,
    )
    if cfg.experiment == "exp3":
        # the exp-3 preset's objective shape at demo scale: joint
        # gender x race sampled-OT targets, per-attr factors, joint loss
        dcfg = DebiasConfig(
            attributes=("gender", "race"),
            target_kind="ot2",
            factor1=(0.2, 0.6),
            factor2=(0.2, 0.3),
            uncertainty_thresholds=(0.2, 0.2),
            no_face_img_weight_one=False,
            face_search_all_lanes=True,
            ot_num_samples=cfg.ot_num_samples,
            weight_loss_img=8.0,
            weight_loss_face=0.1,
            **common,
        )
        gap_key = "gender_race_gap"
    elif cfg.experiment == "exp4":
        # 24 lanes over the 16 joint classes: the exp-3 batch-size
        # lesson (8 lanes over 8 classes is assignment-degenerate)
        # applied to the 2x4x2 joint
        dcfg = DebiasConfig(
            attributes=("gender", "race", "age"),
            target_kind="ot3",
            factor1=(0.2, 0.6, 0.6),
            factor2=(0.2, 0.3, 0.3),
            uncertainty_thresholds=(0.2, 0.2, 0.2),
            no_face_img_weight_one=False,
            face_search_all_lanes=True,
            ot_num_samples=cfg.ot_num_samples,
            weight_loss_img=8.0,
            weight_loss_face=0.1,
            **common,
        )
        gap_key = "age_gap"
    elif cfg.experiment == "exp6":
        dcfg = DebiasConfig(
            attributes=("race",),
            target_kind="enum",
            factor1=(0.6,),
            factor2=(0.3,),
            uncertainty_thresholds=(0.2,),
            no_face_img_weight_one=False,
            face_search_all_lanes=True,
            weight_loss_img=6.0,
            weight_loss_face=0.1,
            **common,
        )
        gap_key = "race_gap"
    elif cfg.experiment == "exp1":
        dcfg = DebiasConfig(**common)
        gap_key = "gender_gap_abs"
    else:
        # fail loud: a typo must not silently produce an exp1 run
        # labeled as the asked-for experiment
        raise SystemExit(
            f"unknown --experiment {cfg.experiment!r} "
            "(choose exp1, exp3, exp4, exp6)"
        )
    trainer = DebiasTrainer(sd, params, synthetic_stack(dcfg.attributes), dcfg)
    logger = MetricsLogger(cfg.output_dir)
    state = trainer.init_state(jax.random.key(1))
    # one fixed prompt, as in the trainer integration tests
    cond = jnp.asarray([[0, 5, 6, 63]], jnp.int32)
    uncond = jnp.asarray([[0, 63, 1, 1]], jnp.int32)
    root = jax.random.key(7)
    for step in range(cfg.steps):
        state, logs = trainer.train_step(
            state, (cond, uncond), jax.random.fold_in(root, step)
        )
        logger(step, logs)
        if step % 10 == 0 or step == cfg.steps - 1:
            print(
                f"[convergence] step {step}: {gap_key}="
                f"{logs[gap_key]:.3f} "
                f"loss_fair={logs.get('train_loss_fair', float('nan')):.4f}",
                flush=True,
            )
    logger.close()

    if cfg.plot:
        from fairdiff.tools.plot_curves import PlotConfig
        from fairdiff.tools.plot_curves import main as plot_main

        plot_main(
            PlotConfig(
                runs=f"synthetic={cfg.output_dir}/metrics.jsonl",
                save_dir=f"{cfg.output_dir}/curves",
            )
        )


if __name__ == "__main__":
    main(cfglib.cli_parse(DemoConfig))
