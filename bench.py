"""Benchmark: exp-1 fairness-finetune optimizer step on real hardware.

A plain `python bench.py` prints TWO JSON lines — the primary train metric
first, then the 50-step generation metric (both BASELINE.json north stars):
  {"metric": "exp1_train_step_chip_seconds", "value": <s>, "unit": "chip*s/step",
   "vs_baseline": <ratio>}
  {"metric": "gen_images_per_sec_50step_dpm", "value": <i/s>, ...}
Use --train-only / --gen to run just one.

Baseline: the reference's implied ~22 s/optimizer-step on 2x A100-40GB for
the exp-1 workload (global batch 24, micro-batch 3-4, 19-23 denoise steps;
BASELINE.md) == 44 chip-seconds/step. vs_baseline = 44 / ours (>1 == we are
faster per chip).

The benchmarked step is the full production program: 19-step sampling x2
(phases 1 & 3), host-side dynamic-target OT, micro-batched differentiable
sampling chain with LoRA gradients (phase 4), finite-gate AdamW + EMA —
with the real-architecture guidance stack (FaceDetectorNet, MobileNetV3,
CLIP-ViT-H, DINOv2, SFNet-20) running batched on-device with random
weights (weights don't change the math cost).

  python bench.py            # full SD-1.5 (first run compiles ~minutes)
  python bench.py --quick    # tiny config sanity run
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def fill_tree(sds_tree, value: float = 0.02, bf16: bool = False):
    """Materialize a param tree of filled arrays on device in ONE tiny
    compiled program (broadcasts only — compiles in seconds, ships no data
    through the tunnel).

    The bench runs the guidance/SD models at random weights anyway (weights
    don't change the math cost); flax `.init()` of the billion-param zoo is
    the WRONG way to get them on this remote backend: each init is its own
    giant RNG-generation HLO whose remote compile takes minutes — measured
    ~23 min of `build()` wall before round 3 replaced it with this
    (the actual round-2 bench-timeout dominator, bigger than the train
    programs themselves).

    Fill scheme: matrix-like leaves (kernels/embeddings, ndim>=2) get ZERO,
    vector/scalar leaves (biases, norm scales) get a small constant. A
    uniform nonzero fill explodes: a 3x3x320 conv at weight 0.02 multiplies
    activation magnitude ~57x per layer -> inf -> GroupNorm emits NaN ->
    NaN images -> zero detections (measured: loss=nan, face_rate=0.0).
    With zero kernels every layer's output equals its (nonzero) bias, so
    activations stay bounded and finite end-to-end. The executed program
    and its cost are identical — TPU dense ops have no value-dependent
    fast paths, and these are runtime jit arguments XLA cannot fold.
    """
    def mk(s):
        dt = s.dtype
        if bf16 and dt == jnp.float32:
            dt = jnp.bfloat16
        if not jnp.issubdtype(dt, jnp.floating):
            return jnp.zeros(s.shape, dt)
        if s.ndim >= 2:
            return jnp.zeros(s.shape, dt)
        return jnp.full(s.shape, value, dt)

    return jax.jit(
        lambda: jax.tree_util.tree_map(mk, sds_tree)
    )()


def fake_params(model, *init_args, bf16: bool = True):
    """eval_shape the flax init (host-only trace) + constant fill."""
    sds = jax.eval_shape(lambda: model.init(jax.random.key(0), *init_args))
    return fill_tree(sds, bf16=bf16)["params"]

# reruns reuse compiled programs (first full compile is ~13 min)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def build(quick: bool):
    from fairdiff.guidance.attributes import celeba_slices
    from fairdiff.guidance.face_feats import FaceFeatsDB
    from fairdiff.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
    from fairdiff.models.dinov2 import DINOv2Config, DINOv2Model
    from fairdiff.models.face_detector import (
        DetectorConfig, FaceDetectorNet, make_detect_fn,
    )
    from fairdiff.models.mobilenet_v3 import MobileNetV3Large
    from fairdiff.models.sfnet import SFNet, SFNetConfig
    from fairdiff.sampling.pipeline import SDConfig, StableDiffusion
    from fairdiff.training.stack import (
        GuidanceStack, normalize_for_clip, normalize_for_dino,
    )
    from fairdiff.training.presets import exp1

    key = jax.random.key(0)
    if quick:
        from fairdiff.training.synthetic import synthetic_stack

        sd = StableDiffusion(SDConfig.tiny())
        params = sd.init_params(key)
        cfg = exp1(
            train_images_per_prompt=4, train_micro_batch=2,
            steps_low=2, steps_high=2, lora_rank=2,
        )
        return sd, params, synthetic_stack(("gender",)), cfg

    # remat=False: the denoise scan body is already grad-checkpointed, so
    # backward saves exactly one step's UNet activations; inner per-block
    # remat would recompute the UNet a second time for no memory win.
    sd = StableDiffusion(SDConfig.sd15(), remat=False)
    # frozen weights constant-filled in bf16 (the reference's fp16
    # inference cast, exp-1:722-794; see fill_tree on why not .init())
    params = fill_tree(jax.eval_shape(sd.init_params, key), bf16=True)

    det_cfg = DetectorConfig()
    det_net = FaceDetectorNet(det_cfg, dtype=jnp.bfloat16)
    det_params = fake_params(det_net, jnp.zeros((1, 512, 512, 3)))
    # Shape the detector head biases so every lane "detects" a valid face —
    # the COSTLIEST case (host OT + realism search + masked losses all
    # active), matching the random-init behavior the r1/r2 chip-seconds
    # were calibrated on. With zero kernels the head outputs ARE the
    # biases: cls logit 4.0 puts every anchor above the 0.5 sigmoid
    # threshold; box distances of 2 stride-units make 4-stride-wide boxes
    # (largest-area selection then picks a 128px stride-32 box); the kps
    # bias is a non-degenerate 5-point face pattern (stride units) so the
    # similarity-transform alignment (jnp.linalg.inv) stays well-posed.
    det_params["cls"]["bias"] = jnp.full_like(det_params["cls"]["bias"], 4.0)
    det_params["box"]["bias"] = jnp.full_like(det_params["box"]["bias"], 2.0)
    kps_pattern = [-0.6, -0.4, 0.6, -0.4, 0.0, 0.2, -0.4, 0.8, 0.4, 0.8]
    det_params["kps"]["bias"] = jnp.asarray(
        kps_pattern * det_cfg.num_anchors,
        det_params["kps"]["bias"].dtype,
    )
    detect_fn = make_detect_fn(det_net, det_cfg)

    mnv3 = MobileNetV3Large(num_classes=80, dtype=jnp.bfloat16)
    mnv3_params = fake_params(mnv3, jnp.zeros((1, 224, 224, 3)))

    clip = CLIPVisionModel(CLIPVisionConfig.vit_h14(), dtype=jnp.bfloat16)
    clip_params = fake_params(clip, jnp.zeros((1, 224, 224, 3)))

    dino = DINOv2Model(DINOv2Config.vitb14(), dtype=jnp.bfloat16)
    dino_params = fake_params(dino, jnp.zeros((1, 224, 224, 3)))

    sfnet = SFNet(SFNetConfig.sfnet20(), dtype=jnp.bfloat16)
    sfnet_params = fake_params(sfnet, jnp.zeros((1, 112, 112, 3)))

    def clip_fn(p, images):
        x = normalize_for_clip(images)
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
        e = clip.apply({"params": p}, x)["image_embeds"].astype(jnp.float32)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-6)

    def dino_fn(p, images):
        x = normalize_for_dino(images)
        x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
        e = dino.apply({"params": p}, x).astype(jnp.float32)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-6)

    db_feats = jax.random.normal(key, (1024, 512))
    db_feats = db_feats / jnp.linalg.norm(db_feats, axis=-1, keepdims=True)
    # frozen weights in stack.params: threaded through jit as arguments
    guidance = GuidanceStack(
        detect_fn=detect_fn,
        classify_fn=lambda p, chips: mnv3.apply({"params": p}, chips),
        slices=celeba_slices(),
        clip_feat_fn=clip_fn,
        dino_feat_fn=dino_fn,
        face_embed_fn=lambda p, a: sfnet.apply({"params": p}, a),
        img_size_small=256,
        params={
            # already constant-filled in bf16 by fake_params
            "detector": det_params,
            "classifier": mnv3_params,
            "clip": clip_params,
            "dino": dino_params,
            "face_embed": sfnet_params,
            "face_db": FaceFeatsDB(db_feats, jnp.zeros(1024, jnp.int32), {}),
        },
    )
    # fixed T: one compiled bucket (19 steps like training's lower bound)
    # micro-batch 8: best measured on v5e-16G (mb=12 OOMs, mb=4 wastes MXU
    # batch; PERF.md)
    mb = 8
    for a in sys.argv:
        if a.startswith("--micro_batch="):
            mb = int(a.split("=")[1])
    cfg = exp1(steps_low=19, steps_high=19, train_micro_batch=mb)
    return sd, params, guidance, cfg


class GenBench:
    """Secondary metric (BASELINE.json north star): images/sec for
    50-step DPM-Solver++ CFG generation.

    Batch default 16: the r4 on-chip sweep (tools/bench_gen; PERF.md
    "Generation north star") measured 1.201 img/s at batch 16 vs 1.111
    at the reference CLI's batch-10 default and 1.129 at 20. img/s is a
    throughput metric and batch a free serving knob — overridable with
    FAIRDIFF_GEN_BATCH or the constructor.

    Split into build (host-only) / aot_compile (device-memory-free, safe
    to run on a background thread while the train bench executes) /
    run (2 timed executions) so the driver's default invocation can
    overlap the gen compile with the train measurement and skip gen
    cleanly when the wall-clock budget is short (VERDICT r2 weak-1)."""

    def __init__(self, n: int | None = None):
        import os

        from fairdiff.sampling.pipeline import SDConfig, StableDiffusion

        self.N = int(n or os.environ.get("FAIRDIFF_GEN_BATCH", "16"))
        self.sd = StableDiffusion(SDConfig.sd15())
        v = self.sd.config.text.vocab_size
        self.cond = jnp.full((1, 77), v - 1, jnp.int32).at[0, 0].set(0)
        self.uncond = jnp.full((1, 77), v - 1, jnp.int32).at[0, 0].set(0)
        self.fn = jax.jit(
            lambda p, n: self.sd.generate(p, n, self.cond, self.uncond, 50)
        )

    def aot_compile(self):
        """Compile from ShapeDtypeStructs: no parameters touch the device,
        so this cannot add HBM pressure to concurrently-timed train steps."""
        p_sds = jax.eval_shape(self.sd.init_params, jax.random.key(0))
        bf16 = lambda s: jax.ShapeDtypeStruct(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
        )
        p_sds = jax.tree_util.tree_map(bf16, p_sds)
        n_sds = jax.ShapeDtypeStruct(
            self.sd.latent_shape(self.N), jnp.float32
        )
        self.fn.lower(p_sds, n_sds).compile()

    def run(self, params=None, *, n_timed: int = 1, emit: bool = True):
        if params is None:  # standalone --gen invocation
            params = fill_tree(
                jax.eval_shape(self.sd.init_params, jax.random.key(0)),
                bf16=True,
            )
        noises = jax.random.normal(
            jax.random.key(1), self.sd.latent_shape(self.N)
        )
        imgs = self.fn(params, noises)
        _ = np.asarray(imgs[0, 0, 0])  # force execution (tunnel is async)
        t0 = time.time()
        for _ in range(n_timed):
            imgs = self.fn(params, noises)
            _ = np.asarray(imgs[0, 0, 0])
        dt = (time.time() - t0) / n_timed
        ips = self.N / dt
        if emit:
            print(json.dumps({
                "metric": "gen_images_per_sec_50step_dpm",
                "value": round(ips, 3),
                "unit": "img/s",
                "vs_baseline": round(ips / GEN_BASELINE_IMG_S, 3),
                "baseline_note": GEN_BASELINE_NOTE,
            }), flush=True)
        return ips


# The reference publishes no generation throughput. The denominator below is
# DERIVED from its one published perf fact — ~22 s/optimizer-step on 2xA100
# (BASELINE.md) for a workload whose FLOPs are implementation-independent:
# 912+912 CFG UNet passes (phases 1/3) + 2736 fwd-equivalents in the
# checkpointed chain backward (phase 4) = 4560 x 0.68 TFLOP + ~0.3 PFLOP
# decode/guidance = 3.4 PFLOP -> 3.4e3/44 = 77 effective TFLOPS per A100 on
# this exact model mix. One 50-step CFG image = 100 UNet fwd x 0.68 + 1.2
# decode = 69.2 TFLOP -> 77/69.2 = 1.12 img/s per A100. Caveat (recorded in
# BASELINE.md): the train-derived TFLOPS includes the reference's host-side
# face-detection stalls, so a pure-GPU diffusers loop could run somewhat
# above this; treat vs_baseline as an estimate against a derived, not
# measured, denominator.
GEN_BASELINE_IMG_S = 1.12
GEN_BASELINE_NOTE = (
    "denominator 1.12 img/s derived from the reference's 44 chip*s/step "
    "train fact (77 eff. TFLOPS/A100 x 69.2 TFLOP per 50-step image); "
    "no measured reference gen number exists — see BASELINE.md"
)


def bench_generation():
    gb = GenBench()
    gb.run()


def main():
    # wall-clock budget: the driver runs `python bench.py` under a fixed
    # timeout. The train metric is the gate — print it as early as
    # possible, then spend whatever remains on the gen metric. A cold
    # cache must degrade to "train line only", never to rc=124 with no
    # output (round-2 failure mode).
    t_start = time.time()
    import os

    budget = float(os.environ.get("FAIRDIFF_BENCH_BUDGET_S", "900"))
    quick = "--quick" in sys.argv
    if "--gen" in sys.argv:
        bench_generation()
        return
    from fairdiff.training.debias import DebiasTrainer

    # Kick off the gen-metric AOT compile FIRST: it is device-memory-free
    # (ShapeDtypeStructs only) and the remote compile service builds it in
    # parallel with the train warmup, so by the time the train line prints
    # the gen program is ready to execute. Started after the train line
    # (the r2 design) it only ever saw the budget's last ~70s and was
    # always skipped.
    gen = None
    if not quick and "--train-only" not in sys.argv:
        import threading

        gen = {"done": threading.Event(), "err": []}

        def _gen_compile():
            try:
                gen["gb"] = GenBench()
                gen["gb"].aot_compile()
            except Exception as e:  # noqa: BLE001
                gen["err"].append(e)
            finally:
                gen["done"].set()

        threading.Thread(target=_gen_compile, daemon=True).start()

    sd, params, guidance, cfg = build(quick)
    trainer = DebiasTrainer(sd, params, guidance, cfg)
    state = trainer.init_state(jax.random.key(1))
    # full-length padded prompts, exactly like tokenize_prompts pads to
    # max_length in production (S=77 for SD-1.5): the text encoder and
    # every UNet cross-attention must run at the production KV length —
    # short ids would understate the benched program
    v = sd.config.text.vocab_size
    S = sd.config.text.max_position_embeddings
    bos, eos = 0, v - 1  # id VALUES don't change cost; eos position does
    words = [(5 + i) % (v - 1) or 1 for i in range(min(5, S - 2))]
    cond = jnp.asarray(
        [[bos, *words, eos] + [eos] * (S - 2 - len(words))], jnp.int32
    )
    uncond = jnp.asarray([[bos, eos] + [eos] * (S - 2)], jnp.int32)
    root = jax.random.key(42)

    t0 = time.time()
    if not quick:
        # compile all five train programs in parallel (AOT, no execution):
        # serial lazy compiles measured 369s cold; the overlap roughly
        # halves the time to the train JSON line on a cold cache
        try:
            wt = trainer.warmup(state, (cond, uncond))
            if wt:
                print(f"# parallel warmup compile: {wt:.1f}s", file=sys.stderr)
        except Exception as e:  # warmup is best-effort only
            print(
                f"# warmup failed ({type(e).__name__}: {str(e)[:200]}); "
                "compiling lazily", file=sys.stderr,
            )
    # The pair-VJP is the memory-critical program; if a future shape/config
    # change pushes it over 16G HBM, degrade to fewer pair lanes (slower,
    # but a real number beats a crashed bench). The trainer reads
    # FAIRDIFF_PAIR_LANES per call, so retries need no rebuild.
    import os

    def first_step(trainer, state):
        for lanes in (os.environ.get("FAIRDIFF_PAIR_LANES"), "4", "2", "1"):
            if lanes is not None:
                os.environ["FAIRDIFF_PAIR_LANES"] = lanes
            try:
                return trainer.train_step(state, (cond, uncond), root)[0]
            except Exception as e:  # XlaRuntimeError has no stable path
                if "RESOURCE_EXHAUSTED" not in str(e) or lanes == "1":
                    raise
                print(
                    f"# OOM at pair_lanes={lanes or 'default'}; "
                    "retrying smaller",
                    file=sys.stderr,
                )

    # Non-OOM failures (e.g. a Mosaic regression in a Pallas kernel on a
    # new toolchain) escalate through safe modes instead of crashing the
    # bench: Pallas flash backward -> XLA-recompute vjp -> XLA attention.
    # The degraded number is real and the mode is printed to stderr.
    fallbacks = (
        {"note": "flash backward -> XLA recompute vjp",
         "env": ("FAIRDIFF_FLASH_BWD", "recompute")},
        {"note": "flash disabled -> XLA attention", "use_flash": False},
    )
    for i in range(len(fallbacks) + 1):
        try:
            state = first_step(trainer, state)
            break
        except Exception as e:
            if quick or i == len(fallbacks):
                raise
            fb = fallbacks[i]
            print(
                f"# train step failed ({type(e).__name__}: {str(e)[:200]});"
                f" falling back: {fb['note']}",
                file=sys.stderr,
            )
            if "env" in fb:
                os.environ[fb["env"][0]] = fb["env"][1]
            if fb.get("use_flash") is False:
                from fairdiff.sampling.pipeline import StableDiffusion

                sd = StableDiffusion(sd.config, use_flash=False)
            # rebuild so every jit cache re-traces under the new mode
            trainer = DebiasTrainer(sd, params, guidance, cfg)
            state = trainer.init_state(jax.random.key(1))
    compile_step = time.time() - t0
    from fairdiff.utils.profiling import PhaseTimers

    if "--verbose" in sys.argv:
        first = {k: round(v, 1) for k, v in trainer.timers.summary().items()}
        print(
            f"# first-step phase times (compile-inclusive): {first}",
            file=sys.stderr,
        )
    trainer.timers = PhaseTimers()  # drop compile-inflated phase samples

    n_timed = 1 if quick else 2
    # A high-water OOM can surface on a LATER execution of a program whose
    # first run succeeded (measured 2026-08-19: XLA-GEGLU pair-VJP at p=8
    # completed its warmup step, then RESOURCE_EXHAUSTED on the next call —
    # allocator state differs once prior step buffers are resident). Degrade
    # lanes and restart the timed loop instead of dying metric-less.
    for lanes in (None, "4", "2", "1"):
        try:
            if lanes is not None:
                os.environ["FAIRDIFF_PAIR_LANES"] = lanes
                print(f"# timed-step OOM; degrading to pair_lanes={lanes}",
                      file=sys.stderr)
                # compile+warm the degraded program outside the timed loop
                state, logs = trainer.train_step(state, (cond, uncond), root)
            t0 = time.time()
            for _ in range(n_timed):
                state, logs = trainer.train_step(state, (cond, uncond), root)
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or lanes == "1":
                raise
    step_time = (time.time() - t0) / n_timed

    if "--trace" in sys.argv:
        from fairdiff.utils.profiling import trace_to

        with trace_to("/tmp/bench_trace"):
            state, _ = trainer.train_step(state, (cond, uncond), root)
        print("# trace -> /tmp/bench_trace", file=sys.stderr)

    # the trainer is built WITHOUT a mesh: the jitted step runs on one
    # device regardless of how many are visible — bill exactly that one
    n_chips = 1
    chip_seconds = step_time * n_chips
    baseline_chip_seconds = 44.0  # 22 s/step x 2 A100 (BASELINE.md)
    result = {
        "metric": "exp1_train_step_chip_seconds",
        "value": round(chip_seconds, 3),
        "unit": "chip*s/step",
        "vs_baseline": round(baseline_chip_seconds / chip_seconds, 3),
    }
    print(json.dumps(result), flush=True)
    # the primary metric is out: from here on, a driver SIGTERM (budget
    # exceeded mid-gen) must not turn the run into a failure
    import signal

    def _graceful(signum, frame):
        print("# SIGTERM after train metric; exiting clean", file=sys.stderr)
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _graceful)
    if "--verbose" in sys.argv:
        phases = {k: round(v, 2) for k, v in trainer.timers.summary().items()}
        # face_rate at random detector init measures 1.0 (every lane
        # "detected"): the COSTLIEST case for the host OT / realism-search
        # / masked-loss branches, so the chip·s number is conservative —
        # production sparsity (~0.9) can only shrink the host-side work
        print(
            f"# warmup(+compile) {compile_step:.1f}s, steady {step_time:.2f}s/step "
            f"on {n_chips} chip(s); loss={logs.get('train_loss')}; "
            f"face_rate={logs.get('face_rate')}; "
            f"phase_means_s={phases}",
            file=sys.stderr,
        )
    # default full run also reports the generation metric so the driver
    # captures both north stars from one plain invocation (VERDICT r1
    # weak-3) — but only inside the wall budget: the gen program compiles
    # on a background thread (AOT from ShapeDtypeStructs, no device
    # memory) and is skipped, train line intact, if it can't make it
    if gen is not None:
        remaining = budget - (time.time() - t_start) - 45.0
        if not gen["done"].wait(timeout=max(remaining, 5.0)):
            print(
                f"# gen metric skipped: compile not done with "
                f"{remaining:.0f}s left of FAIRDIFF_BENCH_BUDGET_S={budget:.0f}",
                file=sys.stderr,
            )
            sys.stdout.flush()
            os._exit(0)  # daemon compile thread would block a clean exit
        if gen["err"]:
            print(
                f"# gen metric skipped: compile failed ({gen['err'][0]!r})",
                file=sys.stderr,
            )
        else:
            # Free every training-only device buffer first. The gen batch-16
            # program fits comfortably alone (tools/bench_gen: 1.201 img/s)
            # but measured 0.046 img/s — a 26x allocator thrash — when the
            # trainer, its jit cache, and the ~GBs of guidance-zoo params
            # (CLIP-H/DINOv2/SCRFD/classifiers, which generation never
            # touches) were still resident (r4 log, 2026-08-20). Dropping
            # the Python refs lets the backend free the buffers; the SD
            # params tree stays — the gen program shares it.
            import gc

            del trainer, state, guidance, logs
            gc.collect()
            gen["gb"].run(params)


if __name__ == "__main__":
    main()
