"""The fairness-finetuning trainer — the reference's 4-phase train loop,
TPU-native.

Reference: exp-1-debias-gender/1-main-debias.py:1731-2070 (and the exp-3/4/6
variants). Per optimizer step, one prompt (identical across data shards)
and N noise lanes (distinct per lane):

  phase 1  sample with CURRENT adapters (no grad), face-analyse, classify
           (exp-1:1783-1826)                                  [jitted]
  phase 2  dynamic targets from the GLOBAL probability batch, uncertainty
           gate (exp-1:1828-1838)                             [host, tiny]
  phase 3  sample with FROZEN base model -> original feats/preds
           (exp-1:1840-1877)                                  [jitted]
  phase 4  micro-batched differentiable sampling + composite loss; grads
           accumulate across chunks (exp-1:1879-1940)         [jitted/chunk]
  update   finite-gate -> AdamW -> EMA (exp-1:1996-2029)      [jitted]

TPU-native translations:
  - the manual grad all-reduce /(P*N_backward) disappears: lanes are sharded
    over the "data" mesh axis, losses are global means, XLA inserts psums
  - rank-0 broadcasts of step counts/targets are replaced by determinism
    (same seeded host RNG on every host)
  - the variable 19..23-step chain stays jit-friendly by bucketing: one
    compiled executable per step-count (5 buckets, cached)
  - fp16+GradScaler(1.0) becomes bf16 compute + fp32 adapters; the
    finite-grad step-skip is optax.apply_if_finite
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fairdiff.adapters import ema as ema_lib
from fairdiff.adapters import lora as lora_lib
from fairdiff.adapters import prefix as prefix_lib
from fairdiff.fairness import losses as loss_lib
from fairdiff.fairness import targets as targets_lib
from fairdiff.fairness import weights as weights_lib
from fairdiff.sampling import dpm_solver
from fairdiff.sampling.pipeline import StableDiffusion
from fairdiff.training import metrics as metrics_lib
from fairdiff.training.stack import GuidanceStack
from fairdiff.utils import rng as rng_lib


@dataclasses.dataclass(frozen=True)
class DebiasConfig:
    # which adapters train (exp-1 flags train_text_encoder/train_unet;
    # exp-2 trains the prefix instead)
    train_text_encoder: bool = True
    train_unet: bool = False
    train_prefix: bool = False
    num_prefix_tokens: int = 5
    lora_rank: int = 50
    # attributes & targets: "binary" (exp-1/2), "ot2" (exp-3/5),
    # "ot3" (exp-4), "enum" (exp-6)
    attributes: tuple[str, ...] = ("gender",)
    target_kind: str = "binary"
    target_ratio: float = 0.5
    uncertainty_thresholds: tuple[float, ...] = (0.2,)
    # the reference draws 100 OT samples PER DEVICE and all-reduces the
    # transport plans (exp-3:1528-1535): target sharpness scales with the
    # topology. We reproduce that: total draws = per_shard * data shards.
    # ot_num_samples > 0 overrides with an explicit topology-independent
    # total.
    ot_samples_per_shard: int = 100
    ot_num_samples: int = 0
    # optimization (exp-1 defaults, exp-1:397-430)
    learning_rate: float = 5e-5
    weight_decay: float = 1e-2
    lr_warmup_steps: int = 0
    max_train_steps: int = 10000
    train_images_per_prompt: int = 24  # global lanes per step
    train_micro_batch: int = 4  # train_GPU_batch_size
    steps_low: int = 19
    steps_high: int = 23
    guidance_scale: float = 7.5
    # loss weights (exp-1:1932; per-attr factors for exp-3+)
    weight_loss_img: float = 8.0
    weight_loss_face: float = 1.0
    factor1: tuple[float, ...] = (0.2,)
    factor2: tuple[float, ...] = (0.1,)
    face_confidence_level: float = 0.9
    no_face_img_weight_one: bool = True  # exp-1 True, exp-3+ False
    face_search_all_lanes: bool = False  # exp-3 searches every face lane
    # EMA
    ema_decay: float = 0.996
    # eval
    eval_interval: int = 200
    eval_denoising_steps: int = 25
    val_images_per_prompt: int = 8
    # misc
    seed: int = 42
    output_dir: str = "outputs/debias"

    def factor_dict(self, which: str) -> dict[str, float]:
        vals = self.factor1 if which == "f1" else self.factor2
        return dict(zip(self.attributes, vals))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DebiasState:
    adapters: dict[str, Any]  # {"unet_lora": {}, "te_lora": {}, "prefix": None|arr}
    opt_state: Any
    ema: dict[str, Any]
    step: int

    def tree_flatten(self):
        return (self.adapters, self.opt_state, self.ema), (self.step,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])


class _JitProgram:
    """Lazy-jit callable that prefers an AOT-compiled executable.

    `warmup()` builds each program ahead of time with `.lower().compile()`,
    but jax does NOT install that executable into the jit dispatch cache —
    a later plain call would compile the same HLO a second time, and the
    remote TPU compile service only partially reuses the persistent disk
    cache (the round-2 bench-timeout root cause: 487 s of parallel AOT
    warmup followed by >20 min of serial *re*compiles inside the first
    step). Keeping the `Compiled` object and calling it directly makes the
    warmup authoritative. A signature drift (shape/dtype mismatch vs the
    warmed arguments) raises TypeError before anything executes; we then
    drop back to the lazy jit path, which is always correct.
    """

    def __init__(self, jitted, get_frozen=None):
        self.jitted = jitted
        self.compiled = None
        self._get_frozen = get_frozen

    def __call__(self, *a):
        args = (self._get_frozen(), *a) if self._get_frozen else a
        if self.compiled is not None:
            try:
                return self.compiled(*args)
            except TypeError:  # arg-signature mismatch: warmed shapes drifted
                self.compiled = None
        return self.jitted(*args)


class DebiasTrainer:
    def __init__(
        self,
        sd: StableDiffusion,
        frozen_params: dict,
        guidance: GuidanceStack,
        config: DebiasConfig,
        *,
        mesh=None,
        logger: Optional[Callable[[int, dict], None]] = None,
    ):
        self.sd = sd
        self.guidance = guidance
        self.cfg = config
        self.mesh = mesh
        if mesh is not None:
            from fairdiff.parallel.tp import shard_sd_params

            # data-parallel (model=1): degenerates to full replication;
            # model>1: Megatron-style column/row attention + TE-MLP split.
            # Flash attention stays on under TP: the kernel declares its
            # (batch, head) parallelism via custom_partitioning, so each
            # shard runs it on its local head slice with no gather.
            frozen_params = shard_sd_params(mesh, frozen_params, sd.config)
        self.params = frozen_params
        self.logger = logger or (lambda step, logs: None)
        self._jit_cache: dict = {}
        # rendered frozen-baseline eval grids, keyed by
        # (eval root key bits, prompt label): the ori images depend only
        # on (root, prompt), so later eval steps copy the file instead of
        # re-running a full generation pass per prompt
        self._ori_grid_cache: dict = {}
        from fairdiff.utils.profiling import PhaseTimers

        self.timers = PhaseTimers()

        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, config.learning_rate, max(config.lr_warmup_steps, 1)),
                optax.constant_schedule(config.learning_rate),
            ],
            [max(config.lr_warmup_steps, 1)],
        ) if config.lr_warmup_steps else config.learning_rate
        self.tx = optax.apply_if_finite(
            optax.adamw(
                schedule, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=config.weight_decay,
            ),
            max_consecutive_errors=10**8,
        )

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> DebiasState:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        adapters: dict[str, Any] = {}
        if cfg.train_unet:
            adapters["unet_lora"] = lora_lib.init_lora(
                self.params["unet"], lora_lib.unet_attention_targets, cfg.lora_rank, k1
            )
        if cfg.train_text_encoder:
            adapters["te_lora"] = lora_lib.init_lora(
                self.params["text_encoder"], lora_lib.text_encoder_targets,
                cfg.lora_rank, k2,
            )
        if cfg.train_prefix:
            adapters["prefix"] = prefix_lib.init_prefix(
                self.params["text_encoder"]["token_embedding"]["embedding"],
                cfg.num_prefix_tokens, k3,
            )
        opt_state = self.tx.init(adapters)
        state = DebiasState(adapters, opt_state, ema_lib.init_ema(adapters), 0)
        if self.mesh is not None:
            # commit the trainable state replicated on the mesh — the SAME
            # sharding _update_fn pins its outputs to, so the step-0 and
            # step-N programs see identical input shardings (one compile
            # per program, not two; see _update_fn)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep)
                if isinstance(x, jax.Array) else x,
                state,
            )
        return state

    # ------------------------------------------------------------------
    def _gen_kwargs(self, adapters: Optional[dict]) -> dict:
        if not adapters:
            return {}
        return {
            "unet_lora": adapters.get("unet_lora"),
            "te_lora": adapters.get("te_lora"),
            "prefix_table": adapters.get("prefix"),
        }

    def _prefix_ids(self, ids: jax.Array) -> jax.Array:
        if not self.cfg.train_prefix:
            return ids
        return prefix_lib.prepend_prefix_ids(
            ids, self.cfg.num_prefix_tokens, self.sd.config.text.vocab_size,
            self.sd.config.text.max_position_embeddings,
        )

    @staticmethod
    def _match_len(uncond_ids: jax.Array, cond_ids: jax.Array) -> jax.Array:
        """Pad uncond to the cond length with its pad/eos column (the
        reference tokenizes uncond at padding='max_length'=len(cond),
        exp-1:1019-1027)."""
        diff = cond_ids.shape[1] - uncond_ids.shape[1]
        if diff <= 0:
            return uncond_ids[:, : cond_ids.shape[1]]
        pad = jnp.tile(uncond_ids[:, -1:], (1, diff))
        return jnp.concatenate([uncond_ids, pad], axis=1)

    @property
    def _frozen(self):
        """Frozen weights passed INTO jit as arguments (multi-GB trees must
        be traced arguments, not closure-captured lowering constants)."""
        return (self.params, self.guidance.params)

    def _sample_analyze_fn(self, n_steps: int, with_adapters: bool,
                           full: bool = True, with_latents: bool = False):
        """full=False computes only detection + attribute heads (phase 1
        consumes just the probability vectors for target generation; the
        CLIP/DINO/face-embedding towers are phase-3/4 inputs only).
        with_latents=True also returns (final_latents, trajectory) — the
        linearized phase-4 backward resumes from these."""
        key = ("sample", n_steps, with_adapters, full, with_latents)
        if key not in self._jit_cache:

            def fn(frozen, adapters, noises, cond_ids, uncond_ids):
                sd_params, gparams = frozen
                out = self.sd.generate(
                    sd_params, noises,
                    cond_ids, uncond_ids, n_steps,
                    guidance_scale=self.cfg.guidance_scale,
                    return_latents=with_latents,
                    **(self._gen_kwargs(adapters) if with_adapters else {}),
                )
                images, final, traj = out if with_latents else (out, None, None)
                res = self.guidance.analyze(
                    images, include_semantic=full, include_face_feats=full,
                    params=gparams,
                )
                if with_latents:
                    return images, res, final, traj
                return images, res

            self._jit_cache[key] = _JitProgram(
                jax.jit(fn), lambda: self._frozen
            )
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    def _chunk_loss(
        self, frozen, adapters, noises, cond_ids, uncond_ids, n_steps,
        targets: dict, ori: dict,
    ):
        """Chain-backward phase-4 loss: differentiable re-sample + loss.
        Kept as the FAIRDIFF_PHASE4=chain fallback and as the golden for
        the linearized path's equivalence test."""
        cfg = self.cfg
        sd_params, gparams = frozen
        images = self.sd.generate(
            sd_params, noises, cond_ids, uncond_ids, n_steps,
            guidance_scale=cfg.guidance_scale, grad_mode=True,
            **self._gen_kwargs(adapters),
        )
        return self._images_loss(frozen, images, targets, ori)

    def _images_loss(self, frozen, images, targets: dict, ori: dict):
        """Composite fairness loss given already-decoded images
        (exp-1:1879-1940 semantics; shared by the chain and linearized
        phase-4 paths)."""
        cfg = self.cfg
        sd_params, gparams = frozen
        res = self.guidance.analyze(images, include_semantic=False, params=gparams)
        ind = res.faces.indicators

        # fair CE per attribute (masked sum)
        loss_fair = jnp.zeros(images.shape[0])
        fair_valid = jnp.zeros(images.shape[0], bool)
        for name in cfg.attributes:
            lf, v = loss_lib.fair_ce_loss(
                res.attrs[name].logits, targets[name], ind
            )
            loss_fair = loss_fair + lf
            fair_valid = fair_valid | v

        # face-region gradient treatment, then CLIP/DINO on hooked images
        hooked = weights_lib.face_region_grad_scale_multi(
            images, res.faces.bboxes, ori["face_bboxes"],
            {a: targets[a] for a in cfg.attributes},
            {a: ori["preds"][a] for a in cfg.attributes},
            cfg.factor_dict("f2"),
        )
        clip_feats, dino_feats = self.guidance.semantic_feats(hooked, params=gparams)
        loss_clip = (
            loss_lib.cosine_loss(clip_feats, ori["clip_feats"])
            if clip_feats is not None else jnp.zeros(images.shape[0])
        )
        loss_dino = (
            loss_lib.cosine_loss(dino_feats, ori["dino_feats"])
            if dino_feats is not None else jnp.zeros(images.shape[0])
        )

        # face realism
        if res.face_feats is not None:
            kept_all = ind
            for name in cfg.attributes:
                kept_all = kept_all & (
                    (targets[name] == ori["preds"][name])
                    & (targets[name] != -1)
                    & (ori["probs_max"][name] >= cfg.face_confidence_level)
                )
            if cfg.face_search_all_lanes:
                face_valid = ind
            else:
                face_valid = ind
                for name in cfg.attributes:
                    face_valid = face_valid & (targets[name] != -1)
            searched = res.face_feats
            face_db = self.guidance.get_db(gparams)
            if face_db is not None:
                _, searched = face_db.semantic_search(
                    jax.lax.stop_gradient(res.face_feats)
                )
            target_embeds = jnp.where(
                kept_all[:, None], ori["face_feats"], searched
            )
            loss_face = loss_lib.cosine_loss(
                res.face_feats, jax.lax.stop_gradient(target_embeds)
            )
            loss_face = jnp.where(face_valid, loss_face, 0.0)
        else:
            loss_face = jnp.zeros(images.shape[0])
            face_valid = jnp.zeros(images.shape[0], bool)

        dyn_w = weights_lib.dynamic_weights_multi(
            ind,
            {a: targets[a] for a in cfg.attributes},
            {a: ori["preds"][a] for a in cfg.attributes},
            cfg.factor_dict("f1"),
            no_face_weight=1.0 if cfg.no_face_img_weight_one else None,
        )
        out = loss_lib.composite_loss(
            loss_fair=loss_fair, loss_clip=loss_clip, loss_dino=loss_dino,
            loss_face=loss_face, dynamic_w=dyn_w,
            weight_img=cfg.weight_loss_img, weight_face=cfg.weight_loss_face,
            fair_valid=fair_valid, face_valid=face_valid,
        )
        return out.total, out.logs

    def _grad_fn(self, n_steps: int):
        key = ("grad", n_steps)
        if key not in self._jit_cache:
            fn = jax.grad(
                lambda adapters, frozen, *a: self._chunk_loss(frozen, adapters, *a),
                has_aux=True,
            )
            jitted = jax.jit(
                lambda frozen, adapters, noises, ci, ui, t, o: fn(
                    adapters, frozen, noises, ci, ui, n_steps, t, o
                )
            )
            self._jit_cache[key] = lambda *a: jitted(self._frozen, *a)
        return self._jit_cache[key]

    def _grad_accum_fn(self, n_steps: int, n_chunks: int):
        """All phase-4 micro-batches in ONE dispatch: lax.scan over chunks
        accumulating adapter grads on-device. The per-chunk Python loop left
        the chip idle between chunks (host round-trips dominated phase 4);
        the scan removes every host boundary. Single-host path (the mesh
        path keeps the Python loop so lanes stay sharded over devices)."""
        key = ("grad_accum", n_steps, n_chunks)
        if key not in self._jit_cache:
            grad_core = jax.grad(
                lambda adapters, frozen, *a: self._chunk_loss(frozen, adapters, *a),
                has_aux=True,
            )

            def fn(frozen, adapters, noises_c, ci, ui, targets_c, ori_c):
                def body(acc, inp):
                    nz, t, o = inp
                    g, logs = grad_core(adapters, frozen, nz, ci, ui, n_steps, t, o)
                    return jax.tree_util.tree_map(jnp.add, acc, g), logs

                zeros = jax.tree_util.tree_map(jnp.zeros_like, adapters)
                acc, logs = jax.lax.scan(
                    body, zeros, (noises_c, targets_c, ori_c)
                )
                acc = jax.tree_util.tree_map(lambda x: x / n_chunks, acc)
                return acc, logs

            jitted = jax.jit(fn)
            self._jit_cache[key] = lambda *a: jitted(self._frozen, *a)
        return self._jit_cache[key]

    # -- linearized phase 4 ---------------------------------------------
    # The reference detaches the latent at every UNet input (exp-1:1115),
    # so the sampling chain is AFFINE in the guided epsilons with scalar
    # schedule coefficients: x_final = B*x_init + sum_t gamma_t * eps_t.
    # Phase 4 therefore does not need to re-run (or remat) the chain at
    # all. We (a) save the trajectory {x_t} and x_final from the phase-1
    # forward (same model, same noises => identical chain), (b) backprop
    # the composite loss through decode+guidance only to get dL/dx_final,
    # (c) form per-step cotangents c_t = grad_coef_t*gamma_t*dL/dx_final
    # (dpm.chain_eps_cotangents), and (d) accumulate adapter grads over
    # T*N *independent* single-step UNet VJPs — a flat, perfectly
    # parallel batch with exactly one step's activations live at a time.
    # vs the chain backward this removes one full UNet forward per step
    # (the scan-remat tax) plus the chain re-forward phase 4 used to do.
    def _gamma(self, n_steps: int) -> jax.Array:
        key = ("gamma", n_steps)
        if key not in self._jit_cache:
            bundle = dpm_solver.make_step_bundle(
                self.sd.config.solver, self.sd.schedule, n_steps
            )
            self._jit_cache[key] = dpm_solver.chain_eps_cotangents(bundle)
        return self._jit_cache[key]

    def _final_grad_fn(self, n_chunks: int):
        """dL/dx_final + logs: scan over lane chunks, each computing the
        chunk-mean composite loss on decode(x_final) and differentiating
        w.r.t. the final latents (decode is grad-checkpointed per image
        exactly as the chain path's decoder)."""
        key = ("final_grad", n_chunks)
        if key not in self._jit_cache:

            def chunk_loss(x_final, frozen, targets, ori):
                sd_params, _ = frozen
                images = self.sd.decode_images(
                    sd_params, x_final, grad_mode=True
                )
                return self._images_loss(frozen, images, targets, ori)

            grad_core = jax.grad(chunk_loss, has_aux=True)

            def fn(frozen, x_chunks, targets_c, ori_c):
                def body(_, inp):
                    xf, t, o = inp
                    g, logs = grad_core(xf, frozen, t, o)
                    return None, (g, logs)

                _, (g_final, logs) = jax.lax.scan(
                    body, None, (x_chunks, targets_c, ori_c)
                )
                return g_final, logs

            self._jit_cache[key] = _JitProgram(
                jax.jit(fn), lambda: self._frozen
            )
        return self._jit_cache[key]

    def _pair_grad_fn(self, n_steps: int, n_lane_chunks: int):
        """Adapter grads from the flat (step x lane-chunk) batch of
        single-step UNet VJPs. Each scan iteration differentiates the
        surrogate  <cot, guided_eps(params)>  at one trajectory point —
        by construction its parameter gradient equals that step's
        contribution to the true chain gradient (see block comment)."""
        key = ("pair_grad", n_steps, n_lane_chunks)
        if key not in self._jit_cache:
            cfg = self.cfg
            gs = cfg.guidance_scale

            def surrogate(adapters, context, key_mask, frozen, x, t, cot):
                sd_params, _ = frozen
                kw = self._gen_kwargs(adapters)
                lat2 = jnp.concatenate([x, x], axis=0)
                eps2 = self.sd.unet_eps(
                    sd_params, lat2, t, context, key_mask,
                    unet_lora=kw.get("unet_lora"),
                ).astype(jnp.float32)
                eps_u, eps_c = jnp.split(eps2, 2, axis=0)
                guided = eps_u + gs * (eps_c - eps_u)
                return jnp.sum(guided * cot)

            # grads w.r.t. (adapters, context): the UNet-LoRA leaves get
            # their per-step contribution directly; the TE/prefix leaves
            # flow through `context`, which is loop-invariant — so sum the
            # context cotangents over the scan and apply ONE text-encoder
            # VJP at the end instead of re-running the TE (fwd+bwd) in
            # every one of the T x n_chunks scan iterations
            grad_core = jax.grad(surrogate, argnums=(0, 1))

            def fn(frozen, adapters, traj_chunks, ts, cot_chunks, ci, ui):
                sd_params, _ = frozen
                p_lanes = traj_chunks.shape[1]

                def make_context(adp):
                    kw = self._gen_kwargs(adp)
                    return self.sd.build_context(
                        sd_params, ci, ui, p_lanes,
                        te_lora=kw.get("te_lora"),
                        prefix_table=kw.get("prefix_table"),
                    )

                (context, key_mask), ctx_vjp = jax.vjp(
                    make_context, adapters
                )

                def body(acc, inp):
                    x, t, cot = inp
                    acc_a, acc_c = acc
                    g_a, g_c = grad_core(
                        adapters, context, key_mask, frozen, x, t, cot
                    )
                    return (
                        jax.tree_util.tree_map(jnp.add, acc_a, g_a),
                        acc_c + g_c,
                    ), None

                zeros = jax.tree_util.tree_map(
                    lambda p: jnp.zeros_like(p), adapters
                )
                (acc_a, acc_c), _ = jax.lax.scan(
                    body, (zeros, jnp.zeros_like(context)),
                    (traj_chunks, ts, cot_chunks),
                )
                # int mask output takes a float0 cotangent
                mask_cot = np.zeros(key_mask.shape, jax.dtypes.float0)
                (g_te,) = ctx_vjp((acc_c, mask_cot))
                return jax.tree_util.tree_map(jnp.add, acc_a, g_te)

            self._jit_cache[key] = _JitProgram(
                jax.jit(fn), lambda: self._frozen
            )
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    def aot_jobs(
        self,
        state: "DebiasState",
        prompt_ids: tuple[jax.Array, jax.Array],
        n_steps: Optional[int] = None,
        pair_lanes: Optional[int] = None,
    ) -> list[tuple[str, Any, tuple]]:
        """The five jitted programs of a linearized `train_step` with their
        exact argument ShapeDtypeStructs — shared by `warmup` (parallel AOT
        compile) and tools/tp_scaling.py (per-program `memory_analysis`
        without executing anything). Shapes are derived with
        `jax.eval_shape`, so this traces but never runs the model.
        Single-host linearized path only; [] otherwise.
        """
        import os

        cfg = self.cfg
        n, m = cfg.train_images_per_prompt, cfg.train_micro_batch
        use_linear = (
            os.environ.get("FAIRDIFF_PHASE4", "linear") == "linear"
            and n % m == 0
        )
        if self.mesh is not None or not use_linear:
            return []
        n_steps = int(n_steps or cfg.steps_low)
        n_chunks = n // m

        cond_raw, uncond_raw = prompt_ids
        cond = self._prefix_ids(cond_raw)
        uncond = self._match_len(uncond_raw, cond)
        as_sds = lambda tree: jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), tree
        )
        frozen = as_sds(self._frozen)
        adapters = as_sds(state.adapters)
        noises = jax.ShapeDtypeStruct(
            self.sd.latent_shape(n), jnp.float32
        )

        prog1 = self._sample_analyze_fn(
            n_steps, True, full=False, with_latents=True
        )
        prog3 = self._sample_analyze_fn(n_steps, False)
        _, res1, x_final, traj = jax.eval_shape(
            prog1.jitted, frozen, adapters, noises, cond, uncond
        )
        _, res3 = jax.eval_shape(
            prog3.jitted, frozen, None, noises, cond_raw, uncond_raw
        )

        # targets: run the real host-side generator on dummy probabilities
        # so dtypes match train_step exactly (a dtype drift would silently
        # warm the wrong program)
        rng = np.random.default_rng(0)
        probs_dummy = {
            a: rng.dirichlet(
                np.ones(res1.attrs[a].probs.shape[-1]), size=n
            )
            for a in cfg.attributes
        }
        targets = {
            a: as_sds(jnp.asarray(v))
            for a, v in self.make_targets(probs_dummy, rng).items()
        }
        sds = jax.ShapeDtypeStruct
        ori = {
            "face_bboxes": res3.faces.bboxes,
            "clip_feats": res3.clip_feats,
            "dino_feats": res3.dino_feats,
            "face_feats": res3.face_feats,
            "preds": {a: res3.attrs[a].preds for a in cfg.attributes},
            "probs_max": {
                a: sds(res3.attrs[a].probs.shape[:-1],
                       res3.attrs[a].probs.dtype)
                for a in cfg.attributes
            },
        }
        chunk = lambda s: sds((n_chunks, m) + tuple(s.shape[1:]), s.dtype)
        x_chunks = chunk(x_final)
        targets_c = {a: chunk(v) for a, v in targets.items()}
        ori_c = jax.tree_util.tree_map(chunk, ori)

        # pair-VJP shapes (mirror train_step's lane-chunk selection)
        if pair_lanes is not None:
            p = int(pair_lanes)
        else:
            try:
                p = int(os.environ.get("FAIRDIFF_PAIR_LANES", m))
            except ValueError:
                p = m
        if p <= 0 or n % p:
            p = m
        npc = n // p
        traj_c = sds((n_steps * npc, p) + tuple(traj.shape[2:]), traj.dtype)
        cot_c = sds(traj_c.shape, jnp.float32)
        ts = sds((n_steps * npc,), jnp.int32)

        grads = adapters
        opt_state = as_sds(state.opt_state)
        ema = as_sds(state.ema)
        decay = sds((), jnp.float32)

        return [
            ("phase1", prog1, (frozen, adapters, noises, cond, uncond)),
            ("phase3", prog3, (frozen, None, noises, cond_raw, uncond_raw)),
            ("final_grad", self._final_grad_fn(n_chunks),
             (frozen, x_chunks, targets_c, ori_c)),
            ("pair_grad", self._pair_grad_fn(n_steps, npc),
             (frozen, adapters, traj_c, ts, cot_c, cond, uncond)),
            ("update", self._update_fn(),
             (adapters, opt_state, ema, grads, decay)),
        ]

    def warmup(self, state: "DebiasState",
               prompt_ids: tuple[jax.Array, jax.Array],
               n_steps: Optional[int] = None) -> float:
        """Compile every program `train_step` will need, in PARALLEL, and
        INSTALL the executables (see _JitProgram — .lower().compile() alone
        does not make the later call fast).

        AOT compiles run from ShapeDtypeStructs: nothing executes, so no
        HBM pressure, and the XLA compile service overlaps the builds.
        Returns wall seconds spent. Best-effort: a failed program is
        reported on stderr and left to the lazy jit path.
        """
        import sys as _sys
        import threading

        t0 = time.time()
        jobs = self.aot_jobs(state, prompt_ids, n_steps)
        if not jobs:
            return 0.0
        errs: dict[str, Exception] = {}

        def run(name, prog, args):
            try:
                compiled = prog.jitted.lower(*args).compile()
                if isinstance(prog, _JitProgram):
                    prog.compiled = compiled
            except Exception as e:  # noqa: BLE001 — best-effort warmup
                errs[name] = e

        threads = [
            threading.Thread(target=run, args=j, daemon=True) for j in jobs
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for name, e in errs.items():
            print(
                f"# warmup: {name} AOT compile failed "
                f"({type(e).__name__}: {str(e)[:200]}); will compile lazily",
                file=_sys.stderr,
            )
        return time.time() - t0

    def _update_fn(self):
        if "update" not in self._jit_cache:

            def fn(adapters, opt_state, ema, grads, decay):
                updates, new_opt = self.tx.update(grads, opt_state, adapters)
                new_adapters = optax.apply_updates(adapters, updates)
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
                    ema, new_adapters,
                )
                # global L2 norms (reference's per-step wandb param-norm
                # sanity logs, exp-1:2034-2045), stacked into ONE array so
                # the host reads them in a single tunnel fetch
                l2 = lambda t: optax.global_norm(t)
                norms = jnp.stack(
                    [l2(new_adapters), l2(new_ema), l2(grads)]
                )
                return new_adapters, new_opt, new_ema, norms

            # Under a mesh, pin the outputs to the replicated sharding the
            # initial state is committed with (init_state): without this,
            # GSPMD is free to pick a different layout for the updated
            # adapters, and every program that takes adapters as input
            # recompiles at step 1 (measured: two ~30 s XLA rebuilds on the
            # 8-device CPU dryrun — the r3 driver-budget blowout's sibling).
            kw = {}
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(self.mesh, PartitionSpec())
                kw["out_shardings"] = (rep, rep, rep, rep)
            self._jit_cache["update"] = _JitProgram(jax.jit(fn, **kw))
        return self._jit_cache["update"]

    # ------------------------------------------------------------------
    @property
    def n_data_shards(self) -> int:
        return int(self.mesh.shape["data"]) if self.mesh is not None else 1

    @property
    def ot_draws(self) -> int:
        """Total OT sample draws: 100/device all-reduced in the reference
        (exp-3:1528-1535) -> per_shard * shards here, unless overridden."""
        cfg = self.cfg
        return cfg.ot_num_samples or cfg.ot_samples_per_shard * self.n_data_shards

    def make_targets(
        self, probs: dict[str, np.ndarray], step_rng: np.random.Generator
    ) -> dict[str, np.ndarray]:
        cfg = self.cfg
        th = dict(zip(cfg.attributes, cfg.uncertainty_thresholds))
        if cfg.target_kind == "binary":
            t = targets_lib.binary_rank_targets(probs["gender"], cfg.target_ratio)
            return {"gender": targets_lib.gate_targets_by_uncertainty(t, th["gender"])}
        if cfg.target_kind == "ot2":
            tg, tr = targets_lib.sampled_ot_targets_2attr(
                probs["gender"], probs["race"], step_rng, self.ot_draws
            )
            return {
                "gender": targets_lib.gate_targets_by_uncertainty(tg, th["gender"]),
                "race": targets_lib.gate_targets_by_uncertainty(tr, th["race"]),
            }
        if cfg.target_kind == "ot3":
            tg, tr, ta = targets_lib.sampled_ot_targets_3attr(
                probs["gender"], probs["race"], probs["age"], step_rng,
                self.ot_draws,
            )
            return {
                "gender": targets_lib.gate_targets_by_uncertainty(tg, th["gender"]),
                "race": targets_lib.gate_targets_by_uncertainty(tr, th["race"]),
                "age": targets_lib.gate_targets_by_uncertainty(ta, th["age"]),
            }
        if cfg.target_kind == "enum":
            t = targets_lib.enumerated_ot_targets(probs["race"])
            return {"race": targets_lib.gate_targets_by_uncertainty(t, th["race"])}
        raise ValueError(cfg.target_kind)

    # ------------------------------------------------------------------
    def train_step(
        self,
        state: DebiasState,
        prompt_ids: tuple[jax.Array, jax.Array],  # (cond_ids, uncond_ids) [1,S]
        root_key: jax.Array,
    ) -> tuple[DebiasState, dict]:
        cfg = self.cfg
        step = state.step
        n_steps = rng_lib.sample_num_denoising_steps(
            root_key, step, cfg.steps_low, cfg.steps_high
        )
        noise_key = rng_lib.noise_key(root_key, step)
        noises = jax.random.normal(
            noise_key, self.sd.latent_shape(cfg.train_images_per_prompt)
        )
        if self.mesh is not None:
            # lanes shard over the data axis; params replicated — XLA
            # inserts the grad psum the reference did by hand (exp-1:1996-2011)
            from fairdiff.parallel import shard_batch

            noises = shard_batch(self.mesh, noises)
        cond_ids_raw, uncond_ids_raw = prompt_ids
        # phases 1/4 condition on the (possibly prefixed) debiaser prompt;
        # phase 3's frozen originals use the plain prompt (exp-2:936 vs the
        # plain prompt_i in its phase 3)
        cond_ids = self._prefix_ids(cond_ids_raw)
        uncond_ids = self._match_len(uncond_ids_raw, cond_ids)

        n = cfg.train_images_per_prompt
        m = cfg.train_micro_batch
        import os

        use_linear = (
            os.environ.get("FAIRDIFF_PHASE4", "linear") == "linear"
            and n % m == 0
        )

        # ---- phase 1: current model, analyse ----
        # dispatch only — phase 3 is independent of the targets, so it is
        # enqueued before the phase-1 probs fetch: the device works through
        # phase 3 while the host waits on the tunnel + solves the OT.
        # The linearized phase 4 reuses phase 1's chain: same adapters, same
        # noises, detached UNet inputs => identical trajectory, so phase 1
        # IS phase 4's forward pass (see the linearized-phase-4 block above).
        x_final = traj = None
        with self.timers("phase1_sample_analyze"):
            if use_linear:
                _, res1, x_final, traj = self._sample_analyze_fn(
                    n_steps, True, full=False, with_latents=True
                )(state.adapters, noises, cond_ids, uncond_ids)
            else:
                _, res1 = self._sample_analyze_fn(n_steps, True, full=False)(
                    state.adapters, noises, cond_ids, uncond_ids
                )

        # ---- phase 3 dispatch: frozen model originals (plain prompt) ----
        with self.timers("phase3_frozen_sample"):
            _, res3 = self._sample_analyze_fn(n_steps, False)(
                None, noises, cond_ids_raw, uncond_ids_raw
            )

        with self.timers("phase1_probs_fetch"):
            probs_host = {
                a: np.asarray(res1.attrs[a].probs) for a in cfg.attributes
            }

        # ---- phase 2: dynamic targets (host, deterministic per step) ----
        with self.timers("phase2_targets"):
            step_rng = np.random.default_rng(cfg.seed * 1_000_003 + step)
            targets_np = self.make_targets(probs_host, step_rng)
            targets = {a: jnp.asarray(v) for a, v in targets_np.items()}
        ori = {
            "face_bboxes": res3.faces.bboxes,
            "clip_feats": res3.clip_feats,
            "dino_feats": res3.dino_feats,
            "face_feats": res3.face_feats,
            "preds": {a: res3.attrs[a].preds for a in cfg.attributes},
            "probs_max": {
                a: res3.attrs[a].probs.max(axis=-1) for a in cfg.attributes
            },
        }

        # ---- phase 4: micro-batched grads ----
        n_chunks = -(-n // m)
        logs_acc: dict[str, list] = {}
        with self.timers("phase4_backward"):
            if use_linear:
                to_chunks = lambda x: x.reshape(n_chunks, m, *x.shape[1:])
                # (a) dL/dx_final through decode+guidance+loss only
                with self.timers("phase4_loss_vjp"):
                    g_final, logs_st = self._final_grad_fn(n_chunks)(
                        to_chunks(x_final),
                        {a: to_chunks(v) for a, v in targets.items()},
                        jax.tree_util.tree_map(to_chunks, ori),
                    )
                # (b)+(c) per-step cotangents; /n_chunks matches the chain
                # path's grad normalisation (mean of chunk-means)
                with self.timers("phase4_pair_vjp"):
                    gamma = self._gamma(n_steps)  # [T]
                    gf = g_final.reshape(n, *g_final.shape[2:]) / n_chunks
                    cot = gamma[:, None, None, None, None] * gf[None]
                    # flat (step x lane-chunk) batch; lane chunk = p lanes.
                    # Under a mesh, default to ALL lanes per step-VJP so
                    # each chunk stays aligned with the data-axis sharding
                    # (a lane-slice of a sharded batch would reshard).
                    default_p = n if self.mesh is not None else m
                    try:
                        p = int(os.environ.get("FAIRDIFF_PAIR_LANES", default_p))
                    except ValueError:
                        p = default_p
                    if p <= 0 or n % p:
                        p = default_p
                    npc = n // p
                    T = int(n_steps)
                    traj_c = traj.reshape(T * npc, p, *traj.shape[2:])
                    cot_c = cot.reshape(T * npc, p, *cot.shape[2:])
                    ts = jnp.repeat(
                        jnp.asarray(
                            dpm_solver.timestep_grid(
                                self.sd.config.solver, n_steps
                            ),
                            jnp.int32,
                        ),
                        npc,
                    )
                    if getattr(self, "keep_pair_inputs", False):
                        # inspection hook (set by __graft_entry__'s
                        # dryrun): the cross-topology grad check re-runs
                        # ONLY the pair-VJP program on a second mesh with
                        # these exact inputs instead of a whole second
                        # trainer (its 5 programs blew the r3 driver
                        # budget). Holding refs extends buffer lifetimes —
                        # keep this off in production 16G-HBM runs.
                        self._last_pair_inputs = {
                            "adapters": state.adapters, "traj": traj_c,
                            "ts": ts, "cot": cot_c, "cond": cond_ids,
                            "uncond": uncond_ids, "n_steps": int(n_steps),
                            "npc": npc,
                            # the step's objective data (noises + targets +
                            # frozen-model baselines): lets the dryrun
                            # re-evaluate THIS step's exact loss surface at
                            # the post-update adapters — a deterministic
                            # descent check that fresh-noise step losses
                            # (stochastic objective) cannot give
                            "noises": noises, "targets": targets,
                            "ori": ori,
                        }
                    grads = self._pair_grad_fn(n_steps, npc)(
                        state.adapters, traj_c, ts, cot_c,
                        cond_ids, uncond_ids,
                    )
                    jax.block_until_ready(grads)
                with self.timers("phase4_log_fetch"):
                    for k, v in logs_st.items():
                        logs_acc[k] = [np.asarray(v).reshape(-1)]
            elif self.mesh is None and n % m == 0:
                # one dispatch: scan over chunks on-device
                to_chunks = lambda x: x.reshape(n_chunks, m, *x.shape[1:])
                with self.timers("phase4_device"):
                    grads, logs_st = self._grad_accum_fn(n_steps, n_chunks)(
                        state.adapters,
                        to_chunks(noises),
                        cond_ids, uncond_ids,
                        {a: to_chunks(v) for a, v in targets.items()},
                        jax.tree_util.tree_map(to_chunks, ori),
                    )
                    jax.block_until_ready(grads)
                with self.timers("phase4_log_fetch"):
                    for k, v in logs_st.items():
                        logs_acc[k] = [np.asarray(v).reshape(-1)]
            else:
                grad_fn = self._grad_fn(n_steps)
                grads = None
                for j in range(n_chunks):
                    sl = slice(j * m, min((j + 1) * m, n))
                    t_chunk = {a: v[sl] for a, v in targets.items()}
                    ori_chunk = jax.tree_util.tree_map(lambda x: x[sl], ori)
                    g, chunk_logs = grad_fn(
                        state.adapters, noises[sl], cond_ids, uncond_ids,
                        t_chunk, ori_chunk,
                    )
                    grads = g if grads is None else jax.tree_util.tree_map(
                        jnp.add, grads, g
                    )
                    for k, v in chunk_logs.items():
                        logs_acc.setdefault(k, []).append(np.asarray(v))
                grads = jax.tree_util.tree_map(lambda x: x / n_chunks, grads)

        self._last_grads = grads  # inspection/testing hook

        # ---- update: finite gate -> AdamW -> EMA ----
        # torch_ema ramp-in decay (exp-1:823-824 semantics)
        decay = min(cfg.ema_decay, (1.0 + step) / (10.0 + step))
        with self.timers("update"):
            new_adapters, new_opt, new_ema, norms = self._update_fn()(
                state.adapters, state.opt_state, state.ema, grads,
                jnp.float32(decay),
            )
            jax.block_until_ready(new_adapters)
        new_state = DebiasState(new_adapters, new_opt, new_ema, step + 1)

        norms_host = np.asarray(norms)  # one fetch for all three scalars
        logs = {
            "num_denoising_steps": n_steps,
            "adapter_norm": float(norms_host[0]),
            "ema_norm": float(norms_host[1]),
            "grad_norm": float(norms_host[2]),
            # detection rate: catches degenerate all-true/all-false states
            # (random or mis-converted detector weights) that silently
            # bypass the masked loss branches and the host OT
            "face_rate": float(np.asarray(res1.faces.indicators).mean()),
            **metrics_lib.multi_attr_metrics(
                probs_host, {a: np.asarray(res1.attrs[a].preds) for a in cfg.attributes}
            ),
        }
        for k, vs in logs_acc.items():
            v = np.concatenate(vs)
            v = v[v != -1] if k in ("loss_fair", "loss_face") else v
            if len(v):
                logs[f"train_{k}"] = float(v.mean())
        return new_state, logs

    # ------------------------------------------------------------------
    def _eval_grid(self, path, images, res) -> None:
        from fairdiff.utils import grids

        attrs = {
            a: (
                np.asarray(res.attrs[a].preds),
                np.asarray(res.attrs[a].probs).max(axis=-1),
            )
            for a in self.cfg.attributes
        }
        grids.plot_in_grid_multi(
            np.asarray(images), path, attrs,
            face_indicators=np.asarray(res.faces.indicators),
            face_bboxes=np.asarray(res.faces.bboxes),
        )

    def evaluate(
        self,
        adapters: Optional[dict],
        prompt_ids_list: list[tuple[jax.Array, jax.Array]],
        root_key: jax.Array,
        *,
        name: str = "main",
        step: int = 0,
        prompt_texts: Optional[list[str]] = None,
        grids_dir: Optional[str] = None,
        ori_grids: bool = True,
    ) -> dict:
        """Reference `evaluate_process` parity (exp-1:1449-1582): per
        eval prompt, generate with the evaluated weights AND with the
        frozen baseline on the SAME eval noises, log per-prompt and
        aggregate bias metrics, and (when grids_dir is set) write the
        annotated ori/generated grids the reference uploads to wandb."""
        cfg = self.cfg
        all_probs: dict[str, list] = {a: [] for a in cfg.attributes}
        all_preds: dict[str, list] = {a: [] for a in cfg.attributes}
        per_prompt: dict[str, float] = {}
        used_labels: set[str] = set()
        fn = self._sample_analyze_fn(
            cfg.eval_denoising_steps, adapters is not None, full=False
        )
        fn_ori = (
            self._sample_analyze_fn(cfg.eval_denoising_steps, False, full=False)
            if grids_dir and ori_grids
            else None
        )
        for i, (cond_ids, uncond_ids) in enumerate(prompt_ids_list):
            noises = jax.random.normal(
                rng_lib.noise_key(root_key, 10_000_000 + i),
                self.sd.latent_shape(cfg.val_images_per_prompt),
            )
            cond = self._prefix_ids(cond_ids) if adapters else cond_ids
            images, res = fn(
                adapters, noises, cond, self._match_len(uncond_ids, cond)
            )
            probs_i = {a: np.asarray(res.attrs[a].probs) for a in cfg.attributes}
            preds_i = {a: np.asarray(res.attrs[a].preds) for a in cfg.attributes}
            for a in cfg.attributes:
                all_probs[a].append(probs_i[a])
                all_preds[a].append(preds_i[a])
            # per-prompt metric keys (reference eval_{name}_{key}_{prompt},
            # exp-1:1556-1560)
            label = (
                prompt_texts[i] if prompt_texts and i < len(prompt_texts)
                else f"prompt{i}"
            ).strip().replace(" ", "_").replace("/", "_")[:60]
            # sanitization (truncation, space/slash folding) can collide
            # distinct prompts; a collision would silently overwrite the
            # earlier prompt's metrics and grid files
            while label in used_labels:
                label = f"{label}_p{i}"
            used_labels.add(label)
            for k, v in metrics_lib.multi_attr_metrics(probs_i, preds_i).items():
                per_prompt[f"{k}_{label}"] = v
            if grids_dir:
                from pathlib import Path as _P

                base = _P(grids_dir)
                self._eval_grid(
                    base / f"eval_{name}_{step}_{label}_generated.jpg",
                    images, res,
                )
                # frozen-baseline comparison on the same noises
                # (exp-1:1464-1501); fn_ori is None when the caller
                # already produced the identical baselines this step
                # (e.g. fit()'s EMA pass reuses the main pass's). The
                # baseline depends only on (eval root, prompt), so across
                # eval steps the rendered grid is byte-identical — copy
                # the cached file instead of re-running the generation
                if fn_ori is not None:
                    dst = base / f"eval_{name}_{step}_{label}_ori.jpg"
                    ckey = (
                        np.asarray(jax.random.key_data(root_key)).tobytes(),
                        label,
                    )
                    src = self._ori_grid_cache.get(ckey)
                    if src is not None and src.exists():
                        if src != dst:
                            import shutil

                            shutil.copyfile(src, dst)
                    else:
                        images_o, res_o = fn_ori(
                            None, noises, cond_ids, uncond_ids
                        )
                        self._eval_grid(dst, images_o, res_o)
                        self._ori_grid_cache[ckey] = dst
        probs = {a: np.concatenate(v) for a, v in all_probs.items()}
        preds = {a: np.concatenate(v) for a, v in all_preds.items()}
        out = metrics_lib.multi_attr_metrics(probs, preds)
        out.update(per_prompt)
        return out

    # ------------------------------------------------------------------
    def fit(
        self,
        state: DebiasState,
        train_prompt_ids: list[tuple[jax.Array, jax.Array]],
        val_prompt_ids: Optional[list] = None,
        max_steps: Optional[int] = None,
        checkpoint_cb: Optional[Callable[[DebiasState], None]] = None,
        val_prompt_texts: Optional[list[str]] = None,
        eval_grids: bool = True,
    ) -> DebiasState:
        cfg = self.cfg
        root = rng_lib.root_key(cfg.seed)
        max_steps = max_steps or cfg.max_train_steps
        # identical shuffle on every host (reference seed+1, exp-1:916-921).
        # On resume, fast-forward the permutation stream through the
        # completed epochs so the resumed run replays the exact prompt
        # sequence of an unbroken run (reference exp-1:1698-1724 recomputes
        # epoch/step offsets for the same reason).
        order_rng = np.random.default_rng(cfg.seed + 1)
        n_prompts = len(train_prompt_ids)
        order = order_rng.permutation(n_prompts).tolist()
        for _ in range(state.step // n_prompts):
            order = order_rng.permutation(n_prompts).tolist()
        pos = state.step % n_prompts
        while state.step < max_steps:
            if pos >= len(order):
                order = order_rng.permutation(len(train_prompt_ids)).tolist()
                pos = 0
            t0 = time.time()
            state, logs = self.train_step(
                state, train_prompt_ids[order[pos]], root
            )
            pos += 1
            logs["step_time_s"] = time.time() - t0
            # running per-phase means (device-synced; SURVEY.md §5.1)
            logs.update(
                {f"time_{k}_s": v for k, v in self.timers.summary().items()}
            )
            self.logger(state.step, logs)
            if (
                val_prompt_ids
                and cfg.eval_interval > 0  # 0 disables eval entirely
                and state.step % cfg.eval_interval == 0
            ):
                import os as _os

                grids_dir = (
                    _os.path.join(cfg.output_dir, "imgs") if eval_grids else None
                )
                ev = self.evaluate(
                    state.adapters, val_prompt_ids, root,
                    name="main", step=state.step,
                    prompt_texts=val_prompt_texts, grids_dir=grids_dir,
                )
                self.logger(state.step, {f"eval_{k}": v for k, v in ev.items()})
                ev_ema = self.evaluate(
                    state.ema, val_prompt_ids, root,
                    name="ema", step=state.step,
                    prompt_texts=val_prompt_texts, grids_dir=grids_dir,
                    # the frozen-baseline images depend only on (root,
                    # prompt) — the "main" call just wrote them
                    ori_grids=False,
                )
                self.logger(
                    state.step, {f"eval_ema_{k}": v for k, v in ev_ema.items()}
                )
            if checkpoint_cb:
                checkpoint_cb(state)
        return state
