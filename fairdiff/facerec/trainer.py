"""Face-recognition classifier training — opensphere's IterRunner,
TPU-native.

Reference (opensphere/runner.py:21-196 + train.py + builder.py): iteration-
based trainer, backbone -> margin head loss, per-module gradient clipping,
SGD + MultiStepLR, periodic validation building a distributed-all-reduced
feature table. Torch DDP/mp.spawn becomes one jitted step over the data
mesh; the head-weight projection (in-place normalize every forward) is an
explicit projection after each update.

This is the secondary training utility (SURVEY.md: the main pipeline only
needs the frozen backbone), but it makes fairdiff self-hosting: the face
embedder, attribute classifiers, and detector can all be (re)trained here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fairdiff.fairness import margin_heads
from fairdiff.guidance.face_feats import face_embeddings


@dataclasses.dataclass(frozen=True)
class FaceRecConfig:
    head: str = "sphereface"  # any fairdiff.fairness.margin_heads.HEADS key
    head_kwargs: tuple = ()
    feat_dim: int = 512
    num_classes: int = 1000
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    lr_decay_steps: tuple[int, ...] = (40000, 60000, 70000)
    lr_decay_rate: float = 0.1
    max_iters: int = 80000
    clip_grad_norm: float = 1e5  # opensphere clips per module
    val_interval: int = 2000
    seed: int = 0


class FaceRecTrainer:
    def __init__(self, backbone, config: FaceRecConfig, *, mesh=None):
        self.backbone = backbone
        self.cfg = config
        self.mesh = mesh
        self.head_fn = margin_heads.HEADS[config.head]
        self.head_kwargs = dict(config.head_kwargs)

        schedule = optax.piecewise_constant_schedule(
            config.lr,
            {int(s): config.lr_decay_rate for s in config.lr_decay_steps},
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.clip_grad_norm),
            optax.sgd(schedule, momentum=config.momentum),
        )
        self._step_fn = None

    def init_state(self, key: jax.Array, sample_image: jax.Array) -> dict:
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        backbone_params = self.backbone.init(k1, sample_image)["params"]
        # xavier-normal head weight (reference heads)
        scale = (2.0 / (cfg.feat_dim + cfg.num_classes)) ** 0.5
        head_w = jax.random.normal(k2, (cfg.feat_dim, cfg.num_classes)) * scale
        head_w = margin_heads.normalize_head_weight(head_w)
        params = {"backbone": backbone_params, "head_w": head_w}
        if cfg.head == "sphereface2":
            # the bias init formula must use the SAME hyperparameters the
            # loss runs with (opensphere passes its cfg to both)
            init_keys = ("magn_type", "alpha", "r", "m", "t")
            init_kwargs = {
                k: v for k, v in self.head_kwargs.items() if k in init_keys
            }
            params["head_b"] = jnp.float32(
                margin_heads.sphereface2_bias_init(
                    cfg.num_classes, **init_kwargs
                )
            )
        return {"params": params, "opt": self.tx.init(params), "step": 0}

    def _loss(self, params, images, labels):
        feats = self.backbone.apply({"params": params["backbone"]}, images)
        wd = self.cfg.weight_decay * 0.5 * sum(
            (w**2).sum()
            for w in jax.tree_util.tree_leaves(params["backbone"])
        )
        if self.cfg.head == "sphereface2":
            loss = self.head_fn(
                params["head_w"], params["head_b"], feats, labels,
                **self.head_kwargs,
            )
        else:
            loss = self.head_fn(params["head_w"], feats, labels, **self.head_kwargs)
        return loss + wd, loss

    def train_step(self, state: dict, images: jax.Array, labels: jax.Array):
        if self._step_fn is None:

            def step(params, opt, images, labels):
                (total, raw), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, images, labels)
                updates, opt = self.tx.update(grads, opt, params)
                params = optax.apply_updates(params, updates)
                # project head weight back to the sphere (the reference's
                # in-place normalize before every forward)
                params = dict(params)
                params["head_w"] = margin_heads.normalize_head_weight(
                    params["head_w"]
                )
                return params, opt, raw

            self._step_fn = jax.jit(step)
        if self.mesh is not None:
            from fairdiff.parallel import shard_batch

            images, labels = shard_batch(self.mesh, (images, labels))
        params, opt, loss = self._step_fn(
            state["params"], state["opt"], images, labels
        )
        return {"params": params, "opt": opt, "step": state["step"] + 1}, float(loss)

    def fit(
        self,
        state: dict,
        batches: Iterator[tuple[np.ndarray, np.ndarray]],
        *,
        max_iters: Optional[int] = None,
        log_every: int = 100,
        logger: Callable[[int, dict], None] = lambda s, l: None,
        val_fn: Optional[Callable[[dict], dict]] = None,
        checkpoint_cb: Optional[Callable[[dict], None]] = None,
        save_interval: int = 1,
    ) -> dict:
        """save_interval gates checkpoint_cb like val_interval gates
        val_fn (opensphere saves only at cfg save_iters,
        opensphere/runner.py:191) — a state-saving callback must not run
        every iteration."""
        max_iters = max_iters or self.cfg.max_iters
        while state["step"] < max_iters:
            images, labels = next(batches)
            state, loss = self.train_step(
                state, jnp.asarray(images), jnp.asarray(labels)
            )
            if state["step"] % log_every == 0:
                logger(state["step"], {"loss": loss})
            if val_fn and state["step"] % self.cfg.val_interval == 0:
                logger(state["step"], val_fn(state))
            if checkpoint_cb and state["step"] % max(save_interval, 1) == 0:
                checkpoint_cb(state)
        return state

    def extract_features(self, state: dict, images: jax.Array) -> jax.Array:
        """Flip-sum normalised features (test.py:30-39 / runner val)."""
        return face_embeddings(
            lambda x: self.backbone.apply({"params": state["params"]["backbone"]}, x),
            images,
        )
