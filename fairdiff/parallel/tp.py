"""Tensor parallelism over the mesh's "model" axis (Megatron-style).

The reference is strictly data-parallel (2-way DP over A100s; SURVEY.md
§2.5) — its trainable state is tiny LoRA/prefix trees, so *parameter*
memory never forces sharding. On TPU the binding constraint is different:
the 16G-HBM v5e bounds how many differentiable-sampling lanes fit in one
pair-VJP (PERF.md "TP scaling evidence": 0.944 GB/lane + 3.18 GB fixed,
max 13 lanes). What each axis buys, per the r4 AOT measurements:

  - the DATA axis is the micro-batch memory lever: pair lanes are
    embarrassingly parallel, so each chip carries local_lanes x
    0.944 GB with no cross-chip term — 2 chips run the full 24-lane
    production batch in one dispatch per step.
  - the MODEL axis shards the transformer-block slice of the program
    (attention + TE MLP, kept on the flash path via
    custom_partitioning below) — its value is latency scaling at fixed
    batch and parameter/optimizer sharding headroom, NOT micro-batch
    relief: the allocations that actually bind at p=12 are conv/GN/
    resblock hiddens (r3 OOM dump), which are batch-dim'd and
    replicate under "model". The CPU-mesh AOT sweep confirms model=2
    does not shrink (and on the XLA einsum lowering slightly grows)
    the per-device temp bytes of the step-VJP.

Both axes compose in one ("data", "model") mesh — a capability the
reference never needed and never had.

The scheme is the classic column/row split, expressed purely as
`PartitionSpec`s on the parameter pytree; XLA's SPMD partitioner inserts
the psums (after every attention out-projection and MLP down-projection)
and propagates head sharding through the [B,S,H*D] -> [B,S,H,D] reshapes:

  attention q/k/v kernels  [C, H*D]   -> P(None, "model")   (column: heads)
  attention out kernel     [H*D, C]   -> P("model", None)   (row + psum)
  TE MLP fc1 kernel        [C, 4C]    -> P(None, "model")   (column)
  TE MLP fc2 kernel        [4C, C]    -> P("model", None)   (row + psum)
  everything else (convs, norms, embeddings, biases of row-split layers)
                                      -> P()                (replicated)

The UNet's GEGLU feed-forward is deliberately NOT sharded: its `proj`
kernel packs [value; gate] halves contiguously ([C, 2*inner]), so a naive
column split puts `h` and `gate` on different shards and the elementwise
`h * gelu(gate)` would reshard every call; an interleaved layout would fix
that but breaks the mechanical diffusers weight-converter parity
(fairdiff/io). Attention dominates the UNet's transformer cost anyway.

Head divisibility: the number of attention heads must divide by the model
axis size (SD-1.5: UNet 8 heads, TE 12 heads -> model in {1,2,4}).

Pallas note: the flash-attention kernel is a custom call that GSPMD cannot
partition on its own, so `ops/flash_attention.py` declares the kernel's
(batch, head) embarrassing parallelism via `custom_partitioning` — under
model>1 each shard runs the unmodified kernel on its local head slice,
no gather inserted, and TP keeps the fast attention path.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (module-name, leaf-name) -> spec factory. Column-split biases follow
# their kernel's output sharding; row-split layers keep replicated biases
# (the bias add happens after the psum).
_COL = ("model",)  # shard the LAST kernel dim / the bias dim
_ROW = ("model", None)  # shard the FIRST kernel dim

_UNET_RULES = {
    "to_q": "col",
    "to_k": "col",
    "to_v": "col",
    "to_out": "row",
}
_TE_RULES = {
    "q_proj": "col",
    "k_proj": "col",
    "v_proj": "col",
    "out_proj": "row",
    "fc1": "col",
    "fc2": "row",
}


def _spec_for(rule: str, leaf_name: str, ndim: int) -> P:
    if rule == "col":
        if leaf_name == "kernel":
            return P(*([None] * (ndim - 1) + ["model"]))
        if leaf_name == "bias":
            return P("model")
    elif rule == "row":
        if leaf_name == "kernel":
            return P(*(["model"] + [None] * (ndim - 1)))
        if leaf_name == "bias":
            return P()
    return P()


def _build_specs(tree: Any, rules: dict, path: tuple = ()) -> Any:
    if isinstance(tree, dict):
        return {
            k: _build_specs(v, rules, path + (k,)) for k, v in tree.items()
        }
    rule = rules.get(path[-2]) if len(path) >= 2 else None
    if rule is not None:
        return _spec_for(rule, path[-1], getattr(tree, "ndim", 0))
    return P()


def unet_param_specs(params: dict, model_size: int, num_heads: int) -> Any:
    """PartitionSpec tree for a UNet2DCondition param tree.

    Shards every spatial-transformer attention (attn1 self / attn2 cross,
    models/unet2d.py) over the "model" axis; convs/norms/time-emb stay
    replicated (they are batch-parallel over "data" already).
    """
    if num_heads % model_size:
        raise ValueError(
            f"UNet heads {num_heads} not divisible by model axis {model_size}"
        )
    return _build_specs(params, _UNET_RULES)


def text_encoder_param_specs(
    params: dict, model_size: int, num_heads: int
) -> Any:
    """PartitionSpec tree for a CLIPTextModel param tree (attention + MLP)."""
    if num_heads % model_size:
        raise ValueError(
            f"TE heads {num_heads} not divisible by model axis {model_size}"
        )
    return _build_specs(params, _TE_RULES)


def sd_param_specs(params: dict, config) -> dict:
    """Specs for a full StableDiffusion param tree ({text_encoder, unet,
    vae}). The VAE is replicated: it runs no-grad in phases 1/3 and its
    per-image decode is already memory-bounded by `lax.map` chunking.

    `config` is the SDConfig (for head counts); the model axis size is
    validated at placement time by `shard_sd_params`.
    """
    rules = {"unet": _UNET_RULES, "text_encoder": _TE_RULES}
    return {
        k: _build_specs(v, rules[k]) if k in rules
        else jax.tree_util.tree_map(lambda _: P(), v)
        for k, v in params.items()
    }


def validate_heads(config, model_size: int) -> None:
    """Raise unless every sharded-attention head count divides the axis."""
    for name, heads in (
        ("unet", config.unet.attention_head_dim),
        ("text_encoder", config.text.num_attention_heads),
    ):
        if heads % model_size:
            raise ValueError(
                f"{name} has {heads} attention heads, not divisible by "
                f"model axis size {model_size}"
            )


def shard_sd_params(mesh: Mesh, params: dict, config) -> dict:
    """Place a StableDiffusion param tree on the mesh with TP shardings.

    With model axis size 1 this degenerates to full replication (specs all
    resolve to single-shard placements), so callers can use it
    unconditionally under any ("data", "model") mesh.
    """
    model_size = int(mesh.shape.get("model", 1))
    if model_size > 1:
        validate_heads(config, model_size)
    specs = sd_param_specs(params, config)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
