"""Tensor parallelism over the "model" mesh axis (fairdiff.parallel.tp).

The reference never shards parameters (2-way pure DP; SURVEY.md §2.5) —
TP is a TPU-native capability added to scale activation memory past one
chip's HBM. These tests pin (a) the spec rules, (b) numerical equivalence
of a TP-sharded forward vs the replicated one on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fairdiff.parallel import MeshConfig, create_mesh
from fairdiff.parallel.tp import (
    sd_param_specs,
    shard_sd_params,
    text_encoder_param_specs,
    unet_param_specs,
    validate_heads,
)
from fairdiff.sampling.pipeline import SDConfig, StableDiffusion


def _collect(tree, path=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_collect(v, path + (k,)))
        return out
    return {"/".join(path): tree}


def _tiny_unet_params():
    from fairdiff.models.unet2d import UNet2DCondition, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels)),
        jnp.array([0]),
        jnp.zeros((1, 4, cfg.cross_attention_dim)),
    )["params"]
    return model, cfg, params


def test_unet_spec_rules():
    model, cfg, params = _tiny_unet_params()
    specs = _collect(unet_param_specs(params, 2, cfg.attention_head_dim))
    qkv = [k for k in specs if k.split("/")[-2:-1][0] in ("to_q", "to_k", "to_v")]
    outs = [k for k in specs if "to_out" in k and k.endswith("kernel")]
    assert qkv and outs, "tiny UNet has attention params"
    for k in qkv:
        assert specs[k][-1] == "model", k  # column split
    for k in outs:
        assert specs[k][0] == "model", k  # row split
    # convs / norms / GEGLU stay replicated
    for k, s in specs.items():
        if "attn" not in k:
            assert s == P(), k
    # spec tree must be placeable against the param tree
    jax.tree_util.tree_map(
        lambda x, s: None, params, unet_param_specs(params, 2, 2),
        is_leaf=lambda x: isinstance(x, P),
    )


def test_head_divisibility_guard():
    model, cfg, params = _tiny_unet_params()
    with pytest.raises(ValueError, match="not divisible"):
        unet_param_specs(params, 3, cfg.attention_head_dim)
    with pytest.raises(ValueError, match="not divisible"):
        validate_heads(SDConfig.sd15(), 3)
    validate_heads(SDConfig.sd15(), 2)  # UNet 8 / TE 12 heads
    validate_heads(SDConfig.sd15(), 4)


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_unet_forward_tp_matches_replicated():
    """Sharding attention params over ("data"=4, "model"=2) must not change
    the UNet's output (XLA inserts the head-shard psums)."""
    model, cfg, params = _tiny_unet_params()
    B = 4
    x = jax.random.normal(
        jax.random.key(1), (B, cfg.sample_size, cfg.sample_size, cfg.in_channels)
    )
    t = jnp.full((B,), 7, jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 4, cfg.cross_attention_dim))

    fn = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
    ref = np.asarray(fn(params, x, t, ctx))

    mesh = create_mesh(MeshConfig(data=4, model=2))
    specs = unet_param_specs(params, 2, cfg.attention_head_dim)
    sharded = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda a: isinstance(a, P),
    )
    batch_sh = NamedSharding(mesh, P("data"))
    out = np.asarray(fn(
        sharded,
        jax.device_put(x, batch_sh),
        jax.device_put(t, batch_sh),
        jax.device_put(ctx, batch_sh),
    ))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_text_encoder_tp_matches_replicated():
    sd = StableDiffusion(SDConfig.tiny())
    params = sd.init_params(jax.random.key(0))
    ids = jnp.array([[0, 5, 6, 63], [0, 7, 63, 63]], jnp.int32)
    fn = jax.jit(lambda p, i: sd.text_encoder.apply({"params": p}, i))
    ref = np.asarray(fn(params["text_encoder"], ids)["last_hidden_state"])

    mesh = create_mesh(MeshConfig(data=2, model=4))  # TE tiny: 4 heads
    specs = text_encoder_param_specs(
        params["text_encoder"], 4, sd.config.text.num_attention_heads
    )
    sharded = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params["text_encoder"], specs, is_leaf=lambda a: isinstance(a, P),
    )
    out = np.asarray(
        fn(sharded, jax.device_put(ids, NamedSharding(mesh, P("data"))))[
            "last_hidden_state"
        ]
    )
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_shard_sd_params_full_tree():
    """shard_sd_params places every leaf; VAE stays replicated; model=1
    degenerates to replication."""
    sd = StableDiffusion(SDConfig.tiny())
    params = sd.init_params(jax.random.key(0))
    mesh = create_mesh(MeshConfig(data=4, model=2))
    placed = shard_sd_params(mesh, params, sd.config)
    flat = _collect(placed)
    assert any(
        "model" in (s.sharding.spec or ()) for k, s in flat.items()
        if "unet" in k and "to_q" in k
    )
    for k, leaf in flat.items():
        if k.startswith("vae"):
            assert leaf.sharding.spec == P(), k
    specs = sd_param_specs(params, sd.config)
    assert set(specs) == set(params)


@pytest.mark.slow
def test_unet_tp_with_flash_attention(monkeypatch):
    """Full tiny UNet under dp=4 x tp=2 with the flash kernel ON (interpret
    mode, threshold lowered so tiny seqs take the flash path): the
    custom_partitioning declaration must keep TP numerics identical to the
    replicated flash forward, with the head-sharded activations flowing
    into the kernel."""
    import functools

    from jax.experimental import pallas as pl

    import fairdiff.models.layers as layers_mod
    from fairdiff.models.unet2d import UNet2DCondition, UNetConfig

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    monkeypatch.setattr(layers_mod, "FLASH_MIN_KV", 1)

    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg, use_flash=True)
    B = 4
    x = jax.random.normal(
        jax.random.key(1), (B, cfg.sample_size, cfg.sample_size, cfg.in_channels)
    )
    t = jnp.full((B,), 7, jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (B, 4, cfg.cross_attention_dim))
    params = model.init(jax.random.key(0), x, t, ctx)["params"]

    fn = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
    ref = np.asarray(fn(params, x, t, ctx))

    mesh = create_mesh(MeshConfig(data=4, model=2))
    specs = unet_param_specs(params, 2, cfg.attention_head_dim)
    sharded = jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda a: isinstance(a, P),
    )
    batch_sh = NamedSharding(mesh, P("data"))
    out = np.asarray(fn(
        sharded,
        jax.device_put(x, batch_sh),
        jax.device_put(t, batch_sh),
        jax.device_put(ctx, batch_sh),
    ))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
