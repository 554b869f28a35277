"""Importing the reference's exported .pth adapters into fairdiff trees.

State dicts are synthesized with the reference's exact key layouts
(2-export-checkpoint.py: diffusers _modify_text_encoder names for the TE,
AttnProcsLayers.state_dict() names for the UNet, FairEmbeddings for the
prefix) and must land at the right fairdiff tree paths so apply_lora
merges them.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.adapters import lora as lora_lib
from fairdiff.io import reference_adapters as ra
from fairdiff.sampling.pipeline import SDConfig, StableDiffusion


def _tiny_params():
    sd = StableDiffusion(SDConfig.tiny())
    return sd, sd.init_params(jax.random.key(0))


def test_te_lora_import_roundtrip():
    sd, params = _tiny_params()
    rank = 2
    n_layers = sd.config.text.num_hidden_layers
    hidden = sd.config.text.hidden_size
    inter = sd.config.text.intermediate_size
    rng = np.random.default_rng(0)

    ref_sd = {}
    for i in range(n_layers):
        for proj, d_in, d_out in [
            ("self_attn.q_proj", hidden, hidden),
            ("self_attn.k_proj", hidden, hidden),
            ("self_attn.v_proj", hidden, hidden),
            ("self_attn.out_proj", hidden, hidden),
            ("mlp.fc1", hidden, inter),
            ("mlp.fc2", inter, hidden),
        ]:
            base = f"text_model.encoder.layers.{i}.{proj}.lora_linear_layer"
            ref_sd[f"{base}.down.weight"] = rng.normal(
                size=(rank, d_in)
            ).astype(np.float32)
            ref_sd[f"{base}.up.weight"] = rng.normal(
                size=(d_out, rank)
            ).astype(np.float32)

    kind, tree = ra.load_reference_adapters(ref_sd)
    assert kind == "te_lora"
    # shape-compatible with the fairdiff TE LoRA surface
    ours = lora_lib.init_lora(
        params["text_encoder"], lora_lib.text_encoder_targets, rank,
        jax.random.key(1),
    )
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, tree)
    ) == jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, ours))
    # placement: a marked weight lands where named
    got = tree["layers_1"]["mlp"]["fc1"]["down"]
    want = ref_sd[
        "text_model.encoder.layers.1.mlp.fc1.lora_linear_layer.down.weight"
    ].T
    np.testing.assert_array_equal(got, want)
    # and it merges
    merged = lora_lib.apply_lora(
        params["text_encoder"], jax.tree.map(jnp.asarray, tree)
    )
    assert merged["layers_0"]["self_attn"]["q_proj"]["kernel"].shape == (
        hidden, hidden,
    )


def test_unet_lora_import_roundtrip():
    sd, params = _tiny_params()
    cfg = sd.config.unet
    rank = 2
    rng = np.random.default_rng(1)

    def add_block(ref_sd, ref_name, channels):
        for k, ctx_dim in (("1", channels), ("2", cfg.cross_attention_dim)):
            for proj, d_in in (
                ("q", channels), ("k", ctx_dim), ("v", ctx_dim),
                ("out", channels),
            ):
                base = (
                    f"{ref_name}.transformer_blocks.0.attn{k}.processor."
                    f"to_{proj}_lora"
                )
                ref_sd[f"{base}.down.weight"] = rng.normal(
                    size=(rank, d_in)
                ).astype(np.float32)
                ref_sd[f"{base}.up.weight"] = rng.normal(
                    size=(channels, rank)
                ).astype(np.float32)

    ref_sd = {}
    ch = cfg.block_out_channels
    for i, has in enumerate(cfg.cross_attn_down):
        if has:
            for j in range(cfg.layers_per_block):
                add_block(ref_sd, f"down_blocks.{i}.attentions.{j}", ch[i])
    add_block(ref_sd, "mid_block.attentions.0", ch[-1])
    rev = tuple(reversed(ch))
    for i, has in enumerate(cfg.cross_attn_up):
        if has:
            for j in range(cfg.layers_per_block + 1):
                add_block(ref_sd, f"up_blocks.{i}.attentions.{j}", rev[i])

    kind, tree = ra.load_reference_adapters(ref_sd)
    assert kind == "unet_lora"
    ours = lora_lib.init_lora(
        params["unet"], lora_lib.unet_attention_targets, rank,
        jax.random.key(2),
    )
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, tree)
    ) == jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, ours))
    merged = lora_lib.apply_lora(
        params["unet"], jax.tree.map(jnp.asarray, tree)
    )
    # merged forward still runs
    model_out = sd.unet.apply(
        {"params": merged},
        jnp.zeros((1, 8, 8, 4)), jnp.array([3]),
        jnp.zeros((1, 4, cfg.cross_attention_dim)),
    )
    assert model_out.shape == (1, 8, 8, 4)


def test_prefix_import():
    table = np.random.default_rng(2).normal(size=(6, 32)).astype(np.float32)
    kind, got = ra.load_reference_adapters({"token_embedding.weight": table})
    assert kind == "prefix"
    np.testing.assert_array_equal(got, table)


def test_save_load_roundtrip():
    """Export to the reference layout and re-import: identity."""
    import chex

    sd, params = _tiny_params()
    te = lora_lib.init_lora(
        params["text_encoder"], lora_lib.text_encoder_targets, 2,
        jax.random.key(3),
    )
    back = ra.load_reference_te_lora(
        ra.save_reference_te_lora(jax.tree.map(np.asarray, te))
    )
    chex.assert_trees_all_close(jax.tree.map(np.asarray, te), back, atol=0)

    un = lora_lib.init_lora(
        params["unet"], lora_lib.unet_attention_targets, 2, jax.random.key(4)
    )
    back_u = ra.load_reference_unet_lora(
        ra.save_reference_unet_lora(jax.tree.map(np.asarray, un))
    )
    chex.assert_trees_all_close(jax.tree.map(np.asarray, un), back_u, atol=0)
