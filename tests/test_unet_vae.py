"""SD U-Net & VAE: shape/jit/grad tests + converter validation.

- numeric checks of the torch->flax conv/norm conversion vs torch ops
- structural round-trip: synthesize a diffusers-layout state dict from the
  flax init tree (inverse mapping), convert, and require exact tree match.
"""

import re

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairdiff.io import torch_convert as tc
from fairdiff.io.sd_loader import convert_unet, convert_vae
from fairdiff.models.autoencoder_kl import AutoencoderKL, VAEConfig
from fairdiff.models.unet2d import UNet2DCondition, UNetConfig, timestep_embedding


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_unet_forward_shapes_and_jit():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([3, 999])
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.key(0), x, t, ctx)
    out = jax.jit(lambda p: model.apply(p, x, t, ctx))(params)
    assert out.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_unet_remat_grad():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg, remat=True)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.key(0), x, jnp.array([5]), ctx)

    def loss(p):
        return model.apply(p, x, jnp.array([5]), ctx).sum()

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_timestep_embedding_matches_reference_formula():
    # spot-check against the published diffusers formula
    emb = timestep_embedding(jnp.array([0.0, 1.0, 50.0]), 8)
    assert emb.shape == (3, 8)
    # t=0: cos part = 1, sin part = 0 under flip_sin_to_cos
    np.testing.assert_allclose(np.asarray(emb[0]), [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)


def test_vae_shapes_roundtrip():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    params = model.init(jax.random.key(1), x)
    mean, logvar = model.apply(params, x, method=model.encode)
    assert mean.shape == (1, 4, 4, 4) and logvar.shape == (1, 4, 4, 4)
    img = model.apply(params, mean, method=model.decode)
    assert img.shape == (1, 32, 32, 3)


# ---------------------------------------------------------------------------
# torch numeric parity of conversion primitives
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


def test_conv_conversion_numeric():
    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    x = torch.randn(2, 3, 8, 8)
    with torch.no_grad():
        ref = tconv(x).numpy()
    import flax.linen as nn

    sd = {f"c.{k}": v for k, v in tconv.state_dict().items()}
    params = {"params": tc.conv(sd, "c")}
    conv = nn.Conv(5, (3, 3), strides=2, padding=1)
    out = conv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_groupnorm_conversion_numeric():
    tgn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        tgn.weight.mul_(1.7).add_(0.1)
        tgn.bias.add_(0.3)
    x = torch.randn(2, 8, 4, 4)
    with torch.no_grad():
        ref = tgn(x).numpy()
    import flax.linen as nn

    sd = {f"g.{k}": v for k, v in tgn.state_dict().items()}
    params = {"params": tc.norm(sd, "g")}
    out = nn.GroupNorm(4).apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4)


# ---------------------------------------------------------------------------
# structural converter round-trip (flax init -> synthetic torch sd -> convert)
# ---------------------------------------------------------------------------

_UNET_RULES = [
    (r"^down_(\d+)_resnet_(\d+)$", r"down_blocks.\1.resnets.\2"),
    (r"^down_(\d+)_attn_(\d+)$", r"down_blocks.\1.attentions.\2"),
    (r"^down_(\d+)_downsample$", r"down_blocks.\1.downsamplers.0"),
    (r"^mid_resnet_(\d+)$", r"mid_block.resnets.\1"),
    (r"^mid_attn_0$", r"mid_block.attentions.0"),
    (r"^up_(\d+)_resnet_(\d+)$", r"up_blocks.\1.resnets.\2"),
    (r"^up_(\d+)_attn_(\d+)$", r"up_blocks.\1.attentions.\2"),
    (r"^up_(\d+)_upsample$", r"up_blocks.\1.upsamplers.0"),
    (r"^transformer_blocks_0$", r"transformer_blocks.0"),
    (r"^to_out$", r"to_out.0"),
    (r"^ff$", r"ff"),
    (r"^proj$", r"net.0.proj"),
    (r"^out$", r"net.2"),
]


def _to_torch_key(path: tuple[str, ...]) -> str:
    parts = []
    for name in path:
        mapped = name
        for pat, rep in _UNET_RULES:
            if re.match(pat, name):
                mapped = re.sub(pat, rep, name)
                break
        parts.append(mapped)
    return ".".join(parts)


_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias", "embedding": "weight"}


def _synth_torch_sd(params: dict) -> dict:
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [p.key for p in path]
        leaf_name = keys[-1]
        torch_key = _to_torch_key(tuple(keys[:-1])) + "." + _LEAF[leaf_name]
        arr = np.asarray(leaf)
        if leaf_name == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        sd[torch_key] = arr
    return sd


def test_unet_converter_roundtrip():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 4, cfg.cross_attention_dim))
    params = model.init(jax.random.key(0), x, jnp.array([1]), ctx)["params"]
    sd = _synth_torch_sd(params)
    recovered = convert_unet(sd, cfg)
    chex.assert_trees_all_close(params, jax.tree.map(jnp.asarray, recovered), atol=0)


_VAE_RULES = [
    (r"^down_(\d+)_resnet_(\d+)$", r"down_blocks.\1.resnets.\2"),
    (r"^down_(\d+)_downsample$", r"down_blocks.\1.downsamplers.0.conv"),
    (r"^up_(\d+)_resnet_(\d+)$", r"up_blocks.\1.resnets.\2"),
    (r"^up_(\d+)_upsample$", r"up_blocks.\1.upsamplers.0"),
    (r"^mid_resnet_(\d+)$", r"mid_block.resnets.\1"),
    (r"^mid_attn$", r"mid_block.attentions.0"),
    (r"^to_out$", r"to_out.0"),
]


def test_vae_converter_roundtrip():
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.key(0), x)["params"]

    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [p.key for p in path]
        leaf_name = keys[-1]
        parts = []
        for name in keys[:-1]:
            mapped = name
            for pat, rep in _VAE_RULES:
                if re.match(pat, name):
                    mapped = re.sub(pat, rep, name)
                    break
            parts.append(mapped)
        torch_key = ".".join(parts) + "." + _LEAF[leaf_name]
        arr = np.asarray(leaf)
        if leaf_name == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        sd[torch_key] = arr
    recovered = convert_vae(sd, cfg)
    chex.assert_trees_all_close(params, jax.tree.map(jnp.asarray, recovered), atol=0)


# ---------------------------------------------------------------------------
# activation-level goldens vs hand-written torch diffusers-0.19.3 blocks
# (tests/torch_refs.py). These catch what the structural round-trip cannot:
# wrong skip-concat order, head-reshape order, norm epsilons, GEGLU gate
# order, VAE asymmetric downsample pad — any of which converts cleanly but
# produces garbage with real weights (reference consumption: exp-1:722-794).
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")


def _torch_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_unet_torch_activation_golden():
    from torch_refs import TUNet

    cfg = UNetConfig.tiny()
    torch.manual_seed(0)
    tm = TUNet(cfg).eval()
    params = convert_unet(_torch_sd(tm), cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, cfg.sample_size, cfg.sample_size, 4)).astype(np.float32)
    ctx = rng.normal(size=(2, 5, cfg.cross_attention_dim)).astype(np.float32)
    t = np.array([3, 747], np.int64)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        ).numpy().transpose(0, 2, 3, 1)

    model = UNet2DCondition(cfg)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_vae_torch_activation_golden():
    from torch_refs import TVAE

    cfg = VAEConfig.tiny()
    torch.manual_seed(0)
    tm = TVAE(cfg).eval()
    params = convert_vae(_torch_sd(tm), cfg)
    model = AutoencoderKL(cfg)
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    rng = np.random.default_rng(2)
    img = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        moments_ref = tm.encode_moments(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    mean, logvar = model.apply(variables, jnp.asarray(img), method=model.encode)
    mean_ref, logvar_ref = np.split(moments_ref, 2, axis=-1)
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logvar), np.clip(logvar_ref, -30, 20), rtol=1e-4, atol=1e-4
    )

    z = rng.normal(size=(2, 2, 2, cfg.latent_channels)).astype(np.float32)
    with torch.no_grad():
        dec_ref = tm.decode(
            torch.from_numpy(z.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    dec = model.apply(variables, jnp.asarray(z), method=model.decode)
    np.testing.assert_allclose(np.asarray(dec), dec_ref, rtol=1e-4, atol=1e-4)
