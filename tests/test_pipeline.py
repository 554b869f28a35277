"""End-to-end tiny pipeline tests: generate() under jit, LoRA/prefix paths,
grad-mode differentiability, and data-parallel sharding on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairdiff.adapters import lora as lora_lib
from fairdiff.parallel import create_mesh, shard_batch
from fairdiff.sampling.pipeline import SDConfig, StableDiffusion


def _setup():
    sd = StableDiffusion(SDConfig.tiny())
    params = sd.init_params(jax.random.key(0))
    noises = jax.random.normal(jax.random.key(1), sd.latent_shape(2))
    cond = jnp.array([[0, 5, 6, 63]], jnp.int32)
    uncond = jnp.array([[0, 63, 1, 1]], jnp.int32)
    return sd, params, noises, cond, uncond


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_generate_shapes_and_determinism():
    sd, params, noises, cond, uncond = _setup()
    gen = jax.jit(
        lambda p, n: sd.generate(p, n, cond, uncond, num_steps=3)
    )
    img1 = gen(params, noises)
    img2 = gen(params, noises)
    assert img1.shape == (2, 64, 64, 3)
    assert float(img1.min()) >= -1.0 and float(img1.max()) <= 1.0
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2))


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_generate_with_lora_and_grad():
    sd, params, noises, cond, uncond = _setup()
    unet_lora = lora_lib.init_lora(
        params["unet"], lora_lib.unet_attention_targets, 2, jax.random.key(2)
    )
    te_lora = lora_lib.init_lora(
        params["text_encoder"], lora_lib.text_encoder_targets, 2, jax.random.key(3)
    )

    def loss(ul, tl):
        img = sd.generate(
            params, noises, cond, uncond, 3,
            unet_lora=ul, te_lora=tl, grad_mode=True,
        )
        return (img**2).mean()

    g_unet, g_te = jax.jit(jax.grad(loss, argnums=(0, 1)))(unet_lora, te_lora)
    for g in (g_unet, g_te):
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_generate_data_parallel():
    sd, params, _, cond, uncond = _setup()
    mesh = create_mesh()
    noises = jax.random.normal(jax.random.key(1), sd.latent_shape(8))
    noises = shard_batch(mesh, noises)
    img = jax.jit(lambda p, n: sd.generate(p, n, cond, uncond, 2))(params, noises)
    assert img.shape == (8, 64, 64, 3)
    # per-sample independence: same noise rows give same images regardless
    # of batch placement
    solo = jax.jit(lambda p, n: sd.generate(p, n, cond, uncond, 2))(
        params, jax.device_put(noises[:1])
    )
    np.testing.assert_allclose(
        np.asarray(img[0]), np.asarray(solo[0]), atol=2e-4
    )


def test_eos_attention_mask_derivation():
    """Derived mask == the tokenizer's attention_mask (CLIP pads with eos):
    valid through the FIRST eos; prefix ids (>= vocab) are real tokens."""
    from fairdiff.sampling.pipeline import eos_attention_mask

    eos = 63
    ids = jnp.asarray(
        [
            [0, 5, 6, eos, eos, eos],   # normal prompt
            [0, eos, eos, eos, eos, eos],  # uncond ""
            [0, 70, 71, 5, eos, eos],   # prefix ids 70/71 >= vocab
            [0, 1, 2, 3, 4, 5],         # no eos (truncated) -> all valid
        ]
    )
    m = np.asarray(eos_attention_mask(ids, eos))
    np.testing.assert_array_equal(
        m,
        [
            [1, 1, 1, 1, 0, 0],
            [1, 1, 0, 0, 0, 0],
            [1, 1, 1, 1, 1, 0],
            [1, 1, 1, 1, 1, 1],
        ],
    )


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_unet_context_mask_excludes_pad_positions():
    """With a key mask, UNet cross-attention must be invariant to the
    context content at masked positions — the static-77 equivalent of the
    reference's compact-length contexts (exp-1:1010-1027)."""
    from fairdiff.models.unet2d import UNet2DCondition, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    t = jnp.array([5, 9])
    ctx = jnp.asarray(rng.normal(size=(2, 6, cfg.cross_attention_dim)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0]])
    params = model.init(jax.random.key(0), x, t, ctx)

    out1 = model.apply(params, x, t, ctx, mask)
    garbage = ctx + 100.0 * jnp.asarray(
        rng.normal(size=ctx.shape), jnp.float32
    ) * (1 - mask)[:, :, None]
    out2 = model.apply(params, x, t, garbage, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # and the mask must actually do something vs unmasked
    out3 = model.apply(params, x, t, ctx)
    assert float(jnp.abs(out1 - out3).max()) > 1e-6


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_generate_matches_independent_torch_composition():
    """End-to-end generate() golden vs an INDEPENDENT composition with the
    same converted weights: HF transformers CLIPTextModel (context) ->
    torch diffusers-reference UNet (tests/torch_refs) for per-step eps ->
    the independent numpy DPM-Solver++ (tests/test_dpm_solver) -> torch
    VAE decode -> clamp. Pins the composition semantics the per-model
    goldens cannot: CFG [uncond; cond] order, context broadcast, latent
    scaling 1/0.18215, clamp, timestep grid."""
    torch = pytest.importorskip("torch")
    import transformers
    from torch_refs import TUNet, TVAE
    from test_dpm_solver import _reference_dpm_2m

    from fairdiff.io.sd_loader import convert_unet, convert_vae
    from fairdiff.io.torch_convert import convert_clip_text
    from fairdiff.sampling import dpm_solver as dpm
    from fairdiff.sampling.pipeline import SDConfig, StableDiffusion

    cfg = SDConfig.tiny()
    t_text = cfg.text

    torch.manual_seed(0)
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=t_text.vocab_size,
        hidden_size=t_text.hidden_size,
        intermediate_size=t_text.intermediate_size,
        num_hidden_layers=t_text.num_hidden_layers,
        num_attention_heads=t_text.num_attention_heads,
        max_position_embeddings=t_text.max_position_embeddings,
        hidden_act=t_text.hidden_act,
        eos_token_id=t_text.eos_token_id,
        bos_token_id=0,
    )
    hf_te = transformers.CLIPTextModel(hf_cfg).eval()
    t_unet = TUNet(cfg.unet).eval()
    t_vae = TVAE(cfg.vae).eval()

    to_np = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = {
        "text_encoder": jax.tree.map(
            jnp.asarray,
            convert_clip_text(to_np(hf_te), t_text.num_hidden_layers),
        ),
        "unet": jax.tree.map(jnp.asarray, convert_unet(to_np(t_unet), cfg.unet)),
        "vae": jax.tree.map(jnp.asarray, convert_vae(to_np(t_vae), cfg.vae)),
    }

    S = t_text.max_position_embeddings
    rng = np.random.default_rng(3)
    eos = t_text.eos_token_id
    # fully dense ids (eos only at the last position) => all-ones masks on
    # both sides, so the torch side needs no masking machinery
    cond = np.concatenate([[0], rng.integers(1, eos - 1, S - 2), [eos]]).astype(np.int32)[None]
    uncond = np.concatenate([[0], rng.integers(1, eos - 1, S - 2), [eos]]).astype(np.int32)[None]
    N, n_steps, gs = 2, 3, 7.5
    noises = rng.normal(size=(N, 8, 8, 4)).astype(np.float32)

    sd = StableDiffusion(cfg)
    ours = np.asarray(
        sd.generate(params, jnp.asarray(noises), jnp.asarray(cond),
                    jnp.asarray(uncond), n_steps, guidance_scale=gs)
    )

    with torch.no_grad():
        ctx_c = hf_te(
            input_ids=torch.from_numpy(cond.astype(np.int64)),
            attention_mask=torch.ones(1, S, dtype=torch.long),
        ).last_hidden_state.numpy()
        ctx_u = hf_te(
            input_ids=torch.from_numpy(uncond.astype(np.int64)),
            attention_mask=torch.ones(1, S, dtype=torch.long),
        ).last_hidden_state.numpy()
    context = np.concatenate(
        [np.repeat(ctx_u, N, 0), np.repeat(ctx_c, N, 0)], axis=0
    )

    def eps_np(lat2_nhwc, t):
        lat = torch.from_numpy(
            np.concatenate([lat2_nhwc, lat2_nhwc]).transpose(0, 3, 1, 2)
        )
        with torch.no_grad():
            eps = t_unet(
                lat, torch.tensor([t] * 2 * N), torch.from_numpy(context)
            ).numpy().transpose(0, 2, 3, 1)
        return eps[:N], eps[N:]

    def eps_for_ref(lat2, t):  # _reference_dpm_2m passes [2N] concat
        return eps_np(lat2[:N], t)

    sched = dpm.make_schedule(cfg.solver)
    final = _reference_dpm_2m(
        eps_for_ref, noises.copy(), cfg.solver, sched, n_steps, gs
    )
    with torch.no_grad():
        dec = t_vae.decode(
            torch.from_numpy((final / cfg.vae.scaling_factor).transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    ref = np.clip(dec, -1.0, 1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)
