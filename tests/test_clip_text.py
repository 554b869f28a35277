"""Golden test: fairdiff CLIPTextModel vs HF transformers CLIPTextModel.

SURVEY.md §4 implication: shape/dtype + activation-level golden tests vs HF.
Uses a tiny random-initialised config (same architecture family as SD-1.5's
text encoder) so it runs on the 1-core CPU in seconds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fairdiff.io.torch_convert import convert_clip_text
from fairdiff.models.clip_text import CLIPTextConfig, CLIPTextModel

TINY = dict(
    vocab_size=99,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=77,
)


def _make_pair():
    # eos = highest vocab id, as in SD-1.5's CLIP (49407): the reference-era
    # argmax(input_ids) pooling rule and modern HF eos-search then agree.
    hf_cfg = transformers.CLIPTextConfig(
        **TINY, hidden_act="quick_gelu", eos_token_id=98
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(**TINY, hidden_act="quick_gelu", eos_token_id=hf_cfg.eos_token_id)
    model = CLIPTextModel(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_clip_text(sd, cfg.num_hidden_layers)}
    return hf, model, params


def test_clip_text_golden():
    hf, model, params = _make_pair()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 98, size=(3, 12))
    ids[:, -1] = 98  # eos-ish high id for argmax pooling
    mask = np.ones_like(ids)
    mask[0, -3:] = 0

    with torch.no_grad():
        ref = hf(
            torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    out = model.apply(
        params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )

    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]),
        ref.pooler_output.numpy(),
        atol=2e-5,
        rtol=1e-4,
    )


def test_clip_text_inputs_embeds_matches_table_path():
    _, model, params = _make_pair()
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 98, size=(2, 8)))
    table = params["params"]["token_embedding"]["embedding"]
    embeds = jnp.asarray(table)[ids]
    a = model.apply(params, ids)
    b = model.apply(params, ids, inputs_embeds=embeds)
    np.testing.assert_allclose(
        np.asarray(a["last_hidden_state"]), np.asarray(b["last_hidden_state"]), atol=1e-6
    )


def test_clip_text_jit_and_init():
    cfg = CLIPTextConfig(**TINY)
    model = CLIPTextModel(cfg)
    ids = jnp.ones((2, 10), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    out = jax.jit(lambda p, i: model.apply(p, i))(params, ids)
    assert out["last_hidden_state"].shape == (2, 10, 32)
    assert out["pooler_output"].shape == (2, 32)
