"""Golden tests: CLIP vision & DINOv2 vs HF transformers (tiny configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fairdiff.io.feature_models import convert_clip_vision, convert_dinov2
from fairdiff.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
from fairdiff.models.dinov2 import DINOv2Config, DINOv2Model



import pytest

pytestmark = pytest.mark.slow  # fast subset: pytest -m 'not slow'

def test_clip_vision_golden():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModel(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_clip_vision(sd, cfg.num_hidden_layers)}

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(imgs)).image_embeds.numpy()
    got = model.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got["image_embeds"]), ref, atol=3e-5, rtol=1e-4
    )


def test_dinov2_golden():
    hf_cfg = transformers.Dinov2Config(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    torch.manual_seed(0)
    hf = transformers.Dinov2Model(hf_cfg).eval()
    cfg = DINOv2Config.tiny()
    model = DINOv2Model(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_dinov2(sd, cfg.num_hidden_layers)}

    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(imgs)).last_hidden_state[:, 0].numpy()
    got = model.apply(params, jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-4)


def test_dinov2_pos_interpolation_runs():
    cfg = DINOv2Config.tiny()
    model = DINOv2Model(cfg)
    import jax

    params = model.init(jax.random.key(0), jnp.zeros((1, 56, 56, 3)))
    out = model.apply(params, jnp.zeros((1, 28, 28, 3)))  # different grid
    assert out.shape == (1, 32)
