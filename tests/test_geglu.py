"""Fused GEGLU kernel: parity with the XLA composition in interpret mode.

Covers the reference GEGLU semantics (diffusers-0.19.3 h * gelu(gate),
exact erf gelu) at f32 (tight) and bf16 (rounding tolerance), odd row
counts (padding), multi-tile inner widths, dx through the Pallas backward
kernel, dW/db through the XLA fallback, and the module integration's
param-tree invariance."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))


def _ref_geglu(x, w, b):
    proj = (x.astype(jnp.float32) @ w.astype(jnp.float32)) + b.astype(jnp.float32)
    h, gate = jnp.split(proj, 2, axis=-1)
    return (h * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)


@pytest.mark.parametrize(
    "m,d,inner",
    [(8, 16, 64), (37, 24, 128), (300, 32, 512)],
)
def test_fused_geglu_forward_f32(monkeypatch, m, d, inner):
    _interpret(monkeypatch)
    from fairdiff.ops.geglu import fused_geglu

    k = jax.random.key(0)
    kx, kw, kb = jax.random.split(k, 3)
    x = jax.random.normal(kx, (m, d), jnp.float32)
    w = jax.random.normal(kw, (d, 2 * inner), jnp.float32) * d**-0.5
    b = jax.random.normal(kb, (2 * inner,), jnp.float32) * 0.1
    got = fused_geglu(x, w, b)
    want = _ref_geglu(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fused_geglu_forward_bf16_and_batched(monkeypatch):
    _interpret(monkeypatch)
    from fairdiff.ops.geglu import fused_geglu

    k = jax.random.key(1)
    kx, kw, kb = jax.random.split(k, 3)
    x = jax.random.normal(kx, (2, 33, 24), jnp.bfloat16)
    w = (jax.random.normal(kw, (24, 256), jnp.float32) * 0.2).astype(jnp.bfloat16)
    b = (jax.random.normal(kb, (256,), jnp.float32) * 0.1).astype(jnp.bfloat16)
    got = fused_geglu(x, w, b).astype(jnp.float32)
    want = _ref_geglu(
        x.astype(jnp.float32), w.astype(jnp.float32), b.astype(jnp.float32)
    )
    assert got.shape == (2, 33, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05)


def test_fused_geglu_grads_match_xla(monkeypatch):
    """dx (Pallas kernel), dW/db (XLA fallback) vs autodiff of the plain
    composition, f32."""
    _interpret(monkeypatch)
    from fairdiff.ops.geglu import fused_geglu

    k = jax.random.key(2)
    kx, kw, kb, kc = jax.random.split(k, 4)
    x = jax.random.normal(kx, (37, 16), jnp.float32)
    w = jax.random.normal(kw, (16, 128), jnp.float32) * 0.25
    b = jax.random.normal(kb, (128,), jnp.float32) * 0.1
    cot = jax.random.normal(kc, (37, 64), jnp.float32)

    def loss_fused(x, w, b):
        return (fused_geglu(x, w, b) * cot).sum()

    def loss_ref(x, w, b):
        return (_ref_geglu(x, w, b) * cot).sum()

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for g, wv, name in zip(got, want, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), atol=3e-5, rtol=3e-5,
            err_msg=f"d{name}",
        )


def test_module_param_tree_and_output_parity(monkeypatch):
    """FeedForwardGEGLU with the fused gate on: identical param tree to the
    Dense path (converter/checkpoint compatibility) and identical output."""
    _interpret(monkeypatch)
    import fairdiff.models.unet2d as u

    x = jax.random.normal(jax.random.key(3), (2, 9, 16), jnp.float32)

    ref_mod = u.FeedForwardGEGLU(16)
    ref_params = ref_mod.init(jax.random.key(4), x)
    ref_out = ref_mod.apply(ref_params, x)

    import fairdiff.ops.geglu as gg

    monkeypatch.setattr(gg, "fused_geglu_enabled", lambda: True)
    fused_mod = u.FeedForwardGEGLU(16)
    fused_params = fused_mod.init(jax.random.key(4), x)

    ref_shapes = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ref_params)
    fused_shapes = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), fused_params)
    assert ref_shapes == fused_shapes

    fused_out = fused_mod.apply(ref_params, x)  # same weights through kernel
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=2e-5, rtol=2e-5
    )
