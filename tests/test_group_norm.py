"""Fused GroupNorm(+SiLU): kernel parity vs flax nn.GroupNorm on CPU
(interpret mode) and fallback/grad behavior."""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairdiff.ops import group_norm as gn


def _ref(x, scale, bias, groups, eps, silu):
    y = nn.GroupNorm(groups, epsilon=eps).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    return jax.nn.silu(y) if silu else y


@pytest.mark.parametrize("silu", [True, False])
@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 32, 32, 128), 32),   # aligned, single chunk
        ((1, 64, 32, 256), 32),   # bigger spatial extent
        ((3, 32, 32, 384), 32),   # C=384 -> group of 12 channels
    ],
)
def test_fused_gn_matches_flax(monkeypatch, shape, groups, silu):
    orig = jax.experimental.pallas.pallas_call
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    monkeypatch.setenv("FAIRDIFF_FUSED_GN", "1")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3 + 1
    scale = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1]).astype(np.float32))
    assert gn._kernel_applicable(
        int(np.prod(shape[1:-1])), shape[-1], groups, 4
    )
    got = gn.fused_group_norm_silu(x, scale, bias, groups, 1e-5, silu)
    ref = _ref(x, scale, bias, groups, 1e-5, silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_gn_chunked_bf16(monkeypatch):
    """UNet-sized bf16 block (64^2 x 320): multi-chunk stats/normalize loop."""
    orig = jax.experimental.pallas.pallas_call
    from jax.experimental import pallas as pl

    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    monkeypatch.setenv("FAIRDIFF_FUSED_GN", "1")
    shape, groups = (1, 64, 64, 320), 32
    rows, C = 4096, 320
    assert gn._kernel_applicable(rows, C, groups, 2)
    assert gn._row_chunk(rows, C) < rows  # exercises the chunked path
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32))
    got = gn.fused_group_norm_silu(x, scale, bias, groups, 1e-5, True)
    ref = _ref(x.astype(jnp.float32), scale, bias, groups, 1e-5, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=0.05
    )


def test_fused_gn_fallback_unaligned(monkeypatch):
    """C not lane-aligned -> pure-XLA path, still correct, no Pallas call."""
    monkeypatch.setenv("FAIRDIFF_FUSED_GN", "1")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 7, 7, 40)).astype(np.float32))
    scale = jnp.ones(40)
    bias = jnp.zeros(40)
    got = gn.fused_group_norm_silu(x, scale, bias, 8, 1e-6, True)
    ref = _ref(x, scale, bias, 8, 1e-6, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fused_gn_grad(monkeypatch):
    """custom_vjp backward (XLA recompute) matches flax autodiff."""
    monkeypatch.setenv("FAIRDIFF_FUSED_GN", "0")  # forward via XLA on CPU
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=128).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=128).astype(np.float32))

    def loss_fused(x, s, b):
        return (gn.fused_group_norm_silu(x, s, b, 32, 1e-5, True) ** 2).sum()

    def loss_ref(x, s, b):
        return (_ref(x, s, b, 32, 1e-5, True) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)
