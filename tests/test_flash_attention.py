"""Flash attention: parity with the XLA reference in interpret mode on CPU
(real-TPU execution exercised by bench/TPU runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairdiff.ops import flash_attention as fa


def _ref(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", p.astype(q.dtype), v)


@pytest.mark.parametrize(
    "s,t,d", [(512, 512, 128), (1024, 512, 64), (600, 300, 40)]
)
def test_flash_matches_xla(monkeypatch, s, t, d):
    # interpret mode: run the kernel logic on CPU
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, s, 2, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, t, 2, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, t, 2, d)).astype(np.float32))
    got = fa._flash_forward(q, k, v)
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "s,t,d",
    [
        (512, 512, 64),   # aligned self-attention
        (600, 300, 40),   # both seq dims padded, head_dim padded
        (1024, 77, 80),   # cross-attention (key side much shorter)
        (1024, 1024, 40), # exercises the 1024-wide K/V tile path
    ],
)
def test_flash_grad_matches_xla(monkeypatch, s, t, d):
    """Pallas dq/dkv backward vs XLA autodiff, with a non-trivial cotangent."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, s, 2, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, t, 2, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, t, 2, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, s, 2, d)).astype(np.float32))

    def loss(f):
        return lambda a, b, c: (f(a, b, c) * w).sum()

    got = jax.grad(loss(fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss(_ref), argnums=(0, 1, 2))(q, k, v)
    for gg, rr, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(rr), atol=5e-5, err_msg=f"d{name}"
        )


@pytest.mark.parametrize(
    "s,t,d",
    [
        (512, 512, 64),   # aligned self-attention
        (600, 300, 40),   # both seq dims padded, head_dim padded
        (1024, 77, 80),   # cross-attention (key side much shorter)
        (1024, 1024, 40), # exercises the 1024-wide K/V tile path
    ],
)
def test_flash_grad_merged_matches_xla(monkeypatch, s, t, d):
    """Merged single-pass dq+dkv backward vs XLA autodiff."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    monkeypatch.setenv("FAIRDIFF_FLASH_BWD", "merged")
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, s, 2, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, t, 2, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, t, 2, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, s, 2, d)).astype(np.float32))

    def loss(f):
        return lambda a, b, c: (f(a, b, c) * w).sum()

    got = jax.grad(loss(fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss(_ref), argnums=(0, 1, 2))(q, k, v)
    for gg, rr, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(rr), atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_grad_recompute_fallback(monkeypatch):
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    monkeypatch.setenv("FAIRDIFF_FLASH_BWD", "recompute")
    rng = np.random.default_rng(2)
    shape = (1, 512, 1, 64)
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    g1 = jax.grad(lambda a: fa.flash_attention(a, k, v).sum())(q)
    g2 = jax.grad(lambda a: _ref(a, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_flash_bf16_dots_match_fp32_reference(monkeypatch):
    """bf16 inputs route the MXU dots through bf16 operands (fp32 accum);
    outputs and grads must stay within bf16 rounding of the fp32 math."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    rng = np.random.default_rng(3)
    q32 = rng.normal(size=(1, 600, 2, 40)).astype(np.float32)
    k32 = rng.normal(size=(1, 300, 2, 40)).astype(np.float32)
    v32 = rng.normal(size=(1, 300, 2, 40)).astype(np.float32)
    w32 = rng.normal(size=(1, 600, 2, 40)).astype(np.float32)
    q, k, v, w = (jnp.asarray(x, jnp.bfloat16) for x in (q32, k32, v32, w32))

    out = fa._flash_forward(q, k, v).astype(jnp.float32)
    ref = _ref(*(jnp.asarray(x) for x in (q32, k32, v32))).astype(jnp.float32)
    # bf16 has ~8 bits of mantissa; softmax-weighted sums stay O(1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)

    def loss(f, *args):
        return (f(*args).astype(jnp.float32) * w.astype(jnp.float32)).sum()

    got = jax.grad(functools.partial(loss, fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    ref_g = jax.grad(functools.partial(loss, _ref), argnums=(0, 1, 2))(
        *(jnp.asarray(x, jnp.bfloat16) for x in (q32, k32, v32))
    )
    for gg, rr, name in zip(got, ref_g, "qkv"):
        gg = np.asarray(gg, np.float32)
        rr = np.asarray(rr, np.float32)
        scale = max(1.0, np.abs(rr).max())
        np.testing.assert_allclose(gg / scale, rr / scale, atol=4e-2, err_msg=f"d{name}")


def test_flash_sharded_over_batch_and_heads(monkeypatch):
    """custom_partitioning runs the kernel per-shard under a ("data","model")
    mesh — batch over data, heads over model (the TP layout) — with no
    gather: fwd and grads must match the XLA reference and keep the
    operand sharding."""
    import functools

    from jax.experimental import pallas as pl
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(4, 512, 2, 40)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 300, 2, 40)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(4, 300, 2, 40)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 512, 2, 40)).astype(np.float32))
    sh = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    out = jax.jit(fa.flash_attention)(qs, ks, vs)
    assert out.sharding.is_equivalent_to(sh, out.ndim)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-5
    )

    def loss(f, a, b, c):
        return (f(a, b, c) * w).sum()

    got = jax.jit(
        jax.grad(functools.partial(loss, fa.flash_attention), argnums=(0, 1, 2))
    )(qs, ks, vs)
    ref = jax.grad(functools.partial(loss, _ref), argnums=(0, 1, 2))(q, k, v)
    for gg, rr, name in zip(got, ref, "qkv"):
        assert gg.sharding.is_equivalent_to(sh, gg.ndim), name
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(rr), atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_grad_compact_residuals(monkeypatch):
    """FAIRDIFF_COMPACT_RESIDUALS=1 (lane-aligned [B,S,H*D] residuals +
    single-lane LSE) must produce identical gradients to the default
    padded-residual mode — the layout is an HBM storage choice only."""
    import functools

    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 600, 2, 40)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 300, 2, 40)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 300, 2, 40)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(1, 600, 2, 40)).astype(np.float32))

    def loss(a, b, c):
        return (fa.flash_attention(a, b, c) * w).sum()

    monkeypatch.delenv("FAIRDIFF_COMPACT_RESIDUALS", raising=False)
    base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("FAIRDIFF_COMPACT_RESIDUALS", "1")
    compact = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gb, gc, name in zip(base, compact, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gc), atol=1e-6, err_msg=f"d{name}"
        )


def test_xla_attention_compact_checkpoint_grads_match(monkeypatch):
    """layers.dot_product_attention: the merged-head checkpoint boundary
    (compact mode) is gradient-identical to the plain checkpointed path."""
    from fairdiff.models import layers

    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(2, 64, 2, 40)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 77, 2, 40)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 77, 2, 40)).astype(np.float32))

    def loss(a, b, c):
        return (layers.dot_product_attention(a, b, c) ** 2).sum()

    monkeypatch.delenv("FAIRDIFF_COMPACT_RESIDUALS", raising=False)
    base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("FAIRDIFF_COMPACT_RESIDUALS", "1")
    compact = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gb, gc, name in zip(base, compact, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gc), rtol=1e-6, err_msg=f"d{name}"
        )
