"""Margin-head tests: formula checks vs independent numpy math, margin
ordering properties, gradient sanity (deltas are detached)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.fairness import margin_heads as mh


def _data(n=8, d=16, c=5, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)) * 3
    w = jnp.asarray(rng.normal(size=(d, c)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n))
    return x, w, y


def _np_ce(logits, y):
    logits = np.asarray(logits, np.float64)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return -np.log(p[np.arange(len(y)), np.asarray(y)]).mean()


def test_cocoloss_formula():
    x, w, y = _data()
    xn = np.asarray(x) / np.linalg.norm(x, axis=1, keepdims=True)
    wn = np.asarray(w) / np.linalg.norm(w, axis=0, keepdims=True)
    expect = _np_ce(30.0 * xn @ wn, y)
    np.testing.assert_allclose(float(mh.cocoloss(w, x, y)), expect, rtol=1e-5)


def test_cosface_formula():
    x, w, y = _data()
    xn = np.asarray(x) / np.linalg.norm(x, axis=1, keepdims=True)
    wn = np.asarray(w) / np.linalg.norm(w, axis=0, keepdims=True)
    cos = xn @ wn
    cos[np.arange(len(y)), np.asarray(y)] -= 0.35
    expect = _np_ce(64.0 * cos, y)
    np.testing.assert_allclose(float(mh.cosface(w, x, y)), expect, rtol=1e-5)


def test_arcface_formula():
    x, w, y = _data()
    xn = np.asarray(x) / np.linalg.norm(x, axis=1, keepdims=True)
    wn = np.asarray(w) / np.linalg.norm(w, axis=0, keepdims=True)
    cos = xn @ wn
    theta = np.arccos(np.clip(cos, -1 + 1e-5, 1 - 1e-5))
    theta[np.arange(len(y)), np.asarray(y)] += 0.5
    logits = 64.0 * np.cos(np.clip(theta, 1e-5, 3.14159))
    np.testing.assert_allclose(float(mh.arcface(w, x, y)), _np_ce(logits, y), rtol=1e-5)


def test_sphereface_phi_unfolding():
    x, w, y = _data()
    xn = np.asarray(x) / np.linalg.norm(x, axis=1, keepdims=True)
    wn = np.asarray(w) / np.linalg.norm(w, axis=0, keepdims=True)
    cos = xn @ wn
    theta = np.arccos(np.clip(cos, -1 + 1e-5, 1 - 1e-5))
    m_theta = theta.copy()
    m_theta[np.arange(len(y)), np.asarray(y)] *= 1.5
    k = np.floor(m_theta / math.pi)
    phi = (-1.0) ** k * np.cos(m_theta) - 2 * k
    logits = cos.copy()
    logits[np.arange(len(y)), np.asarray(y)] = phi[np.arange(len(y)), np.asarray(y)]
    np.testing.assert_allclose(
        float(mh.sphereface(w, x, y)), _np_ce(30.0 * logits, y), rtol=1e-5
    )


def test_margins_increase_loss():
    """Every margin head must be >= plain normalised softmax at the same
    point (the margin penalises the label logit)."""
    x, w, y = _data(seed=3)
    base = float(mh.cocoloss(w, x, y, s=30.0))
    assert float(mh.cosface(w, x, y, s=30.0)) > base
    assert float(mh.arcface(w, x, y, s=30.0)) > base
    assert float(mh.sphereface(w, x, y)) > base
    assert float(mh.gasoftmax(w, x, y)) > 0


def test_heads_grads_finite():
    x, w, y = _data(seed=4)
    for name, fn in mh.HEADS.items():
        if name == "sphereface2":
            b = jnp.float32(mh.sphereface2_bias_init(w.shape[1]))
            gw, gb = jax.grad(lambda W, B: fn(W, B, x, y), argnums=(0, 1))(w, b)
            assert bool(jnp.all(jnp.isfinite(gw))), name
        else:
            gw, gx = jax.grad(lambda W, X: fn(W, X, y), argnums=(0, 1))(w, x)
            assert bool(jnp.all(jnp.isfinite(gw))), name
            assert bool(jnp.all(jnp.isfinite(gx))), name
            assert float(jnp.abs(gx).max()) > 0, name


def test_spherefaceplus_mhe_positive():
    x, w, y = _data(seed=5)
    plain = float(mh.sphereface(w, x, y))
    plus = float(mh.spherefaceplus(w, x, y, lambda_mhe=1.0))
    assert plus > plain  # MHE energy strictly positive for random w
