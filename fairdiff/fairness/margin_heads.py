"""Hyperspherical margin-loss heads — the opensphere face-recognition
training objectives, as pure JAX functions.

Ports of opensphere/model/head/*.py (SURVEY.md §2.2): each head is a loss
over (features [N, D], labels [N], weight [D, C]). The torch originals
renormalise `w` in-place under no_grad every forward and compute the margin
delta under no_grad; functionally that is: use stop_gradient(normalised
logits surgery) and return (loss, normalised_w) so the caller stores the
projected weight — the optimizer step then matches the reference's
project-then-update ordering.

All heads share:  cos = normalize(x) @ normalize(w);  logits = s*(cos + d)
with d computed without gradient; loss = CE (or BCE for SphereFace2).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient


def _normalize(x, axis):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True).clip(1e-12)


def normalize_head_weight(w: jax.Array) -> jax.Array:
    """Column-normalise (the in-place `w.data = normalize(w)` of every
    reference head); call on the stored weight each step."""
    return _normalize(w, axis=0)


def _cos_theta(x, w):
    return _normalize(x, 1) @ normalize_head_weight(w)


def _ce(logits, y):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0].mean()


def _scatter_to_y(base, y, value, reduce):
    """torch scatter_(1, y, v, reduce=...) on the label column."""
    onehot = jax.nn.one_hot(y, base.shape[1], dtype=base.dtype)
    if reduce == "add":
        return base + onehot * value
    if reduce == "multiply":
        return base * jnp.where(onehot > 0, value, 1.0)
    raise ValueError(reduce)


def softmax_loss(w, x, y, s: float = 1.0, use_bias_logits: Optional[jax.Array] = None):
    """Plain softmax head (opensphere softmaxloss.py)."""
    logits = x @ w
    if use_bias_logits is not None:
        logits = logits + use_bias_logits
    return _ce(logits, y)


def cocoloss(w, x, y, s: float = 30.0):
    """NormFace/CocoLoss (cocoloss.py)."""
    return _ce(s * _cos_theta(x, w), y)


def cosface(w, x, y, s: float = 64.0, m: float = 0.35):
    cos = _cos_theta(x, w)
    d = sg(_scatter_to_y(jnp.zeros_like(cos), y, -m, "add"))
    return _ce(s * (cos + d), y)


def arcface(w, x, y, s: float = 64.0, m: float = 0.5):
    cos = _cos_theta(x, w)
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5))
    theta_m = jnp.clip(_scatter_to_y(theta, y, m, "add"), 1e-5, 3.14159)
    d = sg(jnp.cos(theta_m) - cos)
    return _ce(s * (cos + d), y)


def _sphere_phi(cos, y, m):
    """multiplicative-margin phi with the (-1)^k - 2k unfolding
    (sphereface.py:36-43)."""
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5))
    m_theta = _scatter_to_y(theta, y, m, "multiply")
    k = jnp.floor(m_theta / math.pi)
    sign = -2.0 * jnp.remainder(k, 2.0) + 1.0
    return sign * jnp.cos(m_theta) - 2.0 * k


def sphereface(w, x, y, s: float = 30.0, m: float = 1.5):
    cos = _cos_theta(x, w)
    d = sg(_sphere_phi(cos, y, m) - cos)
    return _ce(s * (cos + d), y)


def spherefaceplus(w, x, y, s: float = 30.0, m: float = 1.5, lambda_mhe: float = 1.0):
    """SphereFace+ = SphereFace + minimum-hyperspherical-energy term over
    the classifier columns of the classes in the batch (spherefaceplus.py).
    Jit-friendly: instead of torch.unique we weight pairs by batch-class
    presence masks (identical value: each present-class pair counted once)."""
    cos = _cos_theta(x, w)
    d = sg(_sphere_phi(cos, y, m) - cos)
    ce = _ce(s * (cos + d), y)

    wn = normalize_head_weight(w)
    present = jnp.zeros(w.shape[1]).at[y].set(1.0)
    gram = jnp.arccos(jnp.clip(wn.T @ wn, -1 + 1e-5, 1 - 1e-5))
    pair_mask = jnp.triu(present[:, None] * present[None, :], k=1)
    n_present = present.sum()
    mhe = (pair_mask * gram**-2).sum() / jnp.maximum(
        n_present * (n_present - 1) * 0.5, 1.0
    )
    return ce + lambda_mhe * mhe


def gasoftmax(w, x, y, s: float = 30.0, m: float = 1.5):
    """Geodesic softmax (gasoftmaxloss.py): linear-in-angle confidence;
    gradient flows through the base angle, margin offset detached."""
    cos = _cos_theta(x, w)
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5))
    m_theta = _scatter_to_y(theta, y, m, "multiply")
    offset = sg(m_theta - theta)
    confid = -0.63662 * (theta + offset) + 1.0
    return _ce(s * confid, y)


def _r_d_theta(cos, y, magn_type, m):
    if magn_type == "v0":
        return _sphere_phi(cos, y, m) - cos
    theta = jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5))
    m_theta = _scatter_to_y(theta, y, m, "multiply")
    if magn_type == "v1":
        return jnp.cos(jnp.clip(m_theta, 1e-5, 3.14159)) - cos
    if magn_type == "v2":
        return jnp.cos(m_theta / m) - cos
    raise ValueError(magn_type)


def spherefacer_h(w, x, y, magn_type: str = "v0", s: float = 30.0,
                  m: float = 1.5, lw: float = 50.0):
    """SphereFace-R (hard feature normalisation) (spherefacer.py:73-103)."""
    mag = jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
    cos = (x @ normalize_head_weight(w)) / mag
    d = sg(_r_d_theta(cos, y, magn_type, m))
    return lw * _ce(s * (cos + d), y) / s


def spherefacer_n(w, x, y, magn_type: str = "v0", m: float = 1.0, lw: float = 1.0):
    """SphereFace-R (no normalisation): logits scaled by feature magnitude."""
    mag = jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
    cos = (x @ normalize_head_weight(w)) / mag
    d = sg(_r_d_theta(cos, y, magn_type, m))
    return lw * _ce(mag * (cos + d), y)


def spherefacer_s(w, x, y, magn_type: str = "v0", s: float = 30.0,
                  m: float = 1.0, t: float = 0.01, lw: float = 50.0):
    """SphereFace-R (soft normalisation): magnitude-regularised."""
    mag = jnp.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
    cos = (x @ normalize_head_weight(w)) / mag
    d = sg(_r_d_theta(cos, y, magn_type, m))
    loss = lw * _ce(mag * (cos + d), y) / s
    return loss + (t * jnp.abs(mag - s)).mean()


def sphereface2(w, b, x, y, magn_type: str = "C", alpha: float = 0.7,
                r: float = 40.0, m: float = 0.4, t: float = 3.0,
                lw: float = 50.0):
    """SphereFace2 binary-classification head (sphereface2.py). `b` is the
    trainable scalar bias; init with sphereface2_bias_init."""
    num_class = w.shape[1]
    cos = _cos_theta(x, w)
    onehot = jax.nn.one_hot(y, num_class, dtype=cos.dtype)
    if magn_type == "C":
        g = 2.0 * ((cos + 1.0) / 2.0) ** t - 1.0
        g = g - m * (2.0 * onehot - 1.0)
    elif magn_type == "A":
        theta_m = jnp.clip(
            _scatter_to_y(
                jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5)), y, m, "add"
            ),
            1e-5, 3.14159,
        )
        g = 2.0 * ((jnp.cos(theta_m) + 1.0) / 2.0) ** t - 1.0
    elif magn_type == "M":
        m_theta = jnp.clip(
            _scatter_to_y(
                jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5)), y, m, "multiply"
            ),
            1e-5, 3.14159,
        )
        g = 2.0 * ((jnp.cos(m_theta) + 1.0) / 2.0) ** t - 1.0
    else:
        raise ValueError(magn_type)
    d = sg(g - cos)
    logits = r * (cos + d) + b
    weight = alpha * onehot + (1.0 - alpha) * (1.0 - onehot)
    weight = lw * num_class / r * weight
    # weighted BCE-with-logits, mean over all elements (torch semantics)
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return (weight * bce).mean()


def sphereface2_bias_init(num_class: int, magn_type: str = "C",
                          alpha: float = 0.7, r: float = 40.0, m: float = 0.4,
                          t: float = 3.0) -> float:
    z = alpha / ((1.0 - alpha) * (num_class - 1.0))
    if magn_type == "C":
        ay = r * (2.0 * 0.5**t - 1.0 - m)
        ai = r * (2.0 * 0.5**t - 1.0 + m)
    elif magn_type == "A":
        theta_y = min(math.pi, math.pi / 2.0 + m)
        ay = r * (2.0 * ((math.cos(theta_y) + 1.0) / 2.0) ** t - 1.0)
        ai = r * (2.0 * 0.5**t - 1.0)
    elif magn_type == "M":
        theta_y = min(math.pi, m * math.pi / 2.0)
        ay = r * (2.0 * ((math.cos(theta_y) + 1.0) / 2.0) ** t - 1.0)
        ai = r * (2.0 * 0.5**t - 1.0)
    else:
        raise ValueError(magn_type)
    temp = (1.0 - z) ** 2 + 4.0 * z * math.exp(ay - ai)
    return math.log(2.0 * z) - ai - math.log(1.0 - z + math.sqrt(temp))


HEADS = {
    "softmax": softmax_loss,
    "cocoloss": cocoloss,
    "cosface": cosface,
    "arcface": arcface,
    "sphereface": sphereface,
    "spherefaceplus": spherefaceplus,
    "gasoftmax": gasoftmax,
    "spherefacer_n": spherefacer_n,
    "spherefacer_h": spherefacer_h,
    "spherefacer_s": spherefacer_s,
    "sphereface2": sphereface2,
}
