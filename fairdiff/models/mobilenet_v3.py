"""MobileNetV3-Large (Flax, NHWC, inference) — the attribute-classifier
backbone.

The reference's training-time classifiers (CelebA 80-logit, FairFace
6/8-logit — exp-1-debias-gender/1-main-debias.py:929-935, exp-3:...,
exp-4:931-937) and the held-out test classifiers
(eval-generated-images.py:583-602) are all torchvision
`mobilenet_v3_large` with a replaced final Linear. This is a faithful
architectural port so those .pth weights convert mechanically
(fairdiff.io.classifiers.convert_mobilenet_v3); BatchNorm is folded to
frozen inference form (the models are always eval-mode in the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# (kernel, expanded, out, use_se, activation, stride) — torchvision "large"
LARGE_CONF = (
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
)

_ACT = {"relu": jax.nn.relu, "hardswish": jax.nn.hard_swish}


class FrozenBatchNorm(nn.Module):
    """Inference-only BN with converted running stats as parameters."""

    features: int
    eps: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class ConvBNAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "hardswish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=pad,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        if self.act:
            x = _ACT[self.act](x)
        return x


class SqueezeExcitation(nn.Module):
    squeeze: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    kernel: int
    expanded: int
    out: int
    use_se: bool
    act: str
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = x
        idx = 0
        if self.expanded != in_ch:
            h = ConvBNAct(self.expanded, 1, act=self.act, dtype=self.dtype,
                          name=f"block_{idx}")(h)
            idx += 1
        h = ConvBNAct(
            self.expanded, self.kernel, self.stride, groups=self.expanded,
            act=self.act, dtype=self.dtype, name=f"block_{idx}",
        )(h)
        idx += 1
        if self.use_se:
            h = SqueezeExcitation(
                _make_divisible(self.expanded // 4), self.expanded,
                dtype=self.dtype, name=f"block_{idx}",
            )(h)
            idx += 1
        h = ConvBNAct(self.out, 1, act=None, dtype=self.dtype, name=f"block_{idx}")(h)
        if self.stride == 1 and in_ch == self.out:
            h = x + h
        return h


class MobileNetV3Large(nn.Module):
    """Input: [N, H, W, 3] normalised images -> logits [N, num_classes].

    The reference feeds 224x224 face chips in [-1,1] *without* ImageNet
    renormalisation (exp-1:1355-1401 applies the classifier directly to
    `face_chips`); we keep that contract.
    """

    num_classes: int = 80
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, features_only: bool = False) -> jax.Array:
        x = ConvBNAct(16, 3, 2, dtype=self.dtype, name="features_0")(x)
        for i, (k, exp, out, se, act, s) in enumerate(LARGE_CONF):
            x = InvertedResidual(
                k, exp, out, se, act, s, dtype=self.dtype, name=f"features_{i+1}"
            )(x)
        x = ConvBNAct(960, 1, dtype=self.dtype, name="features_16")(x)
        x = x.mean(axis=(1, 2))
        if features_only:
            return x
        x = nn.Dense(1280, dtype=self.dtype, name="classifier_0")(x)
        x = jax.nn.hard_swish(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier_3")(x)
