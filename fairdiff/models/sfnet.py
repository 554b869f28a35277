"""SFNet face-recognition backbone (opensphere port, Flax NHWC).

The frozen face-embedding network of the fairness loss: the reference
builds `sfnet*` via opensphere's config factory
(exp-1-debias-gender/1-main-debias.py:970-989; arch at
opensphere/model/backbone/sfnet.py:124-199). Default configuration uses
NO normalisation (norm_layer=Identity -> biased convs, identity features
head), 112x112 input, flatten -> fc -> 512-d embedding. The reference's
norm_layer=BatchNorm branch (sfnet.py:138-143) is dead code as shipped:
no opensphere config passes norm_layer — including
ms1m_sfnet64bn_sphereface.yml, whose net is `type: sfnet64` — so the
BN-free form here is the faithful build for every runnable recipe.

Converter: fairdiff.io.classifiers-style torch state_dict remap; the
flatten order differs between NCHW and NHWC so the fc kernel is permuted
(see convert_sfnet).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.io import torch_convert as tc


@dataclasses.dataclass(frozen=True)
class SFNetConfig:
    layers: tuple[int, int, int, int] = (1, 2, 4, 1)  # sfnet20
    channels: tuple[int, int, int, int] = (64, 128, 256, 512)
    out_channel: int = 512
    in_size: int = 112
    # True: the legacy "sfnet*_deprecated" block ordering
    # (opensphere/model/backbone/sfnet_deprecated.py:71-84 — ReLU applied
    # BEFORE the residual add, no post-add ReLU); False: current sfnet.py
    pre_act_residual: bool = False

    @classmethod
    def sfnet4(cls):
        return cls(layers=(0, 0, 0, 0))

    @classmethod
    def sfnet10(cls):
        return cls(layers=(0, 1, 2, 0))

    @classmethod
    def sfnet20(cls):
        return cls(layers=(1, 2, 4, 1))

    @classmethod
    def sfnet36(cls):
        return cls(layers=(2, 4, 8, 2))

    @classmethod
    def sfnet64(cls):
        return cls(layers=(3, 8, 16, 3))

    @classmethod
    def tiny(cls):
        return cls(layers=(0, 0, 0, 0), channels=(8, 8, 16, 16), out_channel=32, in_size=32)

    @classmethod
    def for_variant(cls, name: str) -> "SFNetConfig":
        """'sfnet20' / 'sfnet20_deprecated' / ... -> config. The variant
        changes only the residual/ReLU ordering — weight trees are
        shape-identical, so building the WRONG variant for a converted
        checkpoint fails silently; always resolve through this."""
        base = getattr(cls, name.replace("_deprecated", ""))()
        if name.endswith("_deprecated"):
            base = dataclasses.replace(base, pre_act_residual=True)
        return base


class _ConvBlock(nn.Module):
    planes: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        return jax.nn.relu(x)


class _BasicBlock(nn.Module):
    planes: int
    dtype: jnp.dtype = jnp.float32
    pre_act_residual: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if self.pre_act_residual:  # legacy sfnet_deprecated ordering
            return jax.nn.relu(h) + x
        return jax.nn.relu(x + h)


class SFNet(nn.Module):
    config: SFNetConfig = SFNetConfig.sfnet20()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        for li, (n_blocks, ch) in enumerate(zip(cfg.layers, cfg.channels), 1):
            x = _ConvBlock(ch, 2, self.dtype, name=f"layer{li}_0")(x)
            for bi in range(n_blocks):
                x = _BasicBlock(
                    ch, self.dtype, cfg.pre_act_residual,
                    name=f"layer{li}_{bi + 1}",
                )(x)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten
        return nn.Dense(cfg.out_channel, dtype=self.dtype, name="fc")(x)


def convert_sfnet(sd: tc.Tensors, config: SFNetConfig) -> dict:
    """opensphere SFNet state_dict -> fairdiff params. Handles the
    NCHW->NHWC flatten permutation of the fc kernel."""
    params: dict = {}
    for li, n_blocks in enumerate(config.layers, 1):
        params[f"layer{li}_0"] = {"conv1": tc.conv(sd, f"layer{li}.0.conv1")}
        for bi in range(n_blocks):
            params[f"layer{li}_{bi + 1}"] = {
                "conv1": tc.conv(sd, f"layer{li}.{bi + 1}.conv1"),
                "conv2": tc.conv(sd, f"layer{li}.{bi + 1}.conv2"),
            }
    w = tc._np(sd["fc.weight"])  # [out, C*H*W] with torch CHW flatten
    side = config.in_size // 16
    c = config.channels[3]
    w = w.reshape(-1, c, side, side).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    params["fc"] = {"kernel": w.T, "bias": tc._np(sd["fc.bias"])}
    return params
