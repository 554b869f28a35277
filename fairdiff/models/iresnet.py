"""IResNet face-recognition backbone (opensphere/insightface family),
Flax NHWC inference.

Port of opensphere/model/backbone/iresnet.py: 3x3 stem (stride 1) + BN +
PReLU, four stages of IBasicBlocks (BN-conv-BN-PReLU-conv-BN + 1x1
downsample), final BN -> flatten -> fc -> feature BN1d. 112x112 -> /16 ->
7x7 spatial. BatchNorms are frozen inference form (converted running
stats); the NCHW->NHWC flatten permutation is handled in the converter.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from fairdiff.io import torch_convert as tc
from fairdiff.models.mobilenet_v3 import FrozenBatchNorm


@dataclasses.dataclass(frozen=True)
class IResNetConfig:
    layers: tuple[int, int, int, int] = (2, 2, 2, 2)  # iresnet18
    out_channel: int = 512
    in_size: int = 112

    @classmethod
    def iresnet18(cls):
        return cls((2, 2, 2, 2))

    @classmethod
    def iresnet34(cls):
        return cls((3, 4, 6, 3))

    @classmethod
    def iresnet50(cls):
        return cls((3, 4, 14, 3))

    @classmethod
    def iresnet100(cls):
        return cls((3, 13, 30, 3))

    @classmethod
    def tiny(cls):
        return cls((1, 1, 1, 1), out_channel=16, in_size=32)


class PReLU(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.features,))
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = FrozenBatchNorm(in_ch, eps=1e-5, dtype=self.dtype, name="bn1")(x)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = FrozenBatchNorm(self.planes, eps=1e-5, dtype=self.dtype, name="bn2")(h)
        h = PReLU(self.planes, self.dtype, name="prelu")(h)
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(self.planes, eps=1e-5, dtype=self.dtype, name="bn3")(h)
        if self.stride != 1 or in_ch != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            x = FrozenBatchNorm(self.planes, eps=1e-5, dtype=self.dtype,
                                name="downsample_bn")(x)
        return x + h


class IResNet(nn.Module):
    config: IResNetConfig = IResNetConfig.iresnet18()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        base = 16 if cfg.out_channel <= 32 else 64
        widths = (base, base * 2, base * 4, base * 8)
        x = nn.Conv(widths[0], (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(widths[0], eps=1e-5, dtype=self.dtype, name="bn1")(x)
        x = PReLU(widths[0], self.dtype, name="prelu")(x)
        for li, (n_blocks, w) in enumerate(zip(cfg.layers, widths), 1):
            for bi in range(n_blocks):
                x = IBasicBlock(
                    w, stride=2 if bi == 0 else 1, dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x)
        x = FrozenBatchNorm(widths[3], eps=1e-5, dtype=self.dtype, name="bn2")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(cfg.out_channel, dtype=self.dtype, name="fc")(x)
        return FrozenBatchNorm(
            cfg.out_channel, eps=1e-5, dtype=self.dtype, name="features"
        )(x.reshape(x.shape[0], 1, cfg.out_channel)).reshape(x.shape[0], -1)


def convert_iresnet(sd: tc.Tensors, config: IResNetConfig) -> dict:
    def prelu(prefix):
        return {"alpha": tc._np(sd[f"{prefix}.weight"])}

    params: dict = {
        "conv1": tc.conv(sd, "conv1", bias=False),
        "bn1": tc.batchnorm(sd, "bn1"),
        "prelu": prelu("prelu"),
        "bn2": tc.batchnorm(sd, "bn2"),
        "features": tc.batchnorm(sd, "features"),
    }
    for li, n_blocks in enumerate(config.layers, 1):
        for bi in range(n_blocks):
            p = f"layer{li}.{bi}"
            node = {
                "bn1": tc.batchnorm(sd, f"{p}.bn1"),
                "conv1": tc.conv(sd, f"{p}.conv1", bias=False),
                "bn2": tc.batchnorm(sd, f"{p}.bn2"),
                "prelu": prelu(f"{p}.prelu"),
                "conv2": tc.conv(sd, f"{p}.conv2", bias=False),
                "bn3": tc.batchnorm(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                node["downsample_conv"] = tc.conv(sd, f"{p}.downsample.0", bias=False)
                node["downsample_bn"] = tc.batchnorm(sd, f"{p}.downsample.1")
            params[f"layer{li}_{bi}"] = node
    # fc with NCHW->NHWC flatten permutation
    w = tc._np(sd["fc.weight"])
    side = config.in_size // 16
    c = w.shape[1] // (side * side)
    w = w.reshape(-1, c, side, side).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    params["fc"] = {"kernel": w.T, "bias": tc._np(sd["fc.bias"])}
    return params
