"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

The UNet's resnet blocks (reference exp-1-debias-gender/1-main-debias.py
UNet via diffusers; our models/unet2d.py) chain GroupNorm -> SiLU -> Conv.
XLA lowers the norm to a reduce fusion plus an elementwise fusion: the
activation is read twice and written once just for normalization (the conv
cannot absorb an elementwise producer on TPU). These normalization chains
are HBM-bound and show up as ~1/4 of UNet device time in step traces.

This kernel does the whole thing in one pass per sample: the [H*W, C]
activation tile is fetched to VMEM once, per-group statistics are computed
in f32 via chunked row reductions (channel->group reduction is a tiny
one-hot matmul so no lane relayout is needed), and the normalized/SiLU'd
result is written straight back out: 1 read + 1 write instead of 3 passes.

Applies only when one sample's activation fits comfortably in VMEM (all
UNet resolutions do; the VAE's 512^2 layers fall back to XLA). Backward is
an XLA-recompute vjp.

STATUS (measured on v5e, PERF.md): NOT integrated into the models. The
forward win is small (these shapes are VPU-bound: ~8% at 64^2x320, ~0
elsewhere), and the recompute-vjp costs one extra forward pass per
GroupNorm in the gradient phase — a full-step bench regressed 47.8 ->
58.2 chip*s with this wired into the UNet/VAE. Kept as an opt-in module
(models.layers.FusedGroupNorm) pending an analytic/Pallas backward that
would remove the extra pass.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one sample's activation tile must fit in ~16MB VMEM with pipelining:
# in+out blocks, double-buffered, plus f32 chunk temps -> cap blocks at 3MB
# (covers every UNet GroupNorm; the VAE's 4MB+ mid/decode blocks fall back)
_MAX_BLOCK_BYTES = 3 * 1024 * 1024
_ROW_CHUNK_BYTES = 2 * 1024 * 1024  # f32 compute chunk


def _gn_silu_kernel(
    x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
    rows: int, row_chunk: int, apply_silu: bool,
):
    C = x_ref.shape[-1]
    cg = C // groups
    n = rows // row_chunk

    def stats_body(i, carry):
        s, ss = carry
        xc = x_ref[0, pl.ds(i * row_chunk, row_chunk), :].astype(jnp.float32)
        return s + xc.sum(0, keepdims=True), ss + (xc * xc).sum(
            0, keepdims=True
        )

    z = jnp.zeros((1, C), jnp.float32)
    s, ss = jax.lax.fori_loop(0, n, stats_body, (z, z))

    # channel -> group reduction as a one-hot matmul (no lane relayout)
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // cg
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    onehot = (ch == gr).astype(jnp.float32)  # [C, G]
    cnt = float(rows * cg)
    gsum = jax.lax.dot_general(
        s, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [1, G]
    gss = jax.lax.dot_general(
        ss, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mean_g = gsum / cnt
    var_g = jnp.maximum(gss / cnt - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels
    mean_c = jax.lax.dot_general(
        mean_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, C]
    inv_c = jax.lax.dot_general(
        inv_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w = scale_ref[...].astype(jnp.float32) * inv_c
    b = bias_ref[...].astype(jnp.float32) - mean_c * w

    def norm_body(i, _):
        xc = x_ref[0, pl.ds(i * row_chunk, row_chunk), :].astype(jnp.float32)
        y = xc * w + b
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * row_chunk, row_chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n, norm_body, 0)


def _row_chunk(rows: int, c: int) -> int:
    limit = max(8, _ROW_CHUNK_BYTES // (c * 4))
    chunk = rows
    while chunk > limit and chunk % 2 == 0:
        chunk //= 2
    return chunk


def _kernel_applicable(rows: int, c: int, groups: int, itemsize: int) -> bool:
    # C need not be lane-aligned (Mosaic pads the minor dim), but keep it
    # sublane-friendly; budget VMEM for the lane-padded block.
    # rows >= 1024: below that the activation is small enough that XLA's
    # two-pass lowering is as fast (measured on v5e) — keep XLA there.
    if c % 8 != 0 or c % groups != 0 or rows % 8 != 0 or rows < 1024:
        return False
    c_padded = -(-c // 128) * 128
    if rows * c_padded * itemsize > _MAX_BLOCK_BYTES:
        return False
    return _row_chunk(rows, c) * c_padded * 4 <= 2 * _ROW_CHUNK_BYTES


def _xla_group_norm(x, scale, bias, groups, eps, apply_silu):
    B = x.shape[0]
    C = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(B, -1, groups, C // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    if apply_silu:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


def _pallas_enabled() -> bool:
    env = os.environ.get("FAIRDIFF_FUSED_GN")
    if env is not None:
        return env != "0"
    # the kernel uses pltpu.VMEM block specs — Mosaic-on-TPU only (a GPU
    # backend would trace then fail to lower); match flash-attention's gate
    return jax.default_backend() == "tpu"


def _gn_forward(x, scale, bias, groups, eps, apply_silu):
    shape = x.shape
    B, C = shape[0], shape[-1]
    rows = 1
    for d in shape[1:-1]:
        rows *= d
    if not _pallas_enabled() or not _kernel_applicable(
        rows, C, groups, x.dtype.itemsize
    ):
        return _xla_group_norm(x, scale, bias, groups, eps, apply_silu)
    xr = x.reshape(B, rows, C)
    out = pl.pallas_call(
        functools.partial(
            _gn_silu_kernel, groups=groups, eps=eps, rows=rows,
            row_chunk=_row_chunk(rows, C), apply_silu=apply_silu,
        ),
        out_shape=jax.ShapeDtypeStruct((B, rows, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, rows, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        # let XLA reuse the activation's HBM buffer for the output when x
        # is dead after the norm (a plain fusion gets this for free; a
        # custom-call needs the aliasing declared)
        input_output_aliases={0: 0},
    )(xr, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm_silu(x, scale, bias, groups, eps, apply_silu=True):
    """GroupNorm over the channel-last axis, optionally fused with SiLU.

    x: [B, ..., C]; scale/bias: [C]. f32 statistics regardless of dtype.
    """
    return _gn_forward(x, scale, bias, groups, eps, apply_silu)


def _gn_fwd(x, scale, bias, groups, eps, apply_silu):
    return _gn_forward(x, scale, bias, groups, eps, apply_silu), (
        x, scale, bias,
    )


def _gn_bwd(groups, eps, apply_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda a, w, b: _xla_group_norm(a, w, b, groups, eps, apply_silu),
        x, scale, bias,
    )
    return vjp(g)


fused_group_norm_silu.defvjp(_gn_fwd, _gn_bwd)
