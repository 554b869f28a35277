"""Fused GEGLU projection (Pallas TPU) for the UNet feed-forward.

Reference semantics: diffusers-0.19.3 `GEGLU` as used by SD-1.5's
transformer blocks (consumed at exp-1-debias-gender/1-main-debias.py:
722-794): y = h * gelu(gate) where [h | gate] = x @ W + b is an 8*d-wide
projection. XLA materialises that projection to HBM (written by the dot,
read back by the gate fusion) in the forward AND — because the phase-4
VJP recomputes forwards under remat — again in the backward:
~380 MB of traffic per UNet pass at SD-1.5 shapes, ~2 s/step at the v5e's
819 GB/s. This kernel computes both halves tile-by-tile in VMEM and
writes only the 4*d product; the backward recomputes h/gate per tile and
writes only dx (dW/db fall back to XLA and are DCE'd while the UNet
feed-forward stays frozen — LoRA targets attention only).

Trade-off: the dx kernel re-runs the two projection dots (extra MXU work
~= one forward projection per backward) to avoid the 8*d HBM round-trip —
the same recompute-over-bandwidth trade the flash backward makes.

Gating: default ON for single-device TPU (opt out with
FAIRDIFF_FUSED_GEGLU=0); the wrapper declares no custom_partitioning, so
under a multi-device mesh the module keeps the XLA path, consistent with
parallel/tp.py's choice not to shard the GEGLU. On-chip A/B numbers are
in fused_geglu_enabled's docstring.

Precision: dots run in the input dtype with fp32 accumulation
(preferred_element_type), gelu/statistics in fp32 — the same policy as
ops/flash_attention.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 256  # divides every SD-1.5 inner width (1280/2560/5120)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _erf(z):
    """fp32 erf for the Pallas kernels (lax.erf has no Mosaic lowering).

    Abramowitz & Stegun 7.1.26: |error| <= 1.5e-7 absolute — three orders
    of magnitude below the bf16 output resolution the kernels write."""
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736
               + t * (1.421413741
                      + t * (-1.453152027 + t * 1.061405429)))
    )
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))


def _gelu(z):
    """Exact gelu (erf form) in fp32 — approximate=False parity with the
    module's jax.nn.gelu and torch F.gelu default."""
    return 0.5 * z * (1.0 + _erf(z * (2.0**-0.5)))


def _gelu_grad(z):
    phi = jnp.exp(-0.5 * z * z) * (2.0 * jnp.pi) ** -0.5
    big_phi = 0.5 * (1.0 + _erf(z * (2.0**-0.5)))
    return big_phi + z * phi


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref):
    """One (m-block, n-block): o = (x@wh + bh) * gelu(x@wg + bg)."""
    x = x_ref[...]
    h = _dot(x, wh_ref[...], ((1,), (0,))) + bh_ref[...].astype(jnp.float32)
    g = _dot(x, wg_ref[...], ((1,), (0,))) + bg_ref[...].astype(jnp.float32)
    o_ref[...] = (h * _gelu(g)).astype(o_ref.dtype)


def _dx_kernel(
    x_ref, wh_ref, wg_ref, bh_ref, bg_ref, dy_ref, dx_ref, acc_ref
):
    """dx = sum_n dh_n @ wh_n^T + dg_n @ wg_n^T, h/g recomputed per tile.

    Accumulates in an fp32 VMEM scratch across the n grid dimension (the
    fastest-varying one — TPU grids run sequentially, so the scratch and
    the dx output block stay resident for all n of a given m block)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    wh = wh_ref[...]
    wg = wg_ref[...]
    h = _dot(x, wh, ((1,), (0,))) + bh_ref[...].astype(jnp.float32)
    g = _dot(x, wg, ((1,), (0,))) + bg_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    # dproj halves rounded to the activation dtype before their MXU dots
    # (the same probability-precision policy as the flash backward)
    dh = (dy * _gelu(g)).astype(x.dtype)
    dg = (dy * h * _gelu_grad(g)).astype(x.dtype)
    acc_ref[...] += _dot(dh, wh, ((1,), (1,))) + _dot(dg, wg, ((1,), (1,)))

    @pl.when(j == pl.num_programs(1) - 1)
    def _write():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


def _block_m(m: int, d: int, cap: int, env: str) -> int:
    """Row-block size: `cap` rows, halved at d>640 so the x tile (and the
    dx kernel's fp32 scratch) stays ~2.5 MB under the v5e's ~16 MB scoped
    VMEM with double buffering. Env-tunable (FAIRDIFF_GEGLU_BM / _BM_DX)
    for on-chip retuning without a code change."""
    cap = int(os.environ.get(env, cap // 2 if d > 640 else cap))
    return cap if m >= cap else _round_up(m, 256)


def _split_pad(w, b, bn: int):
    """w [d, 2I], b [2I] -> (wh, wg [d, n_pad], bh, bg [1, n_pad])."""
    inner = w.shape[1] // 2
    n_pad = _round_up(inner, bn)
    pad = [(0, 0), (0, n_pad - inner)]
    wh = jnp.pad(w[:, :inner], pad)
    wg = jnp.pad(w[:, inner:], pad)
    bh = jnp.pad(b[None, :inner], pad)
    bg = jnp.pad(b[None, inner:], pad)
    return wh, wg, bh, bg, inner, n_pad


def _prep_x(x, bm: int):
    m = x.shape[0]
    m_pad = _round_up(m, bm)
    return jnp.pad(x, [(0, m_pad - m), (0, 0)]), m_pad


def _w_specs(d: int, bn: int):
    w_spec = pl.BlockSpec(
        (d, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    b_spec = pl.BlockSpec(
        (1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    return [w_spec, w_spec, b_spec, b_spec]


def _geglu_forward(x2, w, b):
    """x2 [M, d] -> [M, inner]."""
    m, d = x2.shape
    bn = min(BLOCK_N, _round_up(w.shape[1] // 2, 128))
    wh, wg, bh, bg, inner, n_pad = _split_pad(w, b, bn)
    # 1024-row x blocks: the x tile is fetched once per m-block (the n grid
    # dim is fastest and its index map ignores n), and weight streaming
    # amortises over 1024 rows — the compute intensity XLA's own dot gets
    bm = _block_m(m, d, 1024, "FAIRDIFF_GEGLU_BM")
    xp, m_pad = _prep_x(x2, bm)
    x_spec = pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x2.dtype),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[x_spec] + _w_specs(d, bn),
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(xp, wh, wg, bh, bg)
    return out[:m, :inner]


def _geglu_dx(x2, w, b, dy2):
    m, d = x2.shape
    bn = min(BLOCK_N, _round_up(w.shape[1] // 2, 128))
    wh, wg, bh, bg, inner, n_pad = _split_pad(w, b, bn)
    # smaller than fwd: the fp32 dx scratch is [bm, d]
    bm = _block_m(m, d, 512, "FAIRDIFF_GEGLU_BM_DX")
    xp, m_pad = _prep_x(x2, bm)
    dyp = jnp.pad(dy2, [(0, m_pad - m), (0, n_pad - inner)])
    x_spec = pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    dy_spec = pl.BlockSpec(
        (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    dx = pl.pallas_call(
        _dx_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x2.dtype),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[x_spec] + _w_specs(d, bn) + [dy_spec],
        out_specs=x_spec,
        scratch_shapes=[pltpu.VMEM((bm, d), jnp.float32)],
    )(xp, wh, wg, bh, bg, dyp)
    return dx[:m]


def _xla_geglu(x, w, b):
    """Reference composition (identical math, XLA-materialised)."""
    proj = (x @ w + b).astype(jnp.float32)
    h, gate = jnp.split(proj, 2, axis=-1)
    return (h * _gelu(gate)).astype(x.dtype)


def _flat(x):
    return x.reshape(-1, x.shape[-1])


def _fg_impl(x, w, b):
    return _geglu_forward(_flat(x), w, b).reshape(*x.shape[:-1], -1)


@jax.custom_vjp
def fused_geglu(x, w, b):
    """y[..., inner] = h * gelu(gate), [h|gate] = x[..., d] @ w[d, 2*inner] + b."""
    return _fg_impl(x, w, b)


def _fg_fwd(x, w, b):
    return _fg_impl(x, w, b), (x, w, b)


def _fg_bwd(res, dy):
    x, w, b = res
    x2, dy2 = _flat(x), _flat(dy)
    dx = _geglu_dx(x2, w, b, dy2).reshape(x.shape)
    # dW/db via XLA recompute: dead code (DCE'd) while the feed-forward
    # weights stay frozen — LoRA targets attention projections only
    # (exp-1:798-827); kept for correctness under full finetuning.
    proj = (x2 @ w + b).astype(jnp.float32)
    h, g = jnp.split(proj, 2, axis=-1)
    dyf = dy2.astype(jnp.float32)
    dproj = jnp.concatenate(
        [dyf * _gelu(g), dyf * h * _gelu_grad(g)], axis=-1
    ).astype(x.dtype)
    dw = _dot(x2, dproj, ((0,), (0,))).astype(w.dtype)
    db = dproj.sum(0).astype(b.dtype)
    return dx, dw, db


fused_geglu.defvjp(_fg_fwd, _fg_bwd)


@functools.lru_cache(maxsize=1)
def _single_tpu() -> bool:
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def fused_geglu_enabled() -> bool:
    """Gate read at trace time; default ON for single-TPU backends (opt out
    with FAIRDIFF_FUSED_GEGLU=0). On-chip A/B at the SD-1.5 feed-forward
    shapes, CFG-pair batch 16 (fwd / dx-backward, ms per call):
      T=4096 d= 320: xla 6.61/6.01  fused 3.72/4.81  (1.78x / 1.25x)
      T=1024 d= 640: xla 5.38/4.57  fused 3.19/4.15  (1.68x / 1.10x)
      T= 256 d=1280: xla 3.76/3.74  fused 3.36/4.12  (1.12x / 0.91x)
    Net win is the HBM round-trip of the 8*d projection at the two big
    resolutions; the d=1280 dx regression is noise at step scale.
    Caveat: the A/B above is bf16-only (the production dtype). fp32
    activations take this path unmeasured — fp32 MXU dots decompose into
    multiple passes, so the profile differs; set FAIRDIFF_FUSED_GEGLU=0
    for fp32 runs unless benchmarked."""
    return (
        os.environ.get("FAIRDIFF_FUSED_GEGLU", "1") == "1" and _single_tpu()
    )
