"""Pallas TPU flash attention (non-causal) for the UNet/CLIP attention.

The reference's xformers path is disabled in its own code (exp-1:781-796
commented out); attention there is plain torch softmax(QK^T)V. On TPU the
hot self-attention is the 4096-token latent attention in the UNet's top
blocks — this kernel computes it with online softmax over K/V tiles so the
[S, T] score matrix never materialises in HBM.

Design:
  - grid (batch*heads, q-blocks); K/V streamed through VMEM in BLOCK_T tiles
  - fp32 accumulators/softmax stats regardless of input dtype
  - head_dim stays at its native width in HBM (SD-1.5 heads are
    40/80/160-wide); Mosaic lane-pads blocks in VMEM, so no 3.2x-amplified
    padded copies are written
  - backward: first-party Pallas dq / dkv kernels (flash backward): the
    forward additionally emits the softmax log-sum-exp (broadcast over a
    128-lane minor dim, the TPU-friendly layout for per-row stats), and the
    backward recomputes probabilities tile-by-tile so the [S, T] score
    matrix never hits HBM in the grad pass either. Set
    FAIRDIFF_FLASH_BWD=recompute to fall back to an XLA-recompute vjp,
    or =merged for the single-pass dq+dkv kernel — correct and
    VMEM-fitting (packed stats), but measured 0.66-0.88x the split
    kernels on v5e (PERF.md round 4): kept as a documented dead end.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

BLOCK_S = 512
# K/V tile width. r5 on-chip sweep at the 4096-token SD self-attention
# (tools/roofline --mode flash, v5e, ms/call for the fwd kernel):
#   straight kernel:  512 -> 11.68, 1024 -> 10.13, 2048 -> 10.09, 4096 -> 9.86
#   pipelined kernel: 1024 -> 11.67, 2048 -> **9.23** (default)
# 2048 with the software-pipelined forward is the measured optimum (two
# tiles, the second QK dot overlapping the first tile's softmax VPU
# work); dq also prefers wide tiles (10.79 @1024 -> 10.54 @2048).
# FAIRDIFF_FLASH_BLOCK_T overrides for on-chip sweeps.
BLOCK_T = 2048
LANES = 128


def _block_t(T: int) -> int:
    bt = int(os.environ.get("FAIRDIFF_FLASH_BLOCK_T", "0")) or BLOCK_T
    # clamp to the (512-rounded) sequence so mid-length sequences get a
    # single full-width tile instead of falling to 512 (T=1024 with
    # bt=2048 -> 1024, one tile; T=77 -> 512)
    return max(512, min(bt, -(-T // 512) * 512))


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, scale: float, t_valid: int,
    block_t: int,
):
    """One (batch*head, q-block): online softmax over all K/V tiles.

    lse_ref is only present in grad mode (custom_vjp forward): emitting the
    log-sum-exp costs an extra [B*H, S, 128] f32 HBM write, which at
    phase-1/3 batch sizes is ~1GB per attention call — the no-grad path
    compiles the kernel without it."""
    # MXU-native precision: every dot runs in the INPUT dtype with fp32
    # accumulation (preferred_element_type). bf16 activations hit the
    # single-pass MXU mode; upcasting operands to fp32 (the previous
    # revision) forces the multi-pass fp32 matmul decomposition. fp32
    # inputs (the interpret-mode CPU goldens) keep full precision. Softmax
    # statistics and the output accumulator are always fp32, as in the
    # reference xformers path.
    q = q_ref[0]
    n_t = k_ref.shape[1] // block_t

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_t, block_t), :]
        v = v_ref[0, pl.ds(i * block_t, block_t), :]
        # scale applied to the fp32 scores, not to q: pre-scaling q would
        # round the product back to bf16 before the dot
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLOCK_S, BLOCK_T] fp32
        # mask padded key rows
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_t
        s = jnp.where(col < t_valid, s, -jnp.inf)
        m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((BLOCK_S, q_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((BLOCK_S, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BLOCK_S, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_t, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (BLOCK_S, LANES))


def _flash_kernel_pipe(
    q_ref, k_ref, v_ref, o_ref, lse_ref=None, *, scale: float, t_valid: int,
    block_t: int,
):
    """Software-pipelined forward: the QK dot for k-tile i is issued
    BEFORE the softmax/rescale VPU work of tile i-1, so Mosaic can
    overlap the MXU pass with the exp's VPU time (the r5 roofline
    measured the straight-line kernel as a SERIALIZED MXU+VPU sum:
    self4096 fwd 10.1 ms ≈ 5.6 ms ideal MXU + ~4.5 ms exp, zero
    overlap). Math identical to _flash_kernel. Default since r5 (9.23
    vs 10.13 ms at self4096 with BLOCK_T=2048); note the overlap only
    pays at few-iteration tile counts — at BLOCK_T=1024 (4 tiles) the
    2 MB loop-carried score block made it SLOWER (11.67 ms), the same
    loop-carry lesson as the r4 merged backward."""
    q = q_ref[0]
    n_t = k_ref.shape[1] // block_t

    def compute_s(i):
        k = k_ref[0, pl.ds(i * block_t, block_t), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_t
        return jnp.where(col < t_valid, s, -jnp.inf)

    def consume(i, carry, s_prev):
        """Online-softmax update for tile i using its scores s_prev."""
        acc, m_prev, l_prev = carry
        v = v_ref[0, pl.ds(i * block_t, block_t), :]
        m_new = jnp.maximum(m_prev, s_prev.max(axis=1, keepdims=True))
        p = jnp.exp(s_prev - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    def body(i, carry):
        *softmax_carry, s_prev = carry
        s_cur = compute_s(i)  # MXU pass for tile i, issued first
        acc, m, l = consume(i - 1, tuple(softmax_carry), s_prev)
        return acc, m, l, s_cur

    acc0 = jnp.zeros((BLOCK_S, q_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((BLOCK_S, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((BLOCK_S, 1), jnp.float32)
    acc, m, l, s_last = jax.lax.fori_loop(
        1, n_t, body, (acc0, m0, l0, compute_s(0))
    )
    acc, m, l = consume(n_t - 1, (acc, m, l), s_last)
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (BLOCK_S, LANES))


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prep(x, s_to):
    """[B,S,H,D] -> [B*H, s_to, D] (seq zero-padded).

    D is deliberately NOT padded to the 128-lane boundary in HBM: Mosaic
    lane-pads blocks in VMEM for free, and writing a 128-wide copy of a
    40-wide head costs 3.2x the bytes (measured ~6% of kernel wall time).
    """
    B, S, H, D = x.shape
    x = jnp.moveaxis(x, 2, 1).reshape(B * H, S, D)
    return _pad_to(x, s_to, 1)


def _flash_forward(q, k, v, with_lse: bool = False):
    """q [B,S,H,D], k/v [B,T,H,D] -> [B,S,H,D] (and padded lse if asked)."""
    B, S, H, D = q.shape
    T = k.shape[1]
    scale = D**-0.5

    bt = _block_t(T)
    s_pad = -(-S // BLOCK_S) * BLOCK_S
    t_pad = -(-T // bt) * bt

    qp = _prep(q, s_pad)
    kp = _prep(k, t_pad)
    vp = _prep(v, t_pad)

    qo_spec = pl.BlockSpec(
        (1, BLOCK_S, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, t_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    out_shapes = [jax.ShapeDtypeStruct((B * H, s_pad, D), q.dtype)]
    out_specs = [qo_spec]
    if with_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((B * H, s_pad, LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, BLOCK_S, LANES), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
    # pipelined forward is the r5 default (9.23 vs 10.13 ms at self4096,
    # see BLOCK_T note); FAIRDIFF_FLASH_FWD_PIPE=0 restores the
    # straight-line kernel. With a single k-tile the two are identical.
    kern = (
        _flash_kernel
        if os.environ.get("FAIRDIFF_FLASH_FWD_PIPE") == "0"
        else _flash_kernel_pipe
    )
    res = pl.pallas_call(
        functools.partial(kern, scale=scale, t_valid=T, block_t=bt),
        out_shape=out_shapes,
        grid=(B * H, s_pad // BLOCK_S),
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=out_specs,
    )(qp, kp, vp)
    out = jnp.moveaxis(res[0][:, :S].reshape(B, H, S, D), 1, 2)
    return (out, res[1]) if with_lse else out


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dq_ref,
    *, scale: float, t_valid: int, block_t: int,
):
    """One (batch*head, q-block): dq = sum_tiles (p*(dO·V^T - delta))·K.

    Dots run in the input dtype with fp32 accumulation (see _flash_kernel);
    p/ds are rounded back to the activation dtype before their MXU dots,
    matching the forward's probability precision.
    """
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    dlt = dlt_ref[0][:, :1]
    n_t = k_ref.shape[1] // block_t

    def body(i, acc):
        k = k_ref[0, pl.ds(i * block_t, block_t), :]
        v = v_ref[0, pl.ds(i * block_t, block_t), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_t
        s = jnp.where(col < t_valid, s, -jnp.inf)
        # (moving the independent dp dot ahead of this exp measured
        # exactly neutral at self4096 — 10.494 vs 10.50 ms, r5)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - dlt)).astype(k.dtype)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc0 = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    dq_ref[0] = (scale * jax.lax.fori_loop(0, n_t, body, acc0)).astype(
        dq_ref.dtype
    )


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dk_ref, dv_ref,
    *, scale: float,
):
    """One (batch*head, k-block): dv = P^T·dO, dk = dS^T·Q over q-tiles.

    Padded q rows carry dO == 0 and delta == 0 so they contribute nothing;
    padded k rows only pollute output rows that the wrapper slices away.
    """
    k = k_ref[0]
    v = v_ref[0]
    n_s = q_ref.shape[1] // BLOCK_S

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(j * BLOCK_S, BLOCK_S), :]
        do = do_ref[0, pl.ds(j * BLOCK_S, BLOCK_S), :]
        lse = lse_ref[0, pl.ds(j * BLOCK_S, BLOCK_S), :][:, :1]
        dlt = dlt_ref[0, pl.ds(j * BLOCK_S, BLOCK_S), :][:, :1]
        # NOTE (r5 measured dead end): reordering the independent
        # dO·V^T dot ahead of the exp — the trick that pays in the
        # pipelined forward — does NOT fit here: s and dp live together
        # push the kernel 296K over the 16M scoped-vmem limit at
        # 512-row q-chunks, and shrinking to 256-row chunks to fit
        # costs more in MXU tiling than the overlap buys
        # (19.50 vs 17.13 ms at self4096). The straight order below is
        # the measured local optimum.
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLOCK_S, BLOCK_T] fp32
        p = jnp.exp(s - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - dlt)).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    z = jnp.zeros((k.shape[0], k.shape[1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_s, body, (z, z))
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_merged_kernel(
    q_ref, k_ref, v_ref, do_ref, stat_ref, dk_ref, dv_ref, dq_ref,
    *, scale: float, t_valid: int, block_kv: int, block_s: int,
):
    """One (batch*head, k-block): dk/dv for this block AND this block's dq
    contribution for every q row, in a single pass over the q tiles.

    The split dq/dkv kernels each recompute S = QK^T and (for dq) dP =
    dO.V^T per tile — 7 [S,T]-sized matmul passes total. This kernel
    computes S/P/dP once and emits all three gradients: 5 passes, the
    flash-backward minimum, plus one fewer full HBM read of q/do/lse/delta.

    dq accumulates across k-block grid steps into an f32 output whose block
    index is constant in the k dim: consecutive grid steps for a fixed
    batch*head revisit the same VMEM-resident block, which TPU Pallas
    keeps live between steps (sequential grid), so `dq += contribution`
    is safe; it is zero-initialised at the first k block.
    """
    i = pl.program_id(1)
    k = k_ref[0]
    v = v_ref[0]
    n_s = q_ref.shape[1] // block_s

    @pl.when(i == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def body(j, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(j * block_s, block_s), :]
        do = do_ref[0, pl.ds(j * block_s, block_s), :]
        st = stat_ref[0, pl.ds(j * block_s, block_s), :]
        lse = st[:, 0:1]
        dlt = st[:, 1:2]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BLOCK_S, block_kv] fp32
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_kv
        s = jnp.where(col < t_valid, s, -jnp.inf)
        p = jnp.exp(s - lse)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - dlt)).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        sl = pl.ds(j * block_s, block_s)
        dq_ref[0, sl, :] = (
            dq_ref[0, sl, :]
            + scale * jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ).astype(dq_ref.dtype)
        return dk_acc, dv_acc

    z = jnp.zeros((k.shape[0], k.shape[1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_s, body, (z, z))
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _packed_stats(lse, g, o, s_pad):
    """[B*H, s_pad, 2] f32: lane 0 = lse, lane 1 = delta = rowsum(dO*O).

    One 2-lane buffer instead of two 128-lane-broadcast buffers: the
    Mosaic pipeline allocates (and double-buffers) each stat input at
    s_pad x 128-lane granularity in VMEM regardless of the HBM lane
    count, so the broadcast layout cost 8 MB of the 16 MB scoped-VMEM
    budget per backward kernel; packed, it costs 4 MB.
    """
    B, S, H, D = g.shape
    delta = jnp.einsum(
        "bshd,bshd->bhs", g.astype(jnp.float32), o.astype(jnp.float32)
    ).reshape(B * H, S)
    return jnp.concatenate(
        [lse[..., :1], _pad_to(delta, s_pad, 1)[:, :, None]], axis=-1
    )


def _flash_backward_merged(q, k, v, o, lse, g):
    """Single-pass flash backward (see _bwd_merged_kernel)."""
    B, S, H, D = q.shape
    T = k.shape[1]
    scale = D**-0.5
    s_pad = -(-S // BLOCK_S) * BLOCK_S
    bt = _block_t(T)
    t_pad = -(-T // bt) * bt

    qp = _prep(q, s_pad)
    kp = _prep(k, t_pad)
    vp = _prep(v, t_pad)
    gp = _prep(g, s_pad)
    stats = _packed_stats(lse, g, o, s_pad)

    qo_full_spec = pl.BlockSpec(
        (1, s_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    stat_full_spec = pl.BlockSpec(
        (1, s_pad, 2), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    # same VMEM regime as the split dkv kernel (full q/do/lse/delta resident)
    # plus the dq accumulator block. FAIRDIFF_MERGED_DQ32=0 accumulates dq
    # in the activation dtype (one rounding per k-block instead of one at
    # the end) — a VMEM-fit probe, not a production setting.
    bkv = min(bt, int(os.environ.get("FAIRDIFF_MERGED_BLOCK", "512")))
    # inner q tile 256 (not BLOCK_S=512): halves the fp32 score temps,
    # which is what fits the kernel inside the 16M scoped-VMEM limit at
    # the 4096-token d=40 shape (512 tiles measured 0.27-1.0M over)
    bs_m = min(s_pad, int(os.environ.get("FAIRDIFF_MERGED_BS", "256")))
    # non-divisor tile knobs must ERROR: grid=(.., t_pad//bkv) and the
    # kernel's n_s = s_pad//bs_m floor-divide, so a non-divisor would
    # silently skip k-blocks/q-rows — returning uninitialised dk/dv rows
    # and wrong dq with plausible-looking timings (r4 review finding)
    if t_pad % bkv:
        raise ValueError(
            f"FAIRDIFF_MERGED_BLOCK={bkv} must divide padded kv len {t_pad}"
        )
    if s_pad % bs_m:
        raise ValueError(
            f"FAIRDIFF_MERGED_BS={bs_m} must divide padded q len {s_pad}"
        )
    dq_dtype = (
        jnp.float32
        if os.environ.get("FAIRDIFF_MERGED_DQ32", "1") == "1"
        else q.dtype
    )
    kv_spec = pl.BlockSpec(
        (1, bkv, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    dk, dv, dq = pl.pallas_call(
        functools.partial(
            _bwd_merged_kernel, scale=scale, t_valid=T, block_kv=bkv,
            block_s=bs_m,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, t_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, t_pad, D), v.dtype),
            jax.ShapeDtypeStruct((B * H, s_pad, D), dq_dtype),
        ],
        grid=(B * H, t_pad // bkv),
        in_specs=[qo_full_spec, kv_spec, kv_spec, qo_full_spec,
                  stat_full_spec],
        out_specs=[kv_spec, kv_spec, qo_full_spec],
    )(qp, kp, vp, gp, stats)

    def unprep(x, n, dtype):
        return jnp.moveaxis(x[:, :n].reshape(B, H, n, D), 1, 2).astype(dtype)

    return unprep(dq, S, q.dtype), unprep(dk, T, k.dtype), unprep(dv, T, v.dtype)


def _bwd_operands(q, k, v, o, g):
    """Prepped [B*H, pad, D] operands + the broadcast delta stat for the
    split backward kernels. Shared by _flash_backward and
    tools/roofline.py's per-kernel timing, so the ledger always measures
    the kernels on exactly the operands production produces."""
    B, S, H, D = q.shape
    T = k.shape[1]
    s_pad = -(-S // BLOCK_S) * BLOCK_S
    bt = _block_t(T)
    t_pad = -(-T // bt) * bt

    qp = _prep(q, s_pad)
    kp = _prep(k, t_pad)
    vp = _prep(v, t_pad)
    gp = _prep(g, s_pad)

    # delta_i = rowsum(dO * O), broadcast over the 128-lane stat layout.
    # (The merged kernel's packed 2-lane stat buffer was measured 4.8%
    # SLOWER here: constructing it costs an extra full HBM read of the
    # lse buffer per call, and the broadcast buffers' VMEM cost fits
    # these split kernels fine.)
    delta = jnp.einsum(
        "bshd,bshd->bhs",
        g.astype(jnp.float32),
        o.astype(jnp.float32),
    ).reshape(B * H, S)
    delta = jnp.broadcast_to(
        _pad_to(delta, s_pad, 1)[:, :, None], (B * H, s_pad, LANES)
    )
    return qp, kp, vp, gp, delta, bt


def _flash_backward(q, k, v, o, lse, g):
    """Flash backward: tile-recomputed probabilities, no [S,T] HBM buffer."""
    if os.environ.get("FAIRDIFF_FLASH_BWD", "pallas") == "merged":
        return _flash_backward_merged(q, k, v, o, lse, g)
    B, S, H, D = q.shape
    T = k.shape[1]
    scale = D**-0.5
    qp, kp, vp, gp, delta, bt = _bwd_operands(q, k, v, o, g)

    dq = _dq_pallas(qp, kp, vp, gp, lse, delta, scale=scale, T=T, bt=bt)
    dk, dv = _dkv_pallas(qp, kp, vp, gp, lse, delta, scale=scale, bt=bt)

    def unprep(x, n):
        return jnp.moveaxis(x[:, :n].reshape(B, H, n, D), 1, 2)

    return unprep(dq, S), unprep(dk, T), unprep(dv, T)


def _dq_pallas(qp, kp, vp, gp, lse, delta, *, scale, T, bt):
    """The dq kernel alone on prepped [B*H, pad, D] operands — factored
    out so tools/roofline.py can time it per-kernel (it is otherwise
    only reachable through the fused custom_vjp)."""
    BH, s_pad, D = qp.shape
    t_pad = kp.shape[1]
    qo_spec = pl.BlockSpec(
        (1, BLOCK_S, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_full_spec = pl.BlockSpec(
        (1, t_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec(
        (1, BLOCK_S, LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, t_valid=T, block_t=bt
        ),
        out_shape=jax.ShapeDtypeStruct((BH, s_pad, D), qp.dtype),
        grid=(BH, s_pad // BLOCK_S),
        in_specs=[qo_spec, kv_full_spec, kv_full_spec, qo_spec, stat_spec,
                  stat_spec],
        out_specs=qo_spec,
    )(qp, kp, vp, gp, lse, delta)


def _dkv_pallas(qp, kp, vp, gp, lse, delta, *, scale, bt):
    """The dkv kernel alone on prepped operands (see _dq_pallas)."""
    BH, s_pad, D = qp.shape
    t_pad = kp.shape[1]
    qo_full_spec = pl.BlockSpec(
        (1, s_pad, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    # dkv holds full Q/dO/lse/delta in VMEM, so 1024-wide k-blocks pushed
    # the fp32-dot kernel ~300K over the 16M scoped-vmem limit — default
    # 512 (t_pad is a multiple of bt >= 512, so it still tiles). The bf16
    # dots shrank the fp32 temps; FAIRDIFF_DKV_BLOCK=1024 re-tests the
    # wide tile on real hardware.
    bkv = min(bt, int(os.environ.get("FAIRDIFF_DKV_BLOCK", "512")))
    if t_pad % bkv:
        # same hazard as the merged path: grid=(B*H, t_pad // bkv) with a
        # non-divisor would silently drop the trailing k rows, leaving
        # uninitialised dk/dv blocks
        raise ValueError(
            f"FAIRDIFF_DKV_BLOCK={bkv} must divide padded kv len {t_pad}"
        )
    kv_spec = pl.BlockSpec(
        (1, bkv, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    stat_full_spec = pl.BlockSpec(
        (1, s_pad, LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((BH, t_pad, D), kp.dtype),
            jax.ShapeDtypeStruct((BH, t_pad, D), vp.dtype),
        ],
        grid=(BH, t_pad // bkv),
        in_specs=[qo_full_spec, kv_spec, kv_spec, qo_full_spec,
                  stat_full_spec, stat_full_spec],
        out_specs=[kv_spec, kv_spec],
    )(qp, kp, vp, gp, lse, delta)


def _xla_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def flash_attention_tpu_lib(q, k, v):
    """[B,S,H,D] attention through jax's library Pallas TPU flash kernels
    (forward AND backward). NOTE: validated standalone and under a
    checkpointed scan at SD-1.5 shapes, but its backward kernel faults
    ("TPU device error") inside the full fairness-finetune gradient program
    on v5e — kept only for comparison/debugging; the default
    `flash_attention` below uses the first-party forward + dq/dkv backward
    kernels, which are stable in the full program."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as tpu_flash,
    )

    scale = q.shape[-1] ** -0.5
    out = tpu_flash(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        sm_scale=scale,
    )
    return out.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Sharded dispatch: the pallas_call is a custom call that XLA's SPMD
# partitioner cannot split on its own, so under a ("data","model") mesh a
# bare kernel would force a full all-gather of the head-sharded activations.
# Attention is embarrassingly parallel over (batch, heads) — exactly the two
# dims the mesh shards (batch over "data", heads over "model" via the
# Megatron column split in parallel/tp.py) — so custom_partitioning declares
# that: each shard runs the unmodified kernel on its local (B/dp, H/mp)
# slice and no collective is ever inserted (verified: no all-gather in the
# partitioned HLO). Sequence and head_dim are forced replicated. On a
# single device (the real-chip path) the wrapper is a pass-through; the
# SPMD partitioner (and with it the Python partition callback) only runs
# for multi-device programs, which in this repo are local (CPU-mesh)
# compiles.
#
# The lse statistic crosses the fwd/bwd boundary as [B, H, s_pad, LANES]
# (unfused batch/head dims) because a "model"-sharded H cannot be expressed
# on the kernels' fused B*H-major layout: a fused spec P(("data","model"))
# would slice contiguous B*H rows, which interleaves heads across batch
# entries differently than the (b, h)-blocked layout the local kernels
# produce. The reshape is local metadata only.


def _qspec_bh(arg_infos):
    """(batch, head) mesh axes from q's [B,S,H,D] sharding spec."""
    sharding = arg_infos[0].sharding
    spec = sharding.spec if sharding is not None else ()
    b = spec[0] if len(spec) > 0 else None
    h = spec[2] if len(spec) > 2 else None
    return b, h


# (b_dim, h_dim) index pairs: [B,S,H,D] activations vs [B,H,s_pad,LANES] lse
_ACT = (0, 2)
_LSE = (0, 1)


def _def_bh_partition(fn, in_dims, out_dims, rule):
    """def_partition over (b, h) for kernels embarrassingly parallel there.

    in_dims / out_dims: per operand/result, the (batch, head) positions in
    its shape (_ACT or _LSE); every other dim is forced replicated.
    """

    def _shardings(mesh, b, h, dims, infos):
        if not isinstance(infos, (list, tuple)):
            infos = [infos]  # single-result callbacks get a bare struct
        return tuple(
            NamedSharding(
                mesh,
                P(*[
                    b if d == bd else h if d == hd else None
                    for d in range(len(info.shape))
                ]),
            )
            for (bd, hd), info in zip(dims, infos)
        )

    def _infer(mesh, arg_infos, result_infos):
        b, h = _qspec_bh(arg_infos)
        outs = _shardings(mesh, b, h, out_dims, result_infos)
        return outs if len(outs) > 1 else outs[0]

    def _partition(mesh, arg_infos, result_infos):
        b, h = _qspec_bh(arg_infos)
        outs = _shardings(mesh, b, h, out_dims, result_infos)
        return (
            mesh,
            fn,
            outs if len(outs) > 1 else outs[0],
            _shardings(mesh, b, h, in_dims, arg_infos),
        )

    wrapped = custom_partitioning(fn)
    wrapped.def_partition(
        infer_sharding_from_operands=_infer,
        partition=_partition,
        sharding_rule=rule,
    )
    return wrapped


def _fwd_impl(q, k, v):
    return _flash_forward(q, k, v)


def _fwd_lse_impl(q, k, v):
    o, lse = _flash_forward(q, k, v, with_lse=True)
    B, _, H, _ = q.shape
    return o, lse.reshape(B, H, *lse.shape[1:])


def _bwd_impl(q, k, v, o, lse4, g):
    B, H = lse4.shape[:2]
    lse = lse4.reshape(B * H, *lse4.shape[2:])
    return _flash_backward(q, k, v, o, lse, g)


_fwd_sharded = _def_bh_partition(
    _fwd_impl, [_ACT] * 3, [_ACT],
    "b s h d, b t h d, b t h d -> b s h d",
)
_fwd_lse_sharded = _def_bh_partition(
    _fwd_lse_impl, [_ACT] * 3, [_ACT, _LSE],
    "b s h d, b t h d, b t h d -> b s h d, b h p l",
)
_bwd_sharded = _def_bh_partition(
    _bwd_impl, [_ACT, _ACT, _ACT, _ACT, _LSE, _ACT], [_ACT] * 3,
    "b s h d, b t h d, b t h d, b s h d, b h p l, b s h d"
    " -> b s h d, b t h d, b t h d",
)


@functools.lru_cache(maxsize=1)
def _partitioned() -> bool:
    """Route through the custom_partitioning wrappers only on multi-device
    backends. On a single device the wrappers are semantically a
    pass-through, but they still lower a CustomSPMDPartitioning custom
    call whose partition callbacks live in THIS process — a remote
    compile service (the tunneled single-chip TPU backend) cannot invoke
    them, so the single-device path emits the plain kernels."""
    return jax.device_count() > 1


def _fwd(q, k, v):
    return _fwd_sharded(q, k, v) if _partitioned() else _fwd_impl(q, k, v)


def compact_residuals_enabled() -> bool:
    """FAIRDIFF_COMPACT_RESIDUALS=1 stores custom_vjp residuals in the
    lane-aligned [B,S,H*D] layout (and one LSE lane per row) instead of the
    3.2x-tile-padded [B,S,H,40] forms — a MEMORY lever, default OFF.

    Measured round 3 (PERF.md): the compact layout cuts the per-layer
    residual set from 4x128M+256M to 4x40M+2M at CFG batch 16, but the
    relayout copies cost ~0.9 s/step (+2.3%) on the headline bench, and
    the freed HBM did NOT unlock FAIRDIFF_PAIR_LANES=12 (the binding
    allocation at p=12 is XLA-chosen saved intermediates, not these
    residuals). Speed-optimal at the production working point is OFF;
    flip ON for memory-tighter configs (larger lanes x smaller model,
    longer sequences) before degrading lane count."""
    return os.environ.get("FAIRDIFF_COMPACT_RESIDUALS", "0") == "1"


def _compact(x):
    """[B,S,H,D] -> [B,S,H*D]: the minor-dim-D layout tile-pads D to the
    128-lane boundary in HBM (3.2x for SD-1.5's 40-wide heads — confirmed
    by a round-3 OOM dump, PERF.md); the merged H*D minor dim (320/640/1280)
    is lane-aligned and stores compact. Used ONLY for the custom_vjp
    residuals, which are held simultaneously for every attention layer of a
    grad program — the padded forms inside the kernels are transient temps."""
    B, S, H, D = x.shape
    return x.reshape(B, S, H * D)


@jax.custom_vjp
def flash_attention(q, k, v):
    return _fwd(q, k, v)


def _fa_fwd(q, k, v):
    pack = _compact if compact_residuals_enabled() else (lambda x: x)
    if os.environ.get("FAIRDIFF_FLASH_BWD", "pallas") == "recompute":
        return _fwd(q, k, v), (pack(q), pack(k), pack(v), None, None)
    o, lse = (
        _fwd_lse_sharded(q, k, v) if _partitioned() else _fwd_lse_impl(q, k, v)
    )
    # Compact mode saves one LSE lane per row (lanes are identical in the
    # broadcast stat layout): [B,H,s_pad] f32, 128x smaller than the
    # kernel's output buffer.
    return o, (pack(q), pack(k), pack(v), pack(o),
               lse[..., 0] if compact_residuals_enabled() else lse)


def _fa_bwd(res, g):
    qr, kr, vr, orr, lser = res
    B, S, H, D = g.shape
    T = kr.shape[1]

    def expand(x, n):
        # compact [B,n,H*D] residuals -> the kernels' [B,n,H,D]
        return x.reshape(B, n, H, D) if x is not None and x.ndim == 3 else x

    q, k, v = expand(qr, S), expand(kr, T), expand(vr, T)
    if lser is None:
        # XLA-recompute fallback (materialises the [S,T] score matrix)
        _, vjp = jax.vjp(_xla_attention, q, k, v)
        return vjp(g)
    o = expand(orr, S)
    lse = (
        jnp.broadcast_to(lser[..., None], (*lser.shape, LANES))
        if lser.ndim == 3
        else lser
    )
    if _partitioned():
        return _bwd_sharded(q, k, v, o, lse, g)
    return _bwd_impl(q, k, v, o, lse, g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
