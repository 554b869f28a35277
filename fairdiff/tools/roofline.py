"""Per-kernel roofline ledger for the exp-1 train step (PERF.md r5).

Substantiates (or breaks) the claimed ~31-33 chip*s practical floor by
measuring each kernel class against ITS OWN roofline on this chip,
instead of the program-level 45% MFU average:

  python -m fairdiff.tools.roofline --mode flash      # on the TPU
  python -m fairdiff.tools.roofline --mode programs   # on the TPU
  python -m fairdiff.tools.roofline --mode report     # join + markdown

--mode flash times the four production attention shapes through each
Pallas kernel INDIVIDUALLY (fwd via _flash_forward; dq/dkv via the
factored _dq_pallas/_dkv_pallas on prepped operands) and bills them two
ways: useful FLOPs (d=40) and MXU-billed FLOPs (the 128-lane systolic
array computes the padded width whether we use it or not). "% roof" is
billed-TFLOPS / peak — a kernel at ~100% is AT the hardware's ceiling
and its useful-FLOPS deficit is the d=40 padding tax, not kernel slack.

--mode programs builds the two dominant UNet programs at the production
working point (CFG batch 16, bf16): the forward (phases 1/3) and the
context-cotangent VJP (the linearized phase 4 pair program: adapters
ride the text path, so convs run dx-only and frozen dw is DCE'd). Each
runs alone under the JAX profiler; trace buckets (conv / fusion / flash
/ copy) are joined with analytic conv+dense FLOP inventories (recorded
by shape-tracing flax Conv/Dense calls) and the compiled programs'
cost_analysis() FLOPs/bytes.

Results are saved as JSON next to the trace dirs; --mode report renders
the PERF.md table.

Hardware constants: TPU v5e ~197 TFLOPS bf16, ~819 GB/s HBM.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fairdiff.utils import config as cfglib

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0
MXU_LANES = 128

# (name, B, S, T, H, D) — the four production attention shapes at the
# CFG-16 dispatch batch. Rows are per-call and deliberately unweighted;
# step-level totals depend on the phase structure (5 self4096 layers
# per UNet pass, 57 pair-VJP chunks etc. — see the PERF.md ledger
# narrative for the weighting).
ATTN_SHAPES = [
    ("self4096", 16, 4096, 4096, 8, 40),
    ("self1024", 16, 1024, 1024, 8, 80),
    ("self256", 16, 256, 256, 8, 160),
    ("cross4096", 16, 4096, 77, 8, 40),
]


def _flash_flops(B, S, T, H, D, kind: str):
    """(useful, mxu_billed) FLOPs for one call.

    Matmul inventory (PERF.md r4): fwd = 2 passes (QK^T, PV); dq = 3
    (QK^T recompute, dO V^T, dS K); dkv = 4 (QK^T recompute, dO V^T,
    P^T dO, dS^T Q). Billing: every pass contracts or outputs over D,
    which the MXU tiles at 128 lanes -> billed D = 128 when D < 128.
    (S/T dims are 128-aligned at these shapes except T=77 -> 128.)
    """
    passes = {"fwd": 2, "dq": 3, "dkv": 4}[kind]
    t_pad = -(-T // MXU_LANES) * MXU_LANES
    d_pad = max(D, MXU_LANES)
    useful = 2.0 * B * H * S * T * D * passes
    billed = 2.0 * B * H * S * t_pad * d_pad * passes
    return useful, billed


def _flash_bytes(B, S, T, H, D, kind: str, dtype_bytes=2):
    """Minimum HBM traffic (each operand read once, outputs written
    once; lse/delta are f32 [B*H, s_pad, 128] broadcast stats)."""
    q = B * S * H * D * dtype_bytes
    kv = 2 * B * T * H * D * dtype_bytes
    o = B * S * H * D * dtype_bytes
    stat = B * H * S * MXU_LANES * 4
    if kind == "fwd":
        return q + kv + o + stat  # read q,k,v write o,lse
    if kind == "dq":
        return 2 * q + kv + o + 2 * stat  # read q,k,v,dO,lse,delta write dq
    return 2 * q + 2 * kv + o + 2 * stat  # dkv: + write dk,dv


def _time_loop(fn, args, iters=30):
    """Serialized calls inside one jit so tunnel dispatch latency doesn't
    dominate (bench_attention pattern); returns seconds/call."""

    @jax.jit
    def loop(*args):
        def body(c, _):
            out = fn(*((args[0] + c,) + args[1:]))
            leaf = out[0] if isinstance(out, (tuple, list)) else out
            return (leaf.mean() * 1e-6).astype(args[0].dtype), None

        c, _ = jax.lax.scan(
            body, jnp.zeros((), args[0].dtype), None, length=iters
        )
        return c

    float(loop(*args))  # compile
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def mode_flash(out_path: str, dtype=jnp.bfloat16, iters=30):
    from fairdiff.ops import flash_attention as fa

    key = jax.random.key(0)
    rows = []
    for name, B, S, T, H, D in ATTN_SHAPES:
        kq, kk, kv, kg = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, S, H, D), dtype)
        k = jax.random.normal(kk, (B, T, H, D), dtype)
        v = jax.random.normal(kv, (B, T, H, D), dtype)
        g = jax.random.normal(kg, (B, S, H, D), dtype)

        # fwd (with lse, as the custom_vjp runs it)
        t_fwd = _time_loop(
            lambda q, k, v: fa._flash_forward(q, k, v, with_lse=True)[0],
            (q, k, v), iters,
        )

        # prepped operands + stats for the backward kernels — via the
        # SAME helper _flash_backward uses, so the ledger measures the
        # kernels on exactly the operands production produces
        o, lse = jax.jit(
            lambda q, k, v: fa._flash_forward(q, k, v, with_lse=True)
        )(q, k, v)
        qp, kp, vp, gp, delta = jax.block_until_ready(
            jax.jit(
                lambda q, k, v, o, g: fa._bwd_operands(q, k, v, o, g)[:5]
            )(q, k, v, o, g)
        )
        bt = fa._block_t(T)  # static python int (jit would trace it)
        scale = D ** -0.5
        t_dq = _time_loop(
            lambda qp, kp, vp, gp, lse, delta: fa._dq_pallas(
                qp, kp, vp, gp, lse, delta, scale=scale, T=T, bt=bt
            ),
            (qp, kp, vp, gp, lse, delta), iters,
        )
        t_dkv = _time_loop(
            lambda qp, kp, vp, gp, lse, delta: fa._dkv_pallas(
                qp, kp, vp, gp, lse, delta, scale=scale, bt=bt
            )[0],
            (qp, kp, vp, gp, lse, delta), iters,
        )

        for kind, t in (("fwd", t_fwd), ("dq", t_dq), ("dkv", t_dkv)):
            useful, billed = _flash_flops(B, S, T, H, D, kind)
            byts = _flash_bytes(B, S, T, H, D, kind)
            rows.append({
                "shape": name, "kernel": kind, "ms": t * 1e3,
                "useful_tflops": useful / t / 1e12,
                "billed_tflops": billed / t / 1e12,
                "pct_mxu_roof": 100.0 * billed / t / 1e12 / PEAK_TFLOPS,
                "gbs": byts / t / 1e9,
                "pct_hbm_roof": 100.0 * byts / t / 1e9 / PEAK_GBS,
            })
            print(
                f"{name:10s} {kind:4s} {t*1e3:8.3f} ms  "
                f"useful {useful/t/1e12:6.1f} TF/s  "
                f"billed {billed/t/1e12:6.1f} TF/s "
                f"({100*billed/t/1e12/PEAK_TFLOPS:5.1f}% MXU roof)  "
                f"{byts/t/1e9:6.0f} GB/s ({100*byts/t/1e9/PEAK_GBS:5.1f}% HBM)",
                flush=True,
            )
    Path(out_path).write_text(json.dumps(rows, indent=1))
    print(f"-> {out_path}")
    return rows


# ---------------------------------------------------------------------------
# analytic conv / dense inventory via shape-tracing
# ---------------------------------------------------------------------------

def layer_inventory(apply_fn, *abstract_args):
    """eval_shape apply_fn while recording every flax Conv/Dense call's
    shapes; returns {"conv_flops", "dense_flops", "conv_calls",
    "dense_calls"} for ONE forward pass."""
    import flax.linen as nn

    conv, dense = [], []
    orig_conv, orig_dense = nn.Conv.__call__, nn.Dense.__call__

    def conv_spy(self, x):
        y = orig_conv(self, x)
        conv.append((tuple(x.shape), tuple(y.shape), tuple(self.kernel_size)))
        return y

    def dense_spy(self, x):
        y = orig_dense(self, x)
        dense.append((tuple(x.shape), tuple(y.shape)))
        return y

    nn.Conv.__call__, nn.Dense.__call__ = conv_spy, dense_spy
    try:
        jax.eval_shape(apply_fn, *abstract_args)
    finally:
        nn.Conv.__call__, nn.Dense.__call__ = orig_conv, orig_dense

    conv_flops = sum(
        2.0 * np.prod(ys) * xs[-1] * np.prod(ks)
        for xs, ys, ks in conv
    )
    dense_flops = sum(2.0 * np.prod(ys) * xs[-1] for xs, ys in dense)
    return {
        "conv_flops": float(conv_flops),
        "dense_flops": float(dense_flops),
        "conv_calls": len(conv),
        "dense_calls": len(dense),
    }


def _build_unet_programs():
    """(fwd_jit, vjp_jit, example args, inventory) at the production
    working point: SD-1.5 UNet, CFG batch 16 bf16, 64x64 latents,
    77-token context."""
    from fairdiff.models.unet2d import UNet2DCondition, UNetConfig

    cfg = UNetConfig.sd15()
    # remat=True mirrors the production trainer (StableDiffusion(...,
    # remat=True)): each UNet block recomputes its forward inside the
    # backward, so the ctx-VJP program's conv work = fwd + recompute +
    # dx = 3x the one-pass inventory (frozen dw is DCE'd)
    net = UNet2DCondition(
        cfg, dtype=jnp.bfloat16, remat=True,
        use_flash=jax.default_backend() == "tpu",
    )
    B = 16
    x = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    ctx_sds = jax.ShapeDtypeStruct((B, 77, cfg.cross_attention_dim), jnp.bfloat16)

    params_sds = jax.eval_shape(
        lambda k: net.init(k, x, t, jnp.zeros(ctx_sds.shape, ctx_sds.dtype)),
        jax.random.key(0),
    )["params"]

    def fill(sds_tree):
        leaves, treedef = jax.tree_util.tree_flatten(sds_tree)

        @jax.jit
        def go():
            return [jnp.full(l.shape, 0.02, l.dtype) for l in leaves]

        return jax.tree_util.tree_unflatten(treedef, go())

    params = fill(params_sds)
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t
    )
    params = bf16(params)
    ctx = jnp.full(ctx_sds.shape, 0.1, ctx_sds.dtype)

    def fwd(params, ctx):
        return net.apply({"params": params}, x, t, ctx)

    def ctx_vjp(params, ctx, cot):
        # the linearized pair program's shape: eps cotangent in, grads
        # toward the TEXT path out (TE-LoRA rides context; frozen conv
        # dw is dead and XLA DCEs it -> convs run dx only)
        _, pull = jax.vjp(lambda c: fwd(params, c), ctx)
        return pull(cot)[0]

    inv = layer_inventory(fwd, params_sds, ctx_sds)
    cot = jnp.ones((B, 64, 64, 4), jnp.bfloat16)
    return (
        jax.jit(fwd), jax.jit(ctx_vjp), (params, ctx, cot), inv,
    )


def mode_programs(out_dir: str, iters: int = 8):
    """Trace the UNet fwd and ctx-VJP programs each alone; save bucket
    times + cost_analysis + analytic inventory."""
    from fairdiff.utils.trace_summary import summarize_trace

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    fwd, vjp, (params, ctx, cot), inv = _build_unet_programs()
    print(f"inventory (one fwd pass): {inv}", flush=True)

    results = {"inventory": inv, "iters": iters}
    for name, fn, args in (
        ("fwd", fwd, (params, ctx)),
        ("ctx_vjp", vjp, (params, ctx, cot)),
    ):
        print(f"[{name}] compiling...", flush=True)
        lowered = fn.lower(*args)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            cost = {
                "flops": float(ca.get("flops", -1)),
                "bytes": float(ca.get("bytes accessed", -1)),
            }
        except Exception as e:  # noqa: BLE001 - backend-dependent
            cost = {"error": str(e)}
        print(f"[{name}] cost_analysis: {cost}", flush=True)

        r = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])[(0,) * 0]  # force
        t0 = time.time()
        for _i in range(iters):
            r = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        dt = (time.time() - t0) / iters
        print(f"[{name}] {dt*1e3:.1f} ms/call", flush=True)

        tdir = out / f"trace_{name}"
        with jax.profiler.trace(str(tdir)):
            for _i in range(iters):
                r = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        summ = summarize_trace(tdir, top=15)
        per_call = {
            k: v / iters for k, v in summ["by_bucket"].items()
        }
        print(f"[{name}] buckets ms/call: "
              + " ".join(f"{k}={v*1e3:.1f}" for k, v in per_call.items()),
              flush=True)
        results[name] = {
            "s_per_call": dt,
            "cost_analysis": cost,
            "bucket_s_per_call": per_call,
            "top_ops": [[n, s / iters, c] for n, s, c in summ["top_ops"]],
        }
    (out / "programs.json").write_text(json.dumps(results, indent=1))
    print(f"-> {out / 'programs.json'}")
    return results


def mode_report(flash_json: str, programs_json: str) -> str:
    """Render the PERF.md ledger from saved measurements."""
    rows = json.loads(Path(flash_json).read_text())
    prog = json.loads(Path(programs_json).read_text())
    lines = [
        "| kernel | ms/call | useful TF/s | billed TF/s | % MXU roof | GB/s | % HBM roof |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| flash {r['kernel']} {r['shape']} | {r['ms']:.2f} | "
            f"{r['useful_tflops']:.1f} | {r['billed_tflops']:.1f} | "
            f"{r['pct_mxu_roof']:.0f}% | {r['gbs']:.0f} | "
            f"{r['pct_hbm_roof']:.0f}% |"
        )
    inv = prog["inventory"]
    for name in ("fwd", "ctx_vjp"):
        p = prog[name]
        dt = p["s_per_call"]
        conv_t = p["bucket_s_per_call"].get("conv", 0.0)
        # conv FLOPs: fwd = inventory; ctx_vjp = fwd + block remat
        # recompute + dx (frozen dw DCE'd) = 3x one pass
        factor = 1.0 if name == "fwd" else 3.0
        conv_tf = inv["conv_flops"] * factor / max(conv_t, 1e-9) / 1e12
        ca = p.get("cost_analysis", {})
        mfu = (
            100.0 * ca["flops"] / dt / 1e12 / PEAK_TFLOPS
            if ca.get("flops", -1) > 0 else float("nan")
        )
        bw = (
            ca["bytes"] / dt / 1e9 if ca.get("bytes", -1) > 0
            else float("nan")
        )
        lines.append(
            f"| {name} program (total) | {dt*1e3:.1f} | — | — | "
            f"{mfu:.0f}% MFU | {bw:.0f} | {100*bw/PEAK_GBS:.0f}% |"
        )
        if conv_t > 0:
            lines.append(
                f"| {name} conv bucket | {conv_t*1e3:.1f} | {conv_tf:.1f} | "
                f"{conv_tf:.1f} | {100*conv_tf/PEAK_TFLOPS:.0f}% | — | — |"
            )
        else:
            # no conv bucket in this trace (bucketing change or convs
            # folded into fusions) — render a dash, not a div-by-eps
            lines.append(f"| {name} conv bucket | — | — | — | — | — | — |")
    report = "\n".join(lines)
    print(report)
    return report


@dataclasses.dataclass(frozen=True)
class RooflineConfig:
    mode: str = "flash"  # flash | programs | report
    out_dir: str = "/tmp/roofline"
    iters: int = 30
    prog_iters: int = 8


def main(cfg: RooflineConfig):
    out = Path(cfg.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if cfg.mode == "flash":
        return mode_flash(str(out / "flash.json"), iters=cfg.iters)
    if cfg.mode == "programs":
        return mode_programs(str(out), iters=cfg.prog_iters)
    if cfg.mode == "report":
        return mode_report(str(out / "flash.json"), str(out / "programs.json"))
    raise SystemExit(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    main(cfglib.cli_parse(RooflineConfig))
