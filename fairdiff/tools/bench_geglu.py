"""Microbenchmark: fused GEGLU Pallas kernel vs the XLA composition.

SD-1.5 UNet feed-forward shapes (rows = CFG-pair batch 16 x tokens):
  64x64 latents: T=4096, d= 320  (the hot one)
  32x32 latents: T=1024, d= 640
  16x16 latents: T= 256, d=1280
  mid block:     T=  64, d=1280

Times the forward and the dx backward (the production gradient: the
feed-forward weights are frozen, LoRA targets attention only, so dW/db
are DCE'd). Reference GEGLU semantics: diffusers-0.19.3 h * gelu(gate)
as consumed at exp-1-debias-gender/1-main-debias.py:722-794.

Usage: python -m fairdiff.tools.bench_geglu [--batch N] [--iters N]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from fairdiff.ops.geglu import fused_geglu

SHAPES = [  # (name, tokens, dim)
    ("ff64", 4096, 320),
    ("ff32", 1024, 640),
    ("ff16", 256, 1280),
    ("ffmid", 64, 1280),
]


def _arg(flag: str, default: int) -> int:
    for a in sys.argv:
        if a.startswith(flag + "="):
            return int(a.split("=")[1])
    return default


def xla_geglu(x, w, b):
    proj = x @ w + b
    h, gate = jnp.split(proj, 2, axis=-1)
    return h * jax.nn.gelu(
        gate.astype(jnp.float32), approximate=False
    ).astype(x.dtype)


def timeit(fn, args, iters):
    """Serialize `iters` calls inside ONE jit (data-dependent scan) so
    per-dispatch tunnel latency doesn't dominate the measurement."""

    @jax.jit
    def loop(*args):
        def body(c, _):
            o = fn(args[0] + c, *args[1:])
            return (o.reshape(-1)[0] * 1e-6).astype(args[0].dtype), None

        c, _ = jax.lax.scan(
            body, jnp.zeros((), args[0].dtype), None, length=iters
        )
        return c

    float(loop(*args))  # compile + run (block_until_ready is dispatch-only here)
    t0 = time.perf_counter()
    float(loop(*args))  # value fetch: block_until_ready is dispatch-only here
    return (time.perf_counter() - t0) / iters


def main():
    batch = _arg("--batch", 16)
    iters = _arg("--iters", 20)
    key = jax.random.key(0)
    print(f"device={jax.devices()[0].platform} batch={batch} bf16")
    for name, T, d in SHAPES:
        inner = 4 * d
        kx, kw, kb, kc = jax.random.split(jax.random.fold_in(key, d + T), 4)
        x = jax.random.normal(kx, (batch * T, d), jnp.bfloat16)
        w = (jax.random.normal(kw, (d, 2 * inner)) * d**-0.5).astype(jnp.bfloat16)
        b = (jax.random.normal(kb, (2 * inner,)) * 0.1).astype(jnp.bfloat16)
        cot = jax.random.normal(kc, (batch * T, inner), jnp.bfloat16)

        for tag, fn in (("xla", xla_geglu), ("fused", fused_geglu)):
            def dx(x, w, b, fn=fn):
                loss = lambda x: jnp.sum(
                    fn(x, w, b).astype(jnp.float32) * cot.astype(jnp.float32)
                )
                return jax.grad(loss)(x)

            try:
                t_f = timeit(fn, (x, w, b), iters)
                t_b = timeit(dx, (x, w, b), iters)
                msg = f"fwd {t_f*1e3:8.3f} ms   dx {t_b*1e3:8.3f} ms"
            except Exception as e:  # surface per-shape kernel failures
                msg = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
            print(f"{name:6s} d={d:4d} [{tag:5s}] {msg}", flush=True)

        err = float(jnp.max(jnp.abs(
            jax.jit(fused_geglu)(x, w, b).astype(jnp.float32)
            - jax.jit(xla_geglu)(x, w, b).astype(jnp.float32)
        )))
        print(f"{name:6s} max|fused-xla| = {err:.5f}")


if __name__ == "__main__":
    main()
