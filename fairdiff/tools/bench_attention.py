"""Microbenchmark: Pallas flash attention vs XLA attention on the real chip.

SD-1.5 UNet attention shapes (batch 4 = 2 images x CFG):
  64x64 latents: S=T=4096, H=8, D=40   (top blocks — the hot one)
  32x32 latents: S=T=1024, H=8, D=80
  16x16 latents: S=T= 256, H=8, D=160
  cross-attn:    S=4096,  T=77, H=8, D=40

Usage: python -m fairdiff.tools.bench_attention [--dtype bf16] [--grad]

--grad A/Bs the two Pallas backward implementations (split dq/dkv kernels
vs the merged single-pass kernel, FAIRDIFF_FLASH_BWD=pallas|merged) on
full fwd+bwd `jax.grad` calls, and checks their gradient agreement.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

from fairdiff.ops.flash_attention import _xla_attention, flash_attention

SHAPES = [
    ("self64", 8, 4096, 4096, 8, 40),
    ("self32", 8, 1024, 1024, 8, 80),
    ("self16", 8, 256, 256, 8, 160),
    ("cross64", 8, 4096, 77, 8, 40),
]


def timeit(fn, q, k, v, iters=50):
    """Time `iters` serialized calls inside ONE jit (a data-dependent scan),
    so per-dispatch tunnel latency doesn't dominate the measurement."""

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            o = fn(q + c, k, v)
            return (o.mean() * 1e-6).astype(q.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None, length=iters)
        return c

    float(loop(q, k, v))  # compile
    t0 = time.perf_counter()
    # value fetch: block_until_ready is dispatch-only on the tunnel backend
    float(loop(q, k, v))
    return (time.perf_counter() - t0) / iters


def timeit_grad(q, k, v, iters=20):
    """Time fwd+bwd (jax.grad) per call; traced under the CURRENT value of
    FAIRDIFF_FLASH_BWD (the env var is read at trace time)."""

    def loss(a, b, c):
        return (flash_attention(a, b, c).astype(jnp.float32) ** 2).sum()

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            g = jax.grad(loss, argnums=(0, 1, 2))(q + c, k, v)
            return (g[0].mean() * 1e-6).astype(q.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None, length=iters)
        return c

    float(loop(q, k, v))  # compile
    t0 = time.perf_counter()
    float(loop(q, k, v))
    dt = (time.perf_counter() - t0) / iters
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    return dt, [jnp.asarray(x, jnp.float32) for x in g]


def _flag_value(flag: str) -> str | None:
    """Value following `flag` in sys.argv, or None (missing / last arg)."""
    if flag not in sys.argv:
        return None
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv):
        raise SystemExit(f"{flag} requires a value")
    return sys.argv[i + 1]


def main_grad(dtype):
    key = jax.random.key(0)
    only = _flag_value("--only")
    modes_arg = _flag_value("--modes")
    modes = tuple(modes_arg.split(",")) if modes_arg else ("pallas", "merged")
    print(f"device={jax.devices()[0].platform} dtype={dtype.__name__} (fwd+bwd)")
    prior_bwd = os.environ.get("FAIRDIFF_FLASH_BWD")
    for name, b, s, t, h, d in SHAPES:
        if only is not None and name != only:
            continue
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, s, h, d), dtype)
        k = jax.random.normal(kk, (b, t, h, d), dtype)
        v = jax.random.normal(kv, (b, t, h, d), dtype)
        res = {}
        try:
            for mode in modes:
                os.environ["FAIRDIFF_FLASH_BWD"] = mode
                try:
                    res[mode] = timeit_grad(q, k, v)
                except Exception as e:
                    print(f"  {mode} failed on {name}: {type(e).__name__}: {e}")
        finally:
            # restore whatever the caller had set, not a bare unset
            if prior_bwd is None:
                os.environ.pop("FAIRDIFF_FLASH_BWD", None)
            else:
                os.environ["FAIRDIFF_FLASH_BWD"] = prior_bwd
        if len(res) == 1:
            ((mode, (t_one, _)),) = res.items()
            print(f"{name:8s} {mode} {t_one*1e3:8.3f} ms")
        if len(res) == 2:
            (t_sp, g_sp), (t_mg, g_mg) = res["pallas"], res["merged"]
            err = max(
                float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_sp, g_mg)
            )
            print(
                f"{name:8s} split {t_sp*1e3:8.3f} ms   merged {t_mg*1e3:8.3f} ms"
                f"   speedup {t_sp/t_mg:5.2f}x   max|dgrad| {err:.4f}"
            )


def main():
    dtype = jnp.bfloat16 if "--dtype" not in sys.argv or "bf16" in sys.argv else jnp.float32
    if "--grad" in sys.argv:
        return main_grad(dtype)
    key = jax.random.key(0)
    print(f"device={jax.devices()[0].platform} dtype={dtype.__name__}")
    for name, b, s, t, h, d in SHAPES:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, s, h, d), dtype)
        k = jax.random.normal(kk, (b, t, h, d), dtype)
        v = jax.random.normal(kv, (b, t, h, d), dtype)
        xla_fn = jax.jit(_xla_attention)
        fl_fn = jax.jit(flash_attention)
        t_xla = timeit(_xla_attention, q, k, v)
        try:
            t_fl = timeit(flash_attention, q, k, v)
            # numeric agreement
            err = float(
                jnp.max(jnp.abs(xla_fn(q, k, v).astype(jnp.float32)
                                - fl_fn(q, k, v).astype(jnp.float32)))
            )
        except Exception as e:
            t_fl, err = float("nan"), float("nan")
            print(f"  flash failed on {name}: {e}")
        print(
            f"{name:8s} xla {t_xla*1e3:8.3f} ms   flash {t_fl*1e3:8.3f} ms   "
            f"speedup {t_xla/t_fl:5.2f}x   max|err| {err:.4f}"
        )


if __name__ == "__main__":
    main()
