"""Explicit PRNG-key plumbing.

The reference relies on implicit global torch RNG: `set_seed(seed,
device_specific=True)` so ranks draw different noise (exp-1:693), rank-0
broadcasts of sampled step counts (exp-1:1779-1781), and a deterministic
per-(prompt, image-index) noise bank built with Python's unsalted `hash`
(gen-images.py:546-557). JAX replaces all of that with explicit key trees:

- `noise_key(root, step, device_index)` — same prompt everywhere, distinct
  noise per mesh position, no broadcast needed (determinism from the key).
- `prompt_noise_key(root, prompt, index)` — the gen-images noise bank, but
  with a *stable* hash (blake2b) instead of Python's per-process `hash`.
- `step_count_key` — the shared 19..23 step draw: every host computes the
  same value from the same key, replacing `broadcast_object_list`.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def stable_hash(text: str, bits: int = 31) -> int:
    """Deterministic cross-process string hash (replaces Python `hash` in
    gen-images.py:551, which is salted per process and thus unreproducible)."""
    digest = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(digest, "little") % (1 << bits)


def noise_key(root: jax.Array, step: int, lane: int = 0) -> jax.Array:
    """Per-train-step, per-sample-lane noise key (exp-1:1746-1749 semantics:
    identical prompt across ranks, distinct noises)."""
    return jax.random.fold_in(jax.random.fold_in(root, step), lane)


def prompt_noise_key(root: jax.Array, prompt: str, index: int) -> jax.Array:
    """Deterministic per-(prompt, image-index) key — the gen-images noise
    bank (gen-images.py:546-557)."""
    return jax.random.fold_in(
        jax.random.fold_in(root, stable_hash(prompt)), index
    )


def step_count_key(root: jax.Array, step: int) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(root, 0x5E9), step)


def sample_num_denoising_steps(
    root: jax.Array, step: int, low: int = 19, high: int = 23
) -> int:
    """Uniform draw from {low..high}, identical on all hosts given the same
    root key (replaces exp-1:1779-1781 rank-0 draw + broadcast)."""
    k = step_count_key(root, step)
    return int(jax.random.randint(k, (), low, high + 1))
