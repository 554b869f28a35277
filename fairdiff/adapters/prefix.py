"""Soft prompt prefix ("fair tokens") — the exp-2 adapter.

Reference: `FairEmbeddings` (exp-2-debias-gender-token/1-main-debias.py:86-123)
adds `<common-token{i}>` placeholder tokens to the tokenizer (:125-145),
initialises their embeddings by copying random existing rows, and splices
the trainable rows into the frozen embedding output via a patched CLIP
forward (:357-448). Here the text model natively accepts `inputs_embeds`,
so the adapter is just: a trainable table [P, d] + a splice function.

The prefix token ids are given ids >= vocab_size; pooling-by-argmax then
points at a prefix position — the same knowingly-wrong pooled output the
reference keeps (gen-images.py:256). SD uses last_hidden_state only, so
generation parity is unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_prefix(
    token_embedding: jax.Array,  # frozen table [V, d]
    num_tokens: int,
    key: jax.Array,
) -> jax.Array:
    """Trainable prefix table [P, d], rows copied from random existing
    token embeddings (reference :125-145 init semantics)."""
    idx = jax.random.randint(key, (num_tokens,), 0, token_embedding.shape[0])
    return jnp.asarray(token_embedding)[idx]


def prepend_prefix_ids(
    input_ids: jnp.ndarray,  # [B, S] with BOS at position 0
    num_tokens: int,
    vocab_size: int,
    max_length: int = 77,
) -> jnp.ndarray:
    """Insert P synthetic ids (vocab_size..vocab_size+P-1) after BOS,
    truncating to max_length (reference prompt_debiaser = prefix + prompt,
    exp-2:936)."""
    B, S = input_ids.shape
    prefix_ids = jnp.arange(vocab_size, vocab_size + num_tokens, dtype=input_ids.dtype)
    out = jnp.concatenate(
        [input_ids[:, :1], jnp.tile(prefix_ids[None], (B, 1)), input_ids[:, 1:]],
        axis=1,
    )
    return out[:, :max_length]


def splice_prefix_embeds(
    token_embedding: jax.Array,  # [V, d] frozen
    prefix_table: jax.Array,  # [P, d] trainable
    input_ids: jax.Array,  # [B, S], may contain ids >= V for prefix slots
) -> jax.Array:
    """Embedding lookup where ids >= V index the trainable prefix table.
    Differentiable only in `prefix_table` (the frozen table may be
    stop_gradient'ed by the caller)."""
    V = token_embedding.shape[0]
    is_prefix = input_ids >= V
    base = jnp.take(token_embedding, jnp.where(is_prefix, 0, input_ids), axis=0)
    pref = jnp.take(prefix_table, jnp.where(is_prefix, input_ids - V, 0), axis=0)
    return jnp.where(is_prefix[..., None], pref, base)
