"""Tokenizer access.

Real runs use the SD-1.5 CLIP tokenizer from a local checkpoint directory
(the reference's `CLIPTokenizer.from_pretrained(..., subfolder="tokenizer")`,
exp-1:722). Environments without tokenizer assets (CI, random-init smoke
runs) get a deterministic hash tokenizer with the same call contract, so
every downstream path — padding, masks, eos pooling — still exercises.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from fairdiff.utils.rng import stable_hash


@dataclasses.dataclass
class Tokenized:
    input_ids: np.ndarray  # [B, S] int32
    attention_mask: np.ndarray  # [B, S] int32


class HashTokenizer:
    """Deterministic stand-in tokenizer (bos/eos/pad semantics match CLIP)."""

    def __init__(self, vocab_size: int = 49408, model_max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self.bos_token_id = vocab_size - 2
        self.eos_token_id = vocab_size - 1
        self.pad_token_id = vocab_size - 1  # CLIP pads with eos

    def __call__(
        self, texts: list[str], padding: str = "longest", max_length: int | None = None
    ) -> Tokenized:
        max_length = max_length or self.model_max_length
        seqs = []
        for t in texts:
            words = t.lower().split()[: max_length - 2]
            ids = [self.bos_token_id]
            ids += [stable_hash(w) % (self.vocab_size - 2) for w in words]
            ids.append(self.eos_token_id)
            seqs.append(ids)
        if padding == "max_length":
            width = max_length
        else:
            width = max(len(s) for s in seqs)
        ids = np.full((len(seqs), width), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s[:width]
            mask[i, : len(s)] = 1
        return Tokenized(ids, mask)


def load_tokenizer(path: str | Path | None):
    """CLIPTokenizer from a local dir if available, else HashTokenizer."""
    if path is not None and Path(path).exists():
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(str(path))

        class _Wrap:
            vocab_size = tok.vocab_size
            model_max_length = tok.model_max_length
            eos_token_id = tok.eos_token_id
            bos_token_id = tok.bos_token_id

            def __call__(self, texts, padding="longest", max_length=None):
                out = tok(
                    texts,
                    padding="max_length" if padding == "max_length" else True,
                    max_length=max_length or tok.model_max_length,
                    truncation=True,
                    return_tensors="np",
                )
                return Tokenized(
                    out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32),
                )

        return _Wrap()
    return HashTokenizer()
