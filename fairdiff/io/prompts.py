"""Prompt JSON loading (reference data contract, SURVEY.md §2.3).

data/1-prompts/occupation.json keys (exp-1-debias-gender/1-main-debias.py:
906-924, gen-images.py:542-544):
  prompt_templates_train, occupations_train_set,
  prompt_templates_test, occupations_val_set, test_prompts
exp-5 files (occupation_w_style_and_context.json, personal_descriptor.json,
sports.json) carry train_prompts / val_prompts / test_prompts directly with
per-domain repetition factors (exp-5:551-565,:937-954).
"""

from __future__ import annotations

import json
from pathlib import Path


def load_occupation_prompts(path: str | Path) -> dict:
    with open(path) as f:
        data = json.load(f)
    out = dict(data)
    if "prompt_templates_train" in data:
        out.setdefault(
            "train_prompts",
            [
                t.format(occupation=o) if "{occupation}" in t else t.replace("{}", o)
                for t in data["prompt_templates_train"]
                for o in data.get("occupations_train_set", [])
            ],
        )
    if "prompt_templates_test" in data:
        out.setdefault(
            "val_prompts",
            [
                t.format(occupation=o) if "{occupation}" in t else t.replace("{}", o)
                for t in data["prompt_templates_test"]
                for o in data.get("occupations_val_set", [])
            ],
        )
    return out


def load_multi_domain_prompts(paths: list[str | Path], repeats: list[int]) -> dict:
    """exp-5 mixing: concatenate domains with per-domain repetition
    (x1/x6/x20/x4 at exp-5:947)."""
    train, val, test = [], [], []
    for path, rep in zip(paths, repeats):
        dd = load_occupation_prompts(path)
        train += list(dd.get("train_prompts", [])) * rep
        val += list(dd.get("val_prompts", []))
        test += list(dd.get("test_prompts", []))
    return {"train_prompts": train, "val_prompts": val, "test_prompts": test}
