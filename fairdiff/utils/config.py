"""Config system: dataclass defaults + YAML override with type coercion.

Mirrors the reference's argparse-defaults-plus-YAML pattern
(exp-1-debias-gender/1-main-debias.py:327-644, YAML merge at :632-638 where
each YAML value is coerced through the argparse default's type) and
opensphere's hierarchical YAML with `base` inheritance
(opensphere/utils.py:32-52). Here the single source of truth is a frozen
dataclass; YAML/CLI overrides are coerced to the field's declared type, and
unknown keys are an error (the reference silently accepts them — a footgun
we do not reproduce).
"""

from __future__ import annotations

import argparse
import dataclasses
import typing
from pathlib import Path
from typing import Any, Type, TypeVar

import yaml

T = TypeVar("T")


def _coerce(value: Any, annot: Any) -> Any:
    origin = typing.get_origin(annot)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(annot) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0])
    if origin in (list, tuple):
        (item_t,) = typing.get_args(annot)[:1] or (str,)
        if isinstance(value, str):
            # CLI overrides arrive as one string: "0.2,0.3" -> items.
            # Never iterate a string char-by-char (a scalar "gender"
            # would silently become ('g','e','n',...))
            value = [v for v in (p.strip() for p in value.split(",")) if v]
        seq = [_coerce(v, item_t) for v in value]
        return tuple(seq) if origin is tuple else seq
    if annot is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if annot in (int, float, str):
        return annot(value)
    if dataclasses.is_dataclass(annot) and isinstance(value, dict):
        return from_dict(annot, value)
    return value


def from_dict(cls: Type[T], data: dict[str, Any]) -> T:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {k: _coerce(v, _resolve(cls, fields[k])) for k, v in data.items()}
    return cls(**kwargs)


def _resolve(cls: Type, field: dataclasses.Field) -> Any:
    hints = typing.get_type_hints(cls)
    return hints[field.name]


def merge(config: T, overrides: dict[str, Any]) -> T:
    """Return a copy of `config` with overrides applied (type-coerced)."""
    updates = {}
    for key, value in overrides.items():
        annot = _resolve(type(config), {f.name: f for f in dataclasses.fields(config)}[key])
        current = getattr(config, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[key] = merge(current, value)
        else:
            updates[key] = _coerce(value, annot)
    return dataclasses.replace(config, **updates)


def load_yaml(config: T, path: str | Path) -> T:
    """Apply a YAML override file on top of dataclass defaults
    (reference exp-1:632-638 semantics, with strict unknown-key checking)."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return merge(config, data)


def to_dict(config: Any) -> dict[str, Any]:
    return dataclasses.asdict(config)


def apply_platform(platform: str, num_cpu_devices: int = 0) -> None:
    """Select the jax backend from a CLI flag.

    The container's sitecustomize imports jax at interpreter boot with
    JAX_PLATFORMS=axon, so plain env vars are too late for CLIs — this
    goes through jax.config, which works any time before first backend
    use. `platform="cpu"` + num_cpu_devices=N gives the virtual N-device
    CPU mesh used for multi-chip testing (SURVEY.md §4)."""
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    if platform == "cpu" and num_cpu_devices:
        jax.config.update("jax_num_cpu_devices", num_cpu_devices)


def cli_parse(cls: Type[T], argv: list[str] | None = None) -> T:
    """argparse front-end: `--config file.yaml` plus `--key value` overrides
    for any scalar dataclass field (parity with the reference CLIs)."""
    parser = argparse.ArgumentParser()
    hints = typing.get_type_hints(cls)
    field_names: set[str] = set()
    for f in dataclasses.fields(cls):
        annot = hints[f.name]
        if dataclasses.is_dataclass(annot):
            continue
        parser.add_argument(f"--{f.name}", type=str, default=None)
        field_names.add(f.name)
    # when the dataclass itself has a `config` field (the facerec CLIs:
    # it names the experiment YAML, not a dataclass-override YAML),
    # --config sets that field like any other; otherwise --config loads
    # a YAML of dataclass-field overrides
    if "config" not in field_names:
        parser.add_argument("--config", type=str, default=None)
    ns = parser.parse_args(argv)
    cfg = cls()
    if "config" not in field_names and ns.config:
        cfg = load_yaml(cfg, ns.config)
    overrides = {
        k: v
        for k, v in vars(ns).items()
        if k in field_names and v is not None
    }
    if overrides:
        cfg = merge(cfg, overrides)
    return cfg
