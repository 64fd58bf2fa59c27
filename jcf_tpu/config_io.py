"""YAML config loading (the reference's ``parse_args.py`` + ``default.yaml``
capability — yaml-defaulted flags, SURVEY.md §2.6/§5 — done properly: a
yaml file maps onto the typed PipelineConfig tree; unknown keys fail fast).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import yaml

from jcf_tpu.config import PipelineConfig


def _merge_into(dc, overrides: Dict[str, Any]):
    """Recursively apply a nested dict onto a (frozen) dataclass tree."""
    updates = {}
    fields = {f.name: f for f in dataclasses.fields(dc)}
    for key, value in overrides.items():
        if key not in fields:
            raise KeyError(
                f"Unknown config key {key!r} for {type(dc).__name__}; "
                f"valid keys: {sorted(fields)}"
            )
        current = getattr(dc, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[key] = _merge_into(current, value)
        elif isinstance(current, tuple) and isinstance(value, list):
            updates[key] = tuple(value)
        else:
            updates[key] = value
    return dataclasses.replace(dc, **updates)


def load_config(path: str, base: PipelineConfig | None = None) -> PipelineConfig:
    with open(path) as f:
        overrides = yaml.safe_load(f) or {}
    return _merge_into(base or PipelineConfig(), overrides)


def dump_config(cfg: PipelineConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
