"""Unified typed config system.

Replaces the reference's three overlapping config systems (SURVEY.md §5.6:
fairseq argparse/Hydra archs, data config yaml, inference config yaml) with
dataclass configs + one yaml file + dotted CLI overrides.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Type


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def from_dict(cls: Type, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k in fields:
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
    return cls(**kwargs)


def apply_overrides(cfg, overrides: Dict[str, Any]):
    """Dotted-key overrides onto a (frozen) dataclass config."""
    d = to_dict(cfg)
    for k, v in overrides.items():
        d[k] = v
    return from_dict(type(cfg), d)


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml
    with open(path) as f:
        return yaml.safe_load(f) or {}


def parse_override(s: str):
    """'key=value' with json-ish value parsing."""
    k, v = s.split("=", 1)
    try:
        v = json.loads(v)
    except json.JSONDecodeError:
        pass
    return k, v
