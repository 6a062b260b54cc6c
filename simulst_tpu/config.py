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
    """Build the dataclass from a dict, coercing scalars to the field's
    annotated type: values arriving from checkpoint metadata / yaml can be
    numpy scalars or mis-typed (e.g. a float-stamped int), and a non-python
    int reaching a jaxpr parameter (conv feature_group_count, static loop
    bounds) is rejected by jax."""
    def to_bool(v):
        # bool("False") is True — string forms must be parsed, not cast
        if isinstance(v, str):
            low = v.strip().lower()
            if low in ("true", "1", "yes"):
                return True
            if low in ("false", "0", "no"):
                return False
            raise ValueError(f"can't interpret {v!r} as bool")
        return bool(v)

    def to_int(v):
        # int(2.5) would silently truncate corrupt metadata; only accept
        # integral values (ADVICE r3).  Covers numpy float scalars too.
        if not isinstance(v, (int, str)) and hasattr(v, "__float__"):
            f = float(v)
            if not f.is_integer():
                raise ValueError(f"int field got non-integral value {v!r}")
        return int(v)

    coerce = {"int": to_int, "float": float, "bool": to_bool, "str": str}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k in fields:
            if isinstance(v, list):
                v = tuple(v)
            ann = fields[k].type
            name = ann if isinstance(ann, str) else getattr(ann, "__name__", "")
            if v is not None and name in coerce:
                v = coerce[name](v)
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


def enable_compile_cache(path: str = None):
    """Persistent XLA compile cache for every CLI: the production models
    take minutes to compile through a remote-TPU tunnel, and re-runs with
    identical geometry (the common case for recipes/sweeps) then start
    instantly.  Override the location with SIMULST_JAX_CACHE; disable with
    SIMULST_JAX_CACHE=0."""
    import os
    import jax
    env = os.environ.get("SIMULST_JAX_CACHE")
    if env == "0":
        return
    path = env or path or os.path.expanduser("~/.cache/simulst_tpu/jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
