"""YAML config tree with recursive `base_config` include-merge.

Replaces the reference's OmegaConf usage (`src/util/config_util.py:8-27`):
a config file may list `base_config: [paths...]`; bases are merged in order,
then the file itself wins. Access is attribute-style or dict-style.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access, recursive over nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def recursive_load_config(path: str) -> Config:
    """config_util.py:8-27: depth-first include-merge of `base_config`."""
    conf = load_yaml(path)
    merged: Dict = {}
    for base in conf.get("base_config", []):
        assert os.path.exists(base), f"base config not found: {base}"
        merged = _merge(merged, dict(recursive_load_config(base)))
    merged = _merge(merged, conf)
    merged.pop("base_config", None)
    return Config(merged)


def find_value_in_omegaconf(search_key: str, config) -> List[Any]:
    """config_util.py:30-44: collect every value under `search_key` anywhere
    in the tree."""
    found: List[Any] = []

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == search_key:
                    found.append(v)
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(config)
    return found
