"""Minimal yacs-compatible configuration tree.

Reproduces the subset of the yacs ``CfgNode`` API that the reference uses
(``get_cfg_defaults``, ``merge_from_file``, ``clone``, attribute access;
see reference config/defaults.py:1-127) without depending on yacs. Values
are plain Python scalars/lists; nested nodes are ``CfgNode``.
"""

from __future__ import annotations

import copy
from typing import Any

import yaml


class CfgNode(dict):
    """A dict with attribute access and recursive YAML merging."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def clone(self) -> "CfgNode":
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other: dict) -> None:
        _merge_into(other, self, [])

    def merge_from_file(self, cfg_filename: str, _seen=None) -> None:
        import os

        # cycle guard: a self- or mutually-referencing _BASE_ chain must
        # be a clear error, not a RecursionError 1000 frames later
        path = os.path.abspath(cfg_filename)
        seen = _seen if _seen is not None else []
        if path in seen:
            raise ValueError(
                "_BASE_ include cycle: " + " -> ".join(seen + [path]))
        seen = seen + [path]
        with open(cfg_filename, "r") as f:
            loaded = yaml.safe_load(f)
        if loaded is None:
            return
        # `_BASE_: other.yaml` (path relative to this file) merges the
        # base first, then this file's overrides on top — used by the
        # config/train_*_tpu.yaml operating-point variants so the scene
        # hyperparameters live in exactly one place.
        base = loaded.pop("_BASE_", None)
        if base is not None:
            self.merge_from_file(
                os.path.join(os.path.dirname(path), base), _seen=seen
            )
        _merge_into(loaded, self, [])

    def merge_from_list(self, opts: list) -> None:
        assert len(opts) % 2 == 0, f"override list must be key/value pairs: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"non-existent config key: {key}")
            node[leaf] = _coerce(value, node[leaf], key)

    def dump(self) -> str:
        return yaml.safe_dump(_to_plain(self), sort_keys=False)

    def freeze(self) -> None:  # kept for API compatibility; no-op
        pass

    def defrost(self) -> None:  # kept for API compatibility; no-op
        pass


def _to_plain(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _to_plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_to_plain(v) for v in node]
    return node


def _merge_into(src: dict, dst: CfgNode, path: list) -> None:
    for key, value in src.items():
        full = ".".join(path + [str(key)])
        if key not in dst:
            raise KeyError(f"non-existent config key: {full}")
        old = dst[key]
        if isinstance(old, CfgNode) and isinstance(value, dict):
            _merge_into(value, old, path + [str(key)])
        elif isinstance(old, CfgNode) != isinstance(value, dict):
            raise TypeError(f"config type mismatch at {full}")
        else:
            dst[key] = _coerce(value, old, full)


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Coerce a YAML/CLI value toward the type of the default value.

    Like yacs, string values are first passed through ast.literal_eval so
    YAML scalars such as ``None`` or ``(4,)`` become Python values."""
    if isinstance(value, str):
        import ast

        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
    if old is None or value is None:
        return value
    if isinstance(old, bool):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(old, float) and isinstance(value, (int, str)):
        return float(value)
    if isinstance(old, int) and not isinstance(old, bool) and isinstance(value, str):
        return int(value)
    if isinstance(old, tuple) and isinstance(value, (list, str)):
        if isinstance(value, str):
            # tolerate yacs-style "(4,)" strings found in the reference YAMLs
            value = value.strip().strip("()").rstrip(",")
            value = [int(v) for v in value.split(",") if v.strip()]
        return tuple(value)
    return value


def from_dict(d: dict) -> CfgNode:
    node = CfgNode()
    for k, v in d.items():
        node[k] = from_dict(v) if isinstance(v, dict) else v
    return node
