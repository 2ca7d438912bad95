"""Minimal yacs-compatible hierarchical config node.

The reference uses yacs (`/root/reference/disprcnn/config/defaults.py:20`); yacs is not
available in this environment, so this is a from-scratch implementation of the subset of
its API the framework needs: attribute access, ``merge_from_file`` (YAML),
``merge_from_list`` (dotted CLI overrides), ``freeze``/``defrost``, ``clone``, ``dump``.
"""
from __future__ import annotations

import copy
from typing import Any, List

import yaml

_VALID_SCALARS = (int, float, bool, str, type(None))


class CfgNode(dict):
    """A dict with attribute access, freezing, and YAML merge — yacs-compatible subset."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict: dict | None = None):
        init_dict = {} if init_dict is None else init_dict
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        for k, v in init_dict.items():
            if isinstance(v, dict):
                v = CfgNode(v)
            dict.__setitem__(self, k, v)

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name in self:
            return self[name]
        raise AttributeError(f"CfgNode has no attribute {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"Attempted to set {name} on immutable CfgNode")
        self[name] = value

    def __setitem__(self, name: str, value: Any) -> None:
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(f"Attempted to set {name} on immutable CfgNode")
        dict.__setitem__(self, name, value)

    # -- mutability --------------------------------------------------------
    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    def freeze(self) -> None:
        self._set_immutable(True)

    def defrost(self) -> None:
        self._set_immutable(False)

    def _set_immutable(self, flag: bool) -> None:
        object.__setattr__(self, CfgNode.IMMUTABLE, flag)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(flag)

    # -- merging -----------------------------------------------------------
    def clone(self) -> "CfgNode":
        frozen = self.is_frozen()
        self._set_immutable(False)
        out = copy.deepcopy(self)
        self._set_immutable(frozen)
        out._set_immutable(False)
        return out

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        self._merge(CfgNode(loaded), self, [])

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge(other, self, [])

    def merge_from_list(self, opts: List[Any]) -> None:
        assert len(opts) % 2 == 0, f"Override list must have even length: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                assert p in node, f"Unknown config key: {key}"
                node = node[p]
            leaf = parts[-1]
            assert leaf in node, f"Unknown config key: {key}"
            node[leaf] = _coerce(value, node[leaf], key)

    @staticmethod
    def _merge(src: "CfgNode", dst: "CfgNode", path: List[str]) -> None:
        for k, v in src.items():
            full = ".".join(path + [k])
            if k not in dst:
                # yacs raises on unknown keys; we do too, to catch typos early.
                raise KeyError(f"Unknown config key: {full}")
            if isinstance(v, CfgNode):
                if not isinstance(dst[k], CfgNode):
                    raise TypeError(f"Cannot merge dict into non-dict at {full}")
                CfgNode._merge(v, dst[k], path + [k])
            else:
                dst[k] = _coerce(v, dst[k], full)

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=True)

    def __str__(self) -> str:
        return self.dump()

    def __repr__(self) -> str:
        return f"CfgNode({dict.__repr__(self)})"

    def __deepcopy__(self, memo):
        out = CfgNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, copy.deepcopy(k, memo), copy.deepcopy(v, memo))
        return out

    def __reduce__(self):
        return (CfgNode, (self.to_dict(),))


def _coerce(value: Any, old: Any, key: str) -> Any:
    """Coerce an override to the type of the default (yacs behavior)."""
    if isinstance(value, str) and not isinstance(old, str):
        value = _parse_literal(value)
    if isinstance(value, list):
        value = tuple(value) if isinstance(old, tuple) else value
    if old is None or value is None:
        return value
    if isinstance(old, bool) and isinstance(value, int):
        return bool(value)
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if type(old) is not type(value) and not (
        isinstance(old, (list, tuple)) and isinstance(value, (list, tuple))
    ):
        raise TypeError(
            f"Type mismatch for key {key}: default {type(old).__name__}, "
            f"override {type(value).__name__}"
        )
    return value


def _parse_literal(s: str) -> Any:
    import ast

    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        pass
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s
