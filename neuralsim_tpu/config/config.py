"""ConfigDict + YAML loading + interpolation + CLI overrides.

Supported interpolation forms (matching the reference configs' usage):
  ${path.to.key}            — absolute reference into the root config
  ${eval:"python expr"}     — evaluated with the root config bound as `cfg`
                              plus math/numpy; also receives any ${...} refs
                              already substituted textually.
Dot-overrides: ``--training.num_iters=5000`` (values parsed as YAML).
"""
from __future__ import annotations

import argparse
import ast
import copy
import math
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml


class ConfigDict(dict):
    """dict with attribute access and deep-merge (reference ConfigDict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(x) for k, x in v.items()})
        if isinstance(v, list):
            return [ConfigDict._wrap(x) for x in v]
        return v

    @classmethod
    def from_dict(cls, d: Dict) -> "ConfigDict":
        return cls._wrap(d)

    def deep_update(self, other: Dict) -> "ConfigDict":
        for k, v in other.items():
            if k in self and isinstance(self[k], dict) and isinstance(v, dict):
                ConfigDict._wrap(self[k]).deep_update(v)
            else:
                self[k] = ConfigDict._wrap(v)
        return self

    def to_plain(self) -> Dict:
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v
        return conv(self)


_INTERP_RE = re.compile(r"\$\{([^{}]+)\}")


def _get_path(root: Dict, path: str):
    cur: Any = root
    for part in path.split("."):
        if isinstance(cur, list):
            cur = cur[int(part)]
        else:
            cur = cur[part]
    return cur


def _resolve_value(val: str, root: Dict, depth: int = 0):
    """Resolve interpolations in one string value."""
    if depth > 16:
        raise ValueError(f"interpolation loop: {val}")

    m = _INTERP_RE.fullmatch(val.strip())
    if m:
        expr = m.group(1)
        if expr.startswith("eval:"):
            return _run_eval(expr[5:], root)
        out = _get_path(root, expr)
        if isinstance(out, str) and _INTERP_RE.search(out):
            return _resolve_value(out, root, depth + 1)
        return out

    # partial/string interpolation
    def sub(mm):
        expr = mm.group(1)
        if expr.startswith("eval:"):
            v = _run_eval(expr[5:], root)
        else:
            v = _get_path(root, expr)
            if isinstance(v, str) and _INTERP_RE.search(v):
                v = _resolve_value(v, root, depth + 1)
        return str(v)

    return _INTERP_RE.sub(sub, val) if _INTERP_RE.search(val) else val


def _run_eval(src: str, root: Dict):
    src = src.strip()
    if (src.startswith('"') and src.endswith('"')) or \
       (src.startswith("'") and src.endswith("'")):
        src = src[1:-1]
    # textual ${...} refs inside the expression
    def sub(mm):
        return repr(_get_path(root, mm.group(1)))
    src = _INTERP_RE.sub(sub, src)
    import numpy as np
    env = {"cfg": root, "math": math, "np": np, "min": min, "max": max,
           "int": int, "float": float, "len": len, "abs": abs, "round": round,
           "__builtins__": {}}
    return eval(src, env)  # noqa: S307 — config-author-controlled expressions


def resolve_interpolations(cfg: Dict, root: Optional[Dict] = None):
    """Recursively resolve every string interpolation against ``root``."""
    root = root if root is not None else cfg

    def walk(node):
        if isinstance(node, dict):
            return ConfigDict({k: walk(v) for k, v in node.items()})
        if isinstance(node, list):
            return [walk(v) for v in node]
        # iterate: nested forms like ${eval:"${far} / 100"} resolve inner
        # refs textually first, then the outer eval on a later pass
        for _ in range(8):
            if not (isinstance(node, str) and _INTERP_RE.search(node)):
                break
            node = _resolve_value(node, root)
        return node

    return walk(cfg)


def load_config(path: str, overrides: Optional[Sequence[str]] = None,
                resolve: bool = True) -> ConfigDict:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = ConfigDict.from_dict(raw)
    # parent config chaining (reference `_parent_` style include)
    parent = cfg.pop("_parent_", None)
    if parent:
        import os
        pcfg = load_config(os.path.join(os.path.dirname(path), parent), resolve=False)
        pcfg.deep_update(cfg)
        cfg = pcfg
    if overrides:
        cfg.deep_update(parse_cli_overrides(overrides))
    if resolve:
        cfg = resolve_interpolations(cfg)
    return cfg


def save_config(cfg: Dict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(ConfigDict._wrap(cfg).to_plain(), f, sort_keys=False)


def parse_cli_overrides(pairs: Sequence[str]) -> ConfigDict:
    """['a.b.c=1', 'x=foo'] -> nested ConfigDict (values YAML-parsed)."""
    out = ConfigDict()
    for pair in pairs:
        pair = pair.lstrip("-")
        if "=" not in pair:
            continue
        k, v = pair.split("=", 1)
        try:
            val = yaml.safe_load(v)
        except yaml.YAMLError:
            val = v
        cur = out
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, ConfigDict())
        cur[parts[-1]] = val
    return out


class BaseConfig:
    """argparse + YAML merge, mirroring the reference's BaseConfig CLI:
    ``--config path.yaml --aaa.bbb=ccc --resume_dir ...``."""

    def __init__(self, description: str = ""):
        # allow_abbrev=False: otherwise argparse swallows e.g. --res=48 as an
        # abbreviation of --resume_dir (observed corrupting checkpoint paths)
        self.parser = argparse.ArgumentParser(description=description,
                                              allow_abbrev=False)
        self.parser.add_argument("--config", type=str, default=None)
        self.parser.add_argument("--resume_dir", type=str, default=None)
        self.parser.add_argument("--device_ids", type=str, default="0")

    def parse(self, argv: Optional[List[str]] = None) -> ConfigDict:
        args, unknown = self.parser.parse_known_args(argv)
        cfg_path = args.config
        if cfg_path is None and args.resume_dir:
            import os
            cfg_path = os.path.join(args.resume_dir, "config.yaml")
        cfg = load_config(cfg_path, overrides=unknown) if cfg_path else \
            parse_cli_overrides(unknown)
        for k, v in vars(args).items():
            if k != "config":
                cfg[k] = v
        return cfg
