"""Experiment configuration: YAML composition + interpolation + _target_.

TPU-native stand-in for the reference's Hydra stack
(`longspec/train/conf/exp/*.yaml`, `trainer_base_ds_mul_fs_tp.py:337`):

  * ``defaults:`` list composes base YAMLs relative to the config dir
    (ref `conf/exp/qwq_glide_8gpu_slim6b.yaml:1-8`), later keys win;
  * ``${key.path}`` interpolation against the merged config
    (ref `${eos_token}`, `${model_name_or_path}` usages);
  * ``_target_:`` nodes instantiate ``module.path.Class`` with the sibling
    keys as kwargs (ref Hydra instantiate of model/collator/optimizer);
  * dotlist overrides ``a.b=c`` from the command line, with the reference's
    ``--x`` -> ``x`` launcher compatibility (`trainer…:454-461`).
"""
from __future__ import annotations

import copy
import importlib
import os
import re
from typing import Any, Dict, List, Optional

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _get_path(cfg: Dict, dotted: str):
    cur: Any = cfg
    for p in dotted.split("."):
        cur = cur[p]
    return cur


def _interpolate(node: Any, root: Dict) -> Any:
    if isinstance(node, str):
        m = _INTERP.fullmatch(node)
        if m:  # whole-string interp keeps the referenced type
            return _interpolate(_get_path(root, m.group(1)), root)
        return _INTERP.sub(lambda m: str(_get_path(root, m.group(1))), node)
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    return node


def _parse_scalar(s: str) -> Any:
    v = yaml.safe_load(s)
    if isinstance(v, str):
        try:  # YAML 1.1 misses bare scientific notation like "1e-3"
            return float(v)
        except ValueError:
            pass
    return v


def load_config(path: str, overrides: Optional[List[str]] = None) -> Dict:
    """Load an experiment YAML, compose its ``defaults``, apply dotlist
    overrides, and resolve interpolations."""
    path = os.path.abspath(path)
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    base_dir = os.path.dirname(path)
    merged: Dict = {}
    for d in cfg.pop("defaults", []) or []:
        if isinstance(d, dict):  # {group: name} or {group@key: name}
            (slot, name), = d.items()
            if "@" in slot:
                group, key = slot.split("@", 1)
            else:
                group, key = slot, None
            sub = load_config(os.path.join(base_dir, "..", group,
                                           f"{name}.yaml"))
            merged = _deep_merge(merged, {key: sub} if key else sub)
        elif d not in ("_self_",):
            merged = _deep_merge(merged,
                                 load_config(os.path.join(base_dir, f"{d}.yaml")))
    merged = _deep_merge(merged, cfg)
    for ov in overrides or []:
        ov = ov.lstrip("-")  # torch-launcher `--x=y` compat (trainer…:454-461)
        key, _, val = ov.partition("=")
        node = merged
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_scalar(val)
    return _interpolate(merged, merged)


def instantiate(node: Any, **extra):
    """Recursively build objects from ``_target_`` nodes (Hydra-style)."""
    if isinstance(node, dict):
        if "_target_" in node:
            node = dict(node)
            target = node.pop("_target_")
            partial = node.pop("_partial_", False)
            kwargs = {k: instantiate(v) for k, v in node.items()}
            kwargs.update(extra)
            mod, _, attr = target.rpartition(".")
            obj = getattr(importlib.import_module(mod), attr)
            if partial:
                import functools
                return functools.partial(obj, **kwargs)
            return obj(**kwargs)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node
