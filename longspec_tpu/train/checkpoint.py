"""Crash-safe training checkpoints with rotating tags + draft-only export.

TPU-native equivalent of the reference's DeepSpeed checkpoint scheme
(`longspec/train/trainer_base_ds_mul_fs_tp.py:49-113`):

  * full train state saved under rotating tags ``last`` / ``last_2``
    (double-buffered against mid-save crashes, ref ``last_ds``/``last_2ds``
    rotation `trainer…:71-80`);
  * a small deploy artifact containing ONLY the draft weights
    (ref ``draft_model_weights.pth`` export, `trainer…:49-55, 102-103`);
  * ``latest`` marker file + `get_last_checkpoint` resume discovery
    (ref `training_utils.py:360-369`);
  * best-checkpoint note (ref `training_utils.py:345-353`).

Storage is flat .npz per pytree (self-contained, no orbax daemon); arrays
round-trip bf16 via a uint16 view.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TAGS = ("last", "last_2")


def _flatten(tree, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        it = tree.items()
    elif hasattr(tree, "_asdict"):
        it = tree._asdict().items()
    elif isinstance(tree, (list, tuple)):
        it = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix or "_": tree}
    for k, v in it:
        key = f"{prefix}.{k}" if prefix else str(k)
        out.update(_flatten(v, key))
    return out


def save_tree(path: str, tree) -> None:
    """Atomic save of an arbitrary pytree of arrays to .npz."""
    flat = {}
    for k, v in _flatten(tree).items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            flat["bf16:" + k] = a.view(np.uint16)
        else:
            flat[k] = a
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    os.replace(tmp if os.path.exists(tmp) else tmp + ".npz", path)


def load_tree_flat(path: str) -> Dict[str, np.ndarray]:
    import ml_dtypes
    out = {}
    with np.load(path) as z:
        for k, v in z.items():
            if k.startswith("bf16:"):
                out[k[5:]] = v.view(ml_dtypes.bfloat16)
            else:
                out[k] = v
    return out


def unflatten(flat: Dict[str, Any]) -> Dict:
    out: Dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def load_tree(path: str, as_jax: bool = True) -> Dict:
    tree = unflatten(load_tree_flat(path))
    if as_jax:
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
    return tree


# ---------------------------------------------------------------------------
# Rotating checkpoint manager
# ---------------------------------------------------------------------------

class CheckpointManager:
    """save() writes the new state under the stale tag, then flips
    ``latest``; the previous checkpoint stays intact until the next save —
    a crash mid-save never loses the last good state."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _marker(self) -> str:
        return os.path.join(self.out_dir, "latest")

    def latest_tag(self) -> Optional[str]:
        try:
            with open(self._marker()) as f:
                tag = f.read().strip()
            return tag if tag in TAGS else None
        except FileNotFoundError:
            return None

    def save(self, state, step: int, draft_params=None,
             extra: Optional[Dict] = None) -> str:
        cur = self.latest_tag()
        tag = TAGS[1] if cur == TAGS[0] else TAGS[0]
        d = os.path.join(self.out_dir, tag)
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
        save_tree(os.path.join(d, "train_state.npz"), state)
        meta = {"step": int(step)}
        meta.update(extra or {})
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(meta, f)
        if draft_params is not None:
            # deploy artifact: draft weights only (ref draft_model_weights.pth)
            save_tree(os.path.join(d, "draft_model_weights.npz"), draft_params)
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as f:
            f.write(tag)
        os.replace(tmp, self._marker())
        return d

    def restore(self) -> Optional[Tuple[Dict, Dict]]:
        """-> (flat train state pytree, meta) of the latest checkpoint, or
        None. Falls back to the other tag if the marked one is corrupt."""
        tags = [t for t in [self.latest_tag()] if t] + \
            [t for t in TAGS if t != self.latest_tag()]
        for tag in tags:
            d = os.path.join(self.out_dir, tag)
            try:
                state = load_tree(os.path.join(d, "train_state.npz"))
                with open(os.path.join(d, "meta.json")) as f:
                    meta = json.load(f)
                return state, meta
            except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
                continue
        return None

    # -- best checkpoint note (ref training_utils.py:345-353) --
    def note_best(self, metric: float, step: int) -> bool:
        path = os.path.join(self.out_dir, "best.json")
        best = None
        if os.path.exists(path):
            with open(path) as f:
                best = json.load(f)
        if best is None or metric < best["metric"]:
            with open(path, "w") as f:
                json.dump({"metric": float(metric), "step": int(step)}, f)
            return True
        return False


def export_draft(out_dir: str, draft_params, config_dict: Optional[Dict] = None):
    """Standalone draft export dir (ref checkpoint-last with
    draft_model_weights + resolved config, `trainer…:98-109`)."""
    os.makedirs(out_dir, exist_ok=True)
    save_tree(os.path.join(out_dir, "draft_model_weights.npz"), draft_params)
    if config_dict is not None:
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(config_dict, f, indent=2, default=str)


def load_draft(path: str) -> Dict:
    f = path if path.endswith(".npz") else os.path.join(path, "draft_model_weights.npz")
    return load_tree(f)
