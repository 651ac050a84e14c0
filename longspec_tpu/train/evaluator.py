"""Dev-set evaluation: loss-only eval loop with cross-process reduction.

TPU-native equivalent of the reference eval harness
(`longspec/train/general_util/evaluator.py:21-137` + the
`SFTLossOnlyPostProcessor` gather, `post_processors/dist_mixin.py:24-46`):
run the frozen forward over dev batches, average the loss with an
AverageMeter (which all-reduces across hosts), and optionally dump
per-batch rows for inspection.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, DraftConfig
from ..models import llama as M
from ..models import glide as G
from ..ops.fused_ce import fused_linear_ce
from ..utils.logging import AverageMeter, get_logger
from .trainer import glide_training_loss


def make_eval_step(cfg: ModelConfig, dcfg: DraftConfig,
                   attn_impl: str = "chunked"):
    """Jitted (draft_params, target_params, tokens, labels) -> draft loss,
    deterministic (no anchor offsets, no pad randomization)."""

    @jax.jit
    def step(draft_params, target_params, tokens, labels):
        b, s = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        loss, _ = glide_training_loss(draft_params, target_params, cfg, dcfg,
                                      tokens, labels, positions, pad_size=1,
                                      attn_impl=attn_impl)
        return loss

    return step


def evaluate(draft_params, target_params, cfg: ModelConfig, dcfg: DraftConfig,
             batches: Iterable[Dict], attn_impl: str = "chunked",
             output_dir: Optional[str] = None,
             prefix: str = "eval",
             post_processor=None) -> Dict[str, float]:
    """-> {"eval/loss": mean} over the dev iterator (ref `evaluator.py:21`).

    `post_processor` (a `train.postproc.PostProcessor`) is fed
    `(meta, {"loss": ...})` per batch and reduced at the end; its metrics are
    merged into the result under `{prefix}/{k}` (ref `evaluator.py:96-137`,
    the post-processor leg of the reference eval loop)."""
    log = get_logger("eval")
    step = make_eval_step(cfg, dcfg, attn_impl)
    meter = AverageMeter()
    rows = []
    for i, batch in enumerate(batches):
        tokens = jnp.asarray(batch["input_ids"])
        labels = jnp.asarray(batch["labels"])
        loss = float(step(draft_params, target_params, tokens, labels))
        meter.update(loss, n=tokens.shape[0])
        rows.append({"batch": i, "loss": loss})
        if post_processor is not None:
            meta = {k: v for k, v in batch.items()
                    if k not in ("input_ids", "labels")}
            meta.setdefault("index", [i])
            post_processor(meta, {"loss": loss})
    mean = meter.gather()
    log.info("%s: loss %.4f over %d examples", prefix, mean, meter.count)
    if output_dir and jax.process_index() == 0:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"{prefix}_predictions.jsonl"),
                  "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return {f"{prefix}/loss": mean}
