"""End-to-end draft training loop: data -> step -> checkpoint/eval/metrics.

TPU-native equivalent of the reference's `train()` driver
(`longspec/train/trainer_base_ds_mul_fs_tp.py:128-318`): per-file
DataLoaders with DP sharding, grad-accum-free jitted steps (batch sizing is
explicit), periodic rotating checkpoints with draft-only export, resume
fast-forward by global step, optional dev evaluation, and jsonl metrics.

DP/ZeRO: pass a `mesh` and the step runs pjit-sharded — parameters are
replicated (the draft layer is tiny), batches sharded over `dp`, and the
frozen target sharded per `parallel.shardings` (tensor parallel over heads);
optimizer state follows the draft params. This covers the reference's
DeepSpeed ZeRO role for the (single-layer) trainable state.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, DraftConfig
from ..utils.logging import AverageMeter, MetricsWriter, get_logger, setup_logger
from . import trainer as T
from .checkpoint import CheckpointManager, export_draft


def train(cfg: ModelConfig, dcfg: DraftConfig, target_params, draft_params,
          batch_iter_fn: Callable[[int], Iterable[Dict]],
          *, output_dir: str, total_steps: int, lr: float = 5e-4,
          warmup_steps: int = 100, weight_decay: float = 0.01,
          save_steps: int = 500, log_steps: int = 20,
          eval_fn: Optional[Callable[[dict], Dict[str, float]]] = None,
          eval_steps: int = 0, attn_impl: str = "chunked",
          anchor_offset: bool = True, resume: bool = True,
          accum_steps: int = 1, lora_rank: int = 0, lora_scale: float = 1.0,
          offset_cap: int = 30000, teacher_unroll: bool = False,
          teacher_pp: int = 0, pp_micro: int = 2,
          mesh=None, seed: int = 0) -> dict:
    """Run draft training; returns the final draft params.

    `batch_iter_fn(epoch)` yields {"input_ids", "labels"} numpy batches —
    wrap `data.dataset.batches` or any custom source.

    `lora_rank > 0` freezes the given draft and trains LoRA factors instead
    (ref peft mixin `train/models/mixin.py:34-120`); checkpoints hold the
    adapter, exports hold the MERGED deployable weights.
    """
    setup_logger(output_dir, rank=jax.process_index())
    log = get_logger("train")
    opt = T.make_optimizer(lr=lr, warmup_steps=warmup_steps,
                           total_steps=total_steps,
                           weight_decay=weight_decay)
    pp_mesh = None
    if teacher_pp > 1:
        # frozen-teacher pipeline parallelism (config train.teacher_pp):
        # stages over `pp`, remaining devices as data-parallel pipelines
        from ..parallel.pipeline import make_pp_mesh
        n_dev = len(jax.devices())
        pp_mesh = make_pp_mesh(teacher_pp, dp=max(1, n_dev // teacher_pp))
    if lora_rank > 0:
        from .lora import init_lora, make_lora_train_step, merge_lora
        trainable = init_lora(jax.random.PRNGKey(seed + 17), draft_params,
                              rank=lora_rank)
        step_fn = make_lora_train_step(cfg, dcfg, opt, draft_params,
                                       scale=lora_scale,
                                       anchor_offset=anchor_offset,
                                       attn_impl=attn_impl,
                                       accum_steps=accum_steps,
                                       offset_cap=offset_cap,
                                       teacher_unroll=teacher_unroll,
                                       pp_mesh=pp_mesh, pp_micro=pp_micro)
        to_deploy = lambda tr: merge_lora(draft_params, tr, lora_scale)
    else:
        trainable = draft_params
        step_fn = T.make_train_step(cfg, dcfg, opt, attn_impl=attn_impl,
                                    anchor_offset=anchor_offset,
                                    accum_steps=accum_steps,
                                    offset_cap=offset_cap,
                                    teacher_unroll=teacher_unroll,
                                    pp_mesh=pp_mesh, pp_micro=pp_micro)
        to_deploy = lambda tr: tr
    # the jitted step donates its state: train on a copy so the caller's
    # draft_params stay alive (the draft is one layer — the copy is tiny)
    trainable = jax.tree_util.tree_map(jnp.copy, trainable)
    state = T.init_train_state(trainable, opt)
    cm = CheckpointManager(output_dir)
    start_step = 0
    if resume:
        got = cm.restore()
        if got is not None:
            flat, meta = got
            restored = _graft(trainable, flat["draft_params"])
            state = T.TrainState(restored, state.opt_state,
                                 jnp.asarray(meta["step"], jnp.int32))
            # optimizer state restores structurally when shapes match
            try:
                state = state._replace(opt_state=_graft(
                    T.init_train_state(restored, opt).opt_state,
                    flat["opt_state"]))
            except Exception:
                log.warning("optimizer state mismatch; reinitialized")
            start_step = int(meta["step"])
            log.info("resumed from step %d", start_step)

    writer = None
    if jax.process_index() == 0:
        writer = MetricsWriter(output_dir, "train")
    meter = AverageMeter()
    rng = jax.random.PRNGKey(seed)
    if mesh is not None:
        from ..parallel import shardings as sh
        target_params = sh.shard_tree(target_params, sh.param_pspecs(cfg), mesh)

    step = start_step
    t0 = time.time()
    epoch = 0
    seen = 0  # global batch counter from the start of the data stream
    ctx = mesh if mesh is not None else _NullCtx()
    with ctx:
        while step < total_steps:
            for batch in batch_iter_fn(epoch):
                if step >= total_steps:
                    break
                # resume fast-forward: epochs replay deterministically
                # (per-epoch reseed), so skipping the first `start_step`
                # batches resumes at the exact data position
                # (ref `trainer…:244-251`)
                if seen < start_step:
                    seen += 1
                    continue
                tokens = jnp.asarray(batch["input_ids"])
                labels = jnp.asarray(batch.get("labels", batch["input_ids"]))
                state, m = step_fn(state, target_params, tokens, labels,
                                   jax.random.fold_in(rng, step))
                step += 1
                seen += 1
                meter.update(float(m["loss"]), tokens.shape[0])
                if step % log_steps == 0:
                    sps = log_steps / max(time.time() - t0, 1e-9)
                    t0 = time.time()
                    if writer:
                        writer.log(step, {"train/loss": meter.avg,
                                          "train/gnorm": float(m["gnorm"]),
                                          "train/steps_per_s": sps})
                    log.info("step %d loss %.4f (%.2f it/s)", step,
                             meter.avg, sps)
                    meter.reset()
                if save_steps and step % save_steps == 0 and \
                        jax.process_index() == 0:
                    cm.save(state._asdict(), step,
                            draft_params=to_deploy(state.draft_params))
                if eval_fn and eval_steps and step % eval_steps == 0:
                    # to_deploy: in LoRA mode state.draft_params is the
                    # adapter tree — eval sees merged GLIDE params
                    res = eval_fn(to_deploy(state.draft_params))
                    if writer:
                        writer.log(step, res)
                    key = next(iter(res.values()))
                    cm.note_best(float(key), step)
            epoch += 1

    if jax.process_index() == 0:
        cm.save(state._asdict(), step,
                draft_params=to_deploy(state.draft_params))
        export_draft(os.path.join(output_dir, "checkpoint-last"),
                     to_deploy(state.draft_params),
                     config_dict={"model": cfg.__dict__, "draft": dcfg.__dict__,
                                  "steps": step, "lora_rank": lora_rank})
        if writer:
            writer.close()
    return to_deploy(state.draft_params)


def _graft(ref, loaded):
    """Copy `loaded` values onto the structure of `ref`, keeping `ref` values
    where `loaded` has no entry (e.g. a LoRA tree's non-adapted {} leaves).
    Handles the flat-npz checkpoint view of dicts / (Named)tuples / arrays."""
    if isinstance(ref, dict):
        if not isinstance(loaded, dict):
            return ref
        return {k: _graft(v, loaded.get(k, {})) for k, v in ref.items()}
    if hasattr(ref, "_asdict"):  # NamedTuple (optax states)
        if not isinstance(loaded, dict):
            return ref
        return type(ref)(**{k: _graft(v, loaded.get(k, {}))
                            for k, v in ref._asdict().items()})
    if isinstance(ref, (list, tuple)):
        if not isinstance(loaded, dict):
            return ref
        return type(ref)(_graft(v, loaded.get(str(i), {}))
                         for i, v in enumerate(ref))
    if isinstance(loaded, dict):  # missing in checkpoint
        return ref
    if not hasattr(ref, "dtype"):  # python scalar leaf (e.g. optax counts)
        return type(ref)(loaded) if not isinstance(loaded, dict) else ref
    return jnp.asarray(loaded).astype(ref.dtype).reshape(ref.shape)


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
