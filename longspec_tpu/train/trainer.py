"""GLIDE draft-layer training: loss, train step, and a simple training loop.

TPU-native equivalent of the reference trainer stack
(`longspec/train/trainer_base_ds_mul_fs_tp.py` + model forward
`train/models/llama_glide.py:512-552`): the frozen target runs under
stop-gradient with rematerialization, only the single draft layer gets
gradients, data parallelism is a mesh axis (ZeRO-style optimizer-state
sharding comes from sharding the optax state the same way as params), and
the loss is the chunked fused CE (no [B,S,V] logits).

Key training semantics carried over:
  * anchor-offset position randomization for short sequences: sink in [0, 4],
    positions[sink:] += random offset in [0, min(30000, max_len-1000)-len]
    (ref `llama_glide.py:518-528`);
  * cross-attention teacher-KV truncated by a random pad in [1, 4]
    (ref `llama_glide.py:123-140`);
  * labels with pad masked to ignore_index (ref `:530`);
  * the target's own loss computed for logging only (ref `:531-540`).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, DraftConfig
from ..models import llama as M
from ..models import glide as G
from ..ops.fused_ce import fused_linear_ce


def anchor_offset_positions(rng, batch: int, seq_len: int, max_len: int,
                            apply: bool = True, offset_cap: int = 30000):
    """Randomized position ids (ref `llama_glide.py:518-528`).

    Returns [B, S] int32. When `apply` is False (long sequences), plain
    arange. A single (sink, offset) pair is drawn per batch like the
    reference (which randomizes per step, not per row).

    `offset_cap` bounds the highest position ever seen in training
    (~offset_cap itself). The reference hardcodes 30000 (serves its <=32k
    evals); a model meant to decode at context C must be trained with
    offset_cap comfortably above C or its logits go near-random past the
    trained-phase range (measured round 2: seq-16384 target, cap 30000 ->
    teacher-forced accuracy 0.83 at position 16k, 0.25 at 30k).
    """
    pos = jnp.broadcast_to(jnp.arange(seq_len)[None], (batch, seq_len))
    if not apply:
        return pos
    k1, k2 = jax.random.split(rng)
    sink = jax.random.randint(k1, (), 0, 5)
    hi = jnp.maximum(jnp.minimum(offset_cap, max_len - 1000) - seq_len, 0)
    offset = jax.random.randint(k2, (), 0, hi + 1)
    return pos + jnp.where(jnp.arange(seq_len)[None] >= sink, offset, 0)


def glide_training_loss(draft_params, target_params, cfg: ModelConfig,
                        dcfg: DraftConfig, tokens, labels, positions,
                        pad_size, compute_llm_loss: bool = False,
                        attn_impl: str = "chunked",
                        teacher_unroll: bool = False, pp_mesh=None,
                        pp_micro: int = 2):
    """Draft CE loss (and optional frozen-target loss for logging).

    ``teacher_unroll`` unrolls the frozen teacher's layer scan (see
    `models.llama.forward_train`): at seq >= 16k the scanned form's stacked
    carry double-buffers ~GB blocks and fragments HBM — required for the
    stage-2 long-data recipe (`configs/exp/draft_long.yaml`) on one chip.

    ``pp_mesh``: run the frozen teacher pipeline-parallel over the mesh's
    `pp` axis (`parallel.pipeline`, config key train.teacher_pp) — each
    stage holds L/pp teacher layers, so a teacher too big for one chip's
    HBM trains the draft across chips without ZeRO-3-style gathers."""
    target_params = jax.lax.stop_gradient(target_params)
    if pp_mesh is not None:
        from ..parallel.pipeline import pipeline_forward_train
        hidden_t, (llm_k, llm_v) = pipeline_forward_train(
            pp_mesh, target_params, cfg, tokens, positions=positions,
            n_micro=pp_micro, attn_impl=attn_impl, return_last_kv=True)
    else:
        hidden_t, (llm_k, llm_v) = M.forward_train(
            target_params, cfg, tokens, positions=positions,
            return_last_kv=True, attn_impl=attn_impl,
            unroll_layers=teacher_unroll)
    llm_k = jax.lax.stop_gradient(llm_k)
    llm_v = jax.lax.stop_gradient(llm_v)

    emb = M.embed(target_params, tokens)
    hidden_d = G.glide_train_forward(draft_params, cfg, dcfg, emb, positions,
                                     llm_k, llm_v, pad_size,
                                     attn_impl=attn_impl)
    w = M.lm_head_weight(target_params)
    # shift: predict token t+1 from position t (ref compute_fused_loss,
    # llama_glide.py:493-502)
    loss = fused_linear_ce(hidden_d[:, :-1], w, labels[:, 1:])
    if compute_llm_loss:
        llm_loss = fused_linear_ce(jax.lax.stop_gradient(hidden_t[:, :-1]), w,
                                   labels[:, 1:])
        return loss, llm_loss
    return loss, jnp.zeros((), jnp.float32)


class TrainState(NamedTuple):
    draft_params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 5e-4, warmup_steps: int = 100,
                   total_steps: int = 10000, weight_decay: float = 0.01,
                   grad_clip: float = 1.0, schedule: str = "cosine"):
    """AdamW + warmup/cosine (ref optimizer factory
    `train/general_util/training_utils.py:197-267` and DeepSpeed
    WarmupDecayLR configs)."""
    if schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps,
                                                   max(total_steps, warmup_steps + 1))
    elif schedule == "linear":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps),
             optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
            [warmup_steps])
    else:
        sched = lr
    return optax.chain(optax.clip_by_global_norm(grad_clip),
                       optax.adamw(sched, weight_decay=weight_decay,
                                   b1=0.9, b2=0.95))


def make_train_step(cfg: ModelConfig, dcfg: DraftConfig, optimizer,
                    max_len_for_offset: Optional[int] = None,
                    anchor_offset: bool = True, compute_llm_loss: bool = False,
                    attn_impl: str = "chunked", accum_steps: int = 1,
                    offset_cap: int = 30000, teacher_unroll: bool = False,
                    pp_mesh=None, pp_micro: int = 2):
    """Returns jitted step(state, target_params, tokens, labels, rng) ->
    (state, metrics).

    `accum_steps > 1` enables gradient accumulation (ref DeepSpeed
    grad-accum drive, `trainer_base_ds_mul_fs_tp.py:215-318`): the [B, S]
    batch is split into `accum_steps` microbatches scanned sequentially —
    only one microbatch's activations are live at a time — and the MEAN
    gradient is applied once. Anchor-offset/pad randomness is drawn once per
    optimizer step (shared by the microbatches), so batch=B and
    batch=B/a x accum=a follow identical trajectories.
    """
    max_len = max_len_for_offset or cfg.max_position_embeddings

    def step(state: TrainState, target_params, tokens, labels, rng):
        b, s = tokens.shape
        k_pos, k_pad = jax.random.split(jax.random.fold_in(rng, state.step))
        pad_size = jax.random.randint(k_pad, (), 1, 5)

        def loss_and_grad(dp, toks, labs):
            mb = toks.shape[0]
            positions = anchor_offset_positions(k_pos, mb, s, max_len,
                                                apply=anchor_offset,
                                                offset_cap=offset_cap)

            def loss_fn(p):
                return glide_training_loss(p, target_params, cfg, dcfg, toks,
                                           labs, positions, pad_size,
                                           compute_llm_loss, attn_impl,
                                           teacher_unroll=teacher_unroll,
                                           pp_mesh=pp_mesh, pp_micro=pp_micro)

            return jax.value_and_grad(loss_fn, has_aux=True)(dp)

        if accum_steps == 1:
            (loss, llm_loss), grads = loss_and_grad(state.draft_params,
                                                    tokens, labels)
        else:
            assert b % accum_steps == 0, (b, accum_steps)
            mb = b // accum_steps
            toks_m = tokens.reshape(accum_steps, mb, s)
            labs_m = labels.reshape(accum_steps, mb, s)

            def micro(carry, xs):
                g_acc, l_acc, ll_acc = carry
                (l, ll), g = loss_and_grad(state.draft_params, xs[0], xs[1])
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l, ll_acc + ll), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.draft_params)
            (grads, loss, llm_loss), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros(()), jnp.zeros(())), (toks_m, labs_m))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss, llm_loss = loss * inv, llm_loss * inv

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.draft_params)
        draft_params = optax.apply_updates(state.draft_params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(draft_params, opt_state, state.step + 1)
        return new_state, {"loss": loss, "llm_loss": llm_loss, "gnorm": gnorm}

    return jax.jit(step, donate_argnums=(0,))


def init_train_state(draft_params, optimizer) -> TrainState:
    return TrainState(draft_params, optimizer.init(draft_params),
                      jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Full-model (target) language-model training — used to pretrain benchmark
# targets on synthetic data, and available as a general LM trainer.
# ---------------------------------------------------------------------------

def make_lm_train_step(cfg: ModelConfig, optimizer, attn_impl: str = "chunked",
                       anchor_offset: bool = True,
                       unroll_layers: bool = False, offset_cap: int = 30000):
    """Jitted step(state, tokens, rng) -> (state, metrics) training ALL target
    params with the chunked fused CE. Use a factored optimizer (adafactor)
    for large models — AdamW moments for multi-B params exceed one chip.

    `anchor_offset` applies the same position randomization the draft uses
    (sink + random offset, ref `llama_glide.py:518-528`): a model trained
    only on positions [0, S) emits degenerate tokens at decode positions far
    beyond S; offset randomization makes short-sequence training usable at
    long-context inference — the LongSpec trick, applied to target pretraining.
    """

    def step(state: TrainState, tokens, rng):
        b, s = tokens.shape
        positions = anchor_offset_positions(
            jax.random.fold_in(rng, state.step), b, s,
            cfg.max_position_embeddings, apply=anchor_offset,
            offset_cap=offset_cap)

        def loss_fn(p):
            hidden = M.forward_train(p, cfg, tokens, positions=positions,
                                     attn_impl=attn_impl,
                                     unroll_layers=unroll_layers)
            w = M.lm_head_weight(p)
            return fused_linear_ce(hidden[:, :-1], w, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(state.draft_params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.draft_params)
        params = optax.apply_updates(state.draft_params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def make_adafactor(lr: float = 1e-3, warmup_steps: int = 100):
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, 100000)
    return optax.adafactor(learning_rate=sched)
