"""Draft distillation against a live target model.

Utility used by bench.py (and as a fast path to a working draft for any
target): generate greedy continuations from the target itself, then train
the GLIDE draft on them with the standard training loss — the draft learns
the target's decode-time distribution, which is exactly what tree-spec
acceptance measures. This is the same recipe as the reference's 3-stage
training (SURVEY.md §2.2 T2), collapsed to one self-distillation stage.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, DraftConfig, EngineConfig
from ..models import llama as M
from ..models import glide as G
from . import trainer as T


def generate_corpus(engine, rng: np.random.Generator, n_seqs: int,
                    prompt_len: int, gen_len: int, batch: int = 8):
    """Greedy continuations of random prompts; returns [n_seqs, prompt+gen]."""
    out = []
    for i in range(0, n_seqs, batch):
        b = min(batch, n_seqs - i)
        prompts = rng.integers(2, engine.cfg.vocab_size, (b, prompt_len))
        res = engine.vanilla_generate(prompts, np.full((b,), prompt_len, np.int32),
                                      max_gen_len=gen_len)
        seq = np.concatenate([prompts, res["output_ids"][:, :gen_len]], axis=1)
        out.append(seq)
    return np.concatenate(out, axis=0)


def distill_draft(target_params, cfg: ModelConfig, dcfg: DraftConfig,
                  corpus: np.ndarray, steps: int = 300, batch: int = 8,
                  lr: float = 1e-3, seed: int = 0, log_every: int = 50,
                  attn_impl: str = "chunked", anchor_offset: bool = True,
                  draft_params: Optional[dict] = None,
                  offset_cap: int = 30000, accum_steps: int = 1,
                  on_step=None, start_step: int = 0):
    """Train a draft layer on (tokens -> same tokens shifted) sequences.

    `offset_cap` must cover the intended decode context (see
    `trainer.anchor_offset_positions`): the draft's cross-attention reads
    roped teacher keys, so phases past the cap are as OOD for the draft as
    they are for the target.

    `accum_steps > 1` splits each batch into sequentially-scanned
    microbatches (memory of one microbatch, gradient of the full batch) —
    the right setting on a single chip where large-model teacher forwards
    cap the live batch at 1-2 but batch-1 gradient noise hurts draft
    quality. `on_step(step, draft_params)` is an optional checkpoint hook —
    the params it receives live in donated buffers that the NEXT step
    consumes, so the hook must materialize (e.g. copy to host) before
    returning, not retain device references;
    `start_step > 0` resumes a warm `draft_params` at that step count
    (fresh optimizer state — fine for benchmark distillation)."""
    if draft_params is None:
        draft_params = jax.jit(
            lambda k: G.init_draft_params(k, cfg, jnp.bfloat16)
        )(jax.random.PRNGKey(seed))
    opt = T.make_optimizer(lr=lr, warmup_steps=min(50, steps // 4),
                           total_steps=steps)
    state = T.init_train_state(draft_params, opt)
    if start_step:
        state = state._replace(step=jnp.asarray(start_step, jnp.int32))
    step_fn = T.make_train_step(cfg, dcfg, opt, anchor_offset=anchor_offset,
                                attn_impl=attn_impl, offset_cap=offset_cap,
                                accum_steps=accum_steps)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    n = corpus.shape[0]
    if start_step:  # fast-forward the data stream so a resumed run sees the
        rng.integers(0, n, (start_step * batch,))  # same batches it would have
    history = []
    for i in range(start_step, steps):
        idx = rng.integers(0, n, (batch,))
        toks = jnp.asarray(corpus[idx], jnp.int32)
        state, metrics = step_fn(state, target_params, toks, toks, key)
        if (i + 1) % log_every == 0 or i == start_step:
            loss = float(metrics["loss"])
            history.append((i + 1, loss))
            if on_step is not None:
                on_step(i + 1, state.draft_params)
    return state.draft_params, history
