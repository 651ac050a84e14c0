"""LoRA adapters for draft fine-tuning.

TPU-native counterpart of the reference's PEFT mixin
(`longspec/train/models/mixin.py:34-120`, which wraps the draft in HF peft
LoraConfig): here an adapter is an explicit pytree of (A, B) factors over
every 2-D kernel of the GLIDE draft layer, merged functionally into the
params before the forward — no module surgery, no framework hooks. Training
takes gradients through `apply_lora` w.r.t. the factors only, so optimizer
state is O(rank) and the base draft stays frozen (the bitsandbytes/kbit
parts of the reference mixin are CUDA-only and have no TPU role).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, DraftConfig
from . import trainer as T


def _is_kernel(path_leaf) -> bool:
    return getattr(path_leaf, "ndim", 0) == 2


def init_lora(rng, draft_params: Dict, rank: int = 8) -> Dict:
    """(A, B) factors for every 2-D kernel; B zero-init so the adapted model
    starts exactly at the base (standard LoRA init)."""
    leaves, treedef = jax.tree_util.tree_flatten(draft_params)
    keys = jax.random.split(rng, len(leaves))
    out = []
    for k, w in zip(keys, leaves):
        if _is_kernel(w):
            fan_in = w.shape[0]
            a = jax.random.normal(k, (fan_in, rank), jnp.float32) / jnp.sqrt(fan_in)
            b = jnp.zeros((rank, w.shape[1]), jnp.float32)
            out.append({"A": a, "B": b})
        else:
            out.append({})  # non-adapted leaf (bias/norm): empty subtree
    return jax.tree_util.tree_unflatten(treedef, out)


def apply_lora(draft_params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """Merged params: w + scale * A @ B (biases/norms pass through)."""
    def merge(w, ab):
        if not ab:  # {} = non-adapted leaf
            return w
        return (w.astype(jnp.float32) + scale * ab["A"] @ ab["B"]).astype(w.dtype)

    # draft_params' leaves align with SUBTREES of lora ({A,B} or {})
    return jax.tree_util.tree_map(merge, draft_params, lora)


def merge_lora(draft_params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """Export-time merge (ref peft `merge_and_unload`): returns plain draft
    params usable by the engine/`export_draft` with no adapter machinery."""
    return apply_lora(draft_params, lora, scale)


def make_lora_train_step(cfg: ModelConfig, dcfg: DraftConfig, optimizer,
                         base_draft_params, scale: float = 1.0,
                         anchor_offset: bool = True,
                         attn_impl: str = "chunked", accum_steps: int = 1,
                         offset_cap: int = 30000,
                         teacher_unroll: bool = False,
                         pp_mesh=None, pp_micro: int = 2):
    """Jitted step(state, target_params, tokens, labels, rng) where
    state.draft_params is the LoRA pytree; the base draft is closed over and
    frozen. `accum_steps > 1` accumulates the mean gradient over sequential
    microbatches exactly like `trainer.make_train_step` (same randomness
    sharing, so batch=B and batch=B/a x accum=a trajectories match)."""
    max_len = cfg.max_position_embeddings

    def step(state: T.TrainState, target_params, tokens, labels, rng):
        b, s = tokens.shape
        k_pos, k_pad = jax.random.split(jax.random.fold_in(rng, state.step))
        pad_size = jax.random.randint(k_pad, (), 1, 5)

        def loss_and_grad(lora_tree, toks, labs):
            mb = toks.shape[0]
            positions = T.anchor_offset_positions(k_pos, mb, s, max_len,
                                                  apply=anchor_offset,
                                                  offset_cap=offset_cap)

            def loss_fn(lora):
                merged = apply_lora(base_draft_params, lora, scale)
                return T.glide_training_loss(merged, target_params, cfg, dcfg,
                                             toks, labs, positions, pad_size,
                                             False, attn_impl,
                                             teacher_unroll=teacher_unroll,
                                             pp_mesh=pp_mesh,
                                             pp_micro=pp_micro)

            return jax.value_and_grad(loss_fn, has_aux=True)(lora_tree)

        if accum_steps == 1:
            (loss, _), grads = loss_and_grad(state.draft_params,
                                             tokens, labels)
        else:
            assert b % accum_steps == 0, (b, accum_steps)
            mb = b // accum_steps
            toks_m = tokens.reshape(accum_steps, mb, s)
            labs_m = labels.reshape(accum_steps, mb, s)

            def micro(carry, xs):
                g_acc, l_acc = carry
                (l, _), g = loss_and_grad(state.draft_params, xs[0], xs[1])
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.draft_params)
            (grads, loss), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros(())), (toks_m, labs_m))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.draft_params)
        lora = optax.apply_updates(state.draft_params, updates)
        gnorm = optax.global_norm(grads)
        return (T.TrainState(lora, opt_state, state.step + 1),
                {"loss": loss, "llm_loss": jnp.zeros(()), "gnorm": gnorm})

    return jax.jit(step, donate_argnums=(0,))
