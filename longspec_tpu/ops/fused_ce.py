"""Memory-efficient cross-entropy over a large vocabulary.

TPU-native replacement for the reference's Liger fused-linear-CE Triton
kernel (`longspec/test/llama_glide.py:492-502`, `llama.py:688-691`): the
[B, S, V] logits tensor is never materialized — the sequence is processed in
chunks under `lax.scan`, each chunk projecting hidden -> logits (bf16 matmul,
fp32 accumulation on the MXU), computing log-softmax CE in fp32, and
discarding the chunk. XLA fuses projection + reduction per chunk.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk", "ignore_index"))
def fused_linear_ce(hidden, lm_head_w, labels, valid_mask=None,
                    chunk: int = 512, ignore_index: int = -100):
    """Mean CE of lm_head(hidden) vs labels.

    hidden: [B, S, D] (any float dtype); lm_head_w: [D, V]; labels: [B, S]
    int32; valid_mask: [B, S] bool (additionally, labels == ignore_index are
    dropped). Shift is the caller's job. Returns scalar fp32 mean loss.
    """
    b, s, d = hidden.shape
    flat_h = hidden.reshape(b * s, d)
    flat_l = labels.reshape(b * s)
    valid = flat_l != ignore_index
    if valid_mask is not None:
        valid = valid & valid_mask.reshape(b * s)
    n = b * s
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        flat_h = jnp.pad(flat_h, ((0, pad), (0, 0)))
        flat_l = jnp.pad(flat_l, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    hs = flat_h.reshape(n_chunks, chunk, d)
    ls = flat_l.reshape(n_chunks, chunk)
    vs = valid.reshape(n_chunks, chunk)

    def body(carry, inp):
        tot, cnt = carry
        h_c, l_c, v_c = inp
        logits = jnp.dot(h_c.astype(lm_head_w.dtype), lm_head_w,
                         preferred_element_type=jnp.float32)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, jnp.clip(l_c, 0)[:, None], axis=1)[:, 0]
        nll = jnp.where(v_c, lse - tgt, 0.0)
        return (tot + jnp.sum(nll), cnt + jnp.sum(v_c)), None

    # checkpoint per chunk: under grad, the scan's linearization would
    # otherwise stack every chunk's fp32 logits ([n_chunks, chunk, V] ~ 2GB
    # at seq 16k, V=32k) as saved residuals; recompute them in the backward.
    body = jax.checkpoint(body, prevent_cse=False)
    (tot, cnt), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32),
                                        jnp.zeros((), jnp.int32)), (hs, ls, vs))
    return tot / jnp.maximum(cnt, 1).astype(jnp.float32)
