"""Attention ops: dense oracle + chunked (flash-style) pure-JAX implementations.

These define the exact semantics of every attention variant the reference uses
(flash_attn_func causal / sliding-window, flash_attn_with_kvcache with
per-row `cache_seqlens`, the Triton tree-attention kernel returning LSE, and
the @torch.compile dense twins `tree_part_fwd`, reference
`longspec/test/llama.py:394-421`, `llama_glide.py:309-359`).

Layout convention: q/k/v are [B, T, H, D]; caches are [B, S, Hkv, D].
All softmax math is fp32 (the reference pins the same fp32 islands:
`llama.py:410-420`). Every function returns (out_fp32, lse_fp32) so partial
attentions can be merged exactly with `merge_attention`.

The Pallas TPU kernels in `longspec_tpu.ops.pallas_*` implement the same
contracts and are cross-checked against these in tests/.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # used instead of -inf to keep masked softmax NaN-free


def _repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[B, T, Hkv, D] -> [B, T, Hkv*groups, D] (GQA head duplication)."""
    if groups == 1:
        return x
    b, t, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, t, h, groups, d)).reshape(b, t, h * groups, d)


def attend_masked(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  mask: jnp.ndarray, scale: Optional[float] = None,
                  precision=None):
    """Dense masked attention with LSE output (oracle for all kernels).

    q: [B, Tq, H, D]; k, v: [B, Tk, Hkv, D]; mask: broadcastable to
    [B, H, Tq, Tk] (bool; True = attend).
    Returns (out [B, Tq, H, D] fp32, lse [B, Tq, H] fp32). Rows with no
    valid key get out = 0 and lse = -inf (so they merge away exactly).

    `precision`: matmul precision for the QK and PV products. The TPU
    default truncates fp32 operands to bf16 on the MXU — fine for prefill
    (common to both arms of a losslessness comparison), but the decode/
    verify island passes Precision.HIGHEST: the two arms compute the same
    token's attention under DIFFERENT prefix/suffix splits, and bf16-ulp
    rounding of q / p flips greedy tokens at ~0.06 logit margins (the
    round-3 chunked-arm `lossless: false` root cause).
    """
    b, tq, h, d = q.shape
    hkv = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    k = _repeat_kv(k, h // hkv)
    v = _repeat_kv(v, h // hkv)
    if precision == "bf16_pinned":
        # pinned-cast bf16 operand law (ops/pallas_decode._decode_kernel
        # docstring): operands explicitly rounded to bf16 (deterministic
        # RTNE, pinned against --xla_allow_excess_precision elision), one
        # MXU pass, fp32 accumulation — the same function in every
        # program that computes it, at bf16-operand speed. Scale applied
        # AFTER the dot in fp32 so q is rounded once, unscaled.
        qb = jax.lax.optimization_barrier(q.astype(jnp.bfloat16))
        kb = jax.lax.optimization_barrier(k.astype(jnp.bfloat16))
        s = jnp.einsum("bqhd,bkhd->bhqk", qb, kb,
                       preferred_element_type=jnp.float32) * scale
    else:
        qf = q.astype(jnp.float32) * scale
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32),
                       precision=precision)
    if mask.ndim == 3:
        mask = mask[:, None, :, :]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    valid = m > NEG_INF / 2
    m_safe = jnp.where(valid, m, 0.0)
    p = jnp.exp(s - m_safe)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if precision == "bf16_pinned":
        pb = jax.lax.optimization_barrier(p.astype(jnp.bfloat16))
        vb = jax.lax.optimization_barrier(v.astype(jnp.bfloat16))
        o = jnp.einsum("bhqk,bkhd->bqhd", pb, vb,
                       preferred_element_type=jnp.float32)
    else:
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32),
                       precision=precision)
    o = o / jnp.maximum(l, 1e-30).transpose(0, 2, 1, 3)
    o = jnp.where(valid.transpose(0, 2, 1, 3), o, 0.0)
    lse = jnp.where(valid[..., 0], m_safe[..., 0] + jnp.log(jnp.maximum(l[..., 0], 1e-30)),
                    -jnp.inf)
    return o, lse.transpose(0, 2, 1)  # [B, Tq, H]


def merge_attention(o_a, lse_a, o_b, lse_b):
    """Exact merge of two partial attentions over disjoint key sets.

    Implements the reference's log-sum-exp/sigmoid trick
    (`llama.py:385-387,420`): weight = sigmoid(lse_a - lse_b);
    out = w * o_a + (1 - w) * o_b. All fp32.
    o_*: [B, T, H, D]; lse_*: [B, T, H]. Handles lse = -inf on either side.
    """
    # sigmoid(-inf - x) = 0; sigmoid(x - (-inf)) = 1; both sides -inf -> 0.5*0
    la = jnp.maximum(lse_a, NEG_INF)
    lb = jnp.maximum(lse_b, NEG_INF)
    w = jax.nn.sigmoid(la - lb)[..., None]
    return o_a.astype(jnp.float32) * w + o_b.astype(jnp.float32) * (1.0 - w)


# ---------------------------------------------------------------------------
# Mask builders
# ---------------------------------------------------------------------------

def causal_mask(tq: int, tk: int, offset: int = 0) -> jnp.ndarray:
    """[tq, tk] bool, query i attends key j iff j <= i + offset."""
    qi = jnp.arange(tq)[:, None]
    kj = jnp.arange(tk)[None, :]
    return kj <= qi + offset


def prefill_mask(seq_len: int, lengths: jnp.ndarray, window: Optional[int] = None,
                 anchors: int = 0) -> jnp.ndarray:
    """[B, S, S] mask for (optionally sliding-window) causal prefill with
    per-row valid lengths. Matches flash_attn_func(window_size=(window,-1),
    causal=True) over the first `lengths[b]` tokens.
    """
    qi = jnp.arange(seq_len)[:, None]
    kj = jnp.arange(seq_len)[None, :]
    m = kj <= qi
    if window is not None:
        vis = kj >= qi - window
        if anchors > 0:
            vis = vis | (kj < anchors)
        m = m & vis
    m = m[None] & (kj[None] < lengths[:, None, None])
    # also mask out-of-length queries entirely? keep self visible to avoid
    # all-masked rows (their outputs are ignored downstream anyway).
    return m


def prefix_mask(tq: int, s_max: int, cache_lens: jnp.ndarray,
                q_pos: Optional[jnp.ndarray] = None, window: Optional[int] = None,
                anchors: int = 0) -> jnp.ndarray:
    """[B, tq, s_max] mask for attention of new queries over a KV cache.

    Key j of row b is visible iff j < cache_lens[b], and when `window` is
    given, additionally j >= q_pos[b, i] - window (or j < anchors).
    Matches flash_attn_with_kvcache(cache_seqlens=..., window_size=(w,-1)).
    """
    kj = jnp.arange(s_max)[None, None, :]
    m = jnp.broadcast_to(kj < cache_lens[:, None, None], (cache_lens.shape[0], tq, s_max))
    if window is not None:
        assert q_pos is not None
        vis = kj >= q_pos[:, :, None] - window
        if anchors > 0:
            vis = vis | (kj < anchors)
        m = m & vis
    return m


# ---------------------------------------------------------------------------
# Chunked (flash-style) prefix attention in pure JAX — runs on any backend.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("window", "anchors", "chunk"))
def attend_prefix_chunked(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                          cache_lens: jnp.ndarray, q_pos: Optional[jnp.ndarray] = None,
                          window: Optional[int] = None, anchors: int = 0,
                          chunk: int = 1024):
    """Online-softmax attention of q over cache[0:cache_lens], O(chunk) memory.

    q: [B, Tq, H, D]; caches: [B, S, Hkv, D]; cache_lens: [B] int32;
    q_pos: [B, Tq] absolute positions (needed iff window is not None).
    Returns (out fp32 [B, Tq, H, D], lse fp32 [B, Tq, H]).

    Equivalent to the flash-decode half of the reference's hybrid attention
    (`llama.py:385`, `llama_glide.py:300`): per-row lengths, optional left
    window, LSE returned for merging.
    """
    b, tq, h, d = q.shape
    s = k_cache.shape[1]
    hkv = k_cache.shape[2]
    groups = h // hkv
    scale = d ** -0.5
    qf = q.astype(jnp.float32) * scale

    n_chunks = max(1, -(-s // chunk))
    pad = n_chunks * chunk - s
    if pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kc = k_cache.reshape(b, n_chunks, chunk, hkv, d)
    vc = v_cache.reshape(b, n_chunks, chunk, hkv, d)

    def body(carry, inp):
        m_run, l_run, acc = carry
        kch, vch, c_idx = inp  # kch: [B, chunk, Hkv, D]
        kj = c_idx * chunk + jnp.arange(chunk)
        mask = kj[None, None, :] < cache_lens[:, None, None]  # [B,1,chunk]
        if window is not None:
            vis = kj[None, None, :] >= q_pos[:, :, None] - window
            if anchors > 0:
                vis = vis | (kj[None, None, :] < anchors)
            mask = mask & vis  # [B,Tq,chunk]
        mask = jnp.broadcast_to(mask, (b, tq, chunk))
        kr = _repeat_kv(kch, groups).astype(jnp.float32)
        vr = _repeat_kv(vch, groups).astype(jnp.float32)
        sco = jnp.einsum("bqhd,bkhd->bhqk", qf, kr)
        sco = jnp.where(mask[:, None], sco, NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(sco, axis=-1))
        p = jnp.exp(sco - m_new[..., None])
        p = jnp.where(mask[:, None], p, 0.0)
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vr)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, h, tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)
    a0 = jnp.zeros((b, h, tq, d), jnp.float32)
    (m_f, l_f, acc_f), _ = jax.lax.scan(
        body, (m0, l0, a0),
        (kc.transpose(1, 0, 2, 3, 4), vc.transpose(1, 0, 2, 3, 4),
         jnp.arange(n_chunks)))

    valid = l_f > 0
    o = acc_f / jnp.maximum(l_f, 1e-30)[..., None]
    o = jnp.where(valid[..., None], o, 0.0)
    lse = jnp.where(valid, jnp.where(m_f > NEG_INF / 2, m_f, 0.0)
                    + jnp.log(jnp.maximum(l_f, 1e-30)), -jnp.inf)
    return o.transpose(0, 2, 1, 3), lse.transpose(0, 2, 1)
