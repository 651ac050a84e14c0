"""TPU-native Llama/Qwen2-family target model.

Functional re-design of the reference target models
(`longspec/test/llama.py`, `longspec/test/qwen2.py`): instead of modules that
mutate `self.K_Cache` (`llama.py:86-96, 219-222`), the model is a pure
function over a parameter pytree and an explicit KV-cache array, scanned over
stacked layers so XLA compiles one layer body.

Modes (replacing the reference's exec_type dispatch, `llama.py:98-130`):
  * ``prefill``  — causal self-attention over a fresh prompt, writes
                   cache[0:S] (ref ``prefill``, `llama.py:199-226`).
  * ``append``   — T new tokens attend cache[0:k_hi] (flash-decode part) plus
                   a caller-supplied T×T suffix mask (causal for chain decode,
                   tree mask for tree verification), merged exactly via LSE —
                   the hybrid attention of ref ``decoding``/``tree_decoding``
                   (`llama.py:304-421`) unified into one path.
  * ``train``    — causal, no cache, optionally returns last-layer roped K/V
                   for GLIDE training (ref ``glide_training``,
                   `llama.py:266-302`).

Params layout: weights are [in, out] so application is ``x @ w``; per-layer
tensors are stacked on a leading L axis for ``lax.scan``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import attention as att
from ..ops import quantkv as qkv8
from ..ops.rope import rope_cos_sin, apply_rope


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    """Random-normal init (std=0.02) with the exact pytree layout used
    throughout; shapes match HF checkpoints after transposition."""
    hd = cfg.head_dim_
    keys = jax.random.split(rng, 12)
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv = cfg.num_heads, cfg.num_kv_heads

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    layers = {
        "input_norm": jnp.ones((L, D), dtype),
        "wq": w(keys[0], L, D, H * hd),
        "wk": w(keys[1], L, D, Hkv * hd),
        "wv": w(keys[2], L, D, Hkv * hd),
        "wo": w(keys[3], L, H * hd, D),
        "post_norm": jnp.ones((L, D), dtype),
        "w_gate": w(keys[4], L, D, I),
        "w_up": w(keys[5], L, D, I),
        "w_down": w(keys[6], L, I, D),
    }
    if cfg.attention_bias:
        layers["bq"] = jnp.zeros((L, H * hd), dtype)
        layers["bk"] = jnp.zeros((L, Hkv * hd), dtype)
        layers["bv"] = jnp.zeros((L, Hkv * hd), dtype)
    params = {
        "embed": w(keys[7], cfg.vocab_size, D),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(keys[8], D, cfg.vocab_size)
    return params


def lm_head_weight(params):
    return params["lm_head"] if "lm_head" in params else params["embed"].T


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed.astype(x.dtype) * w.astype(x.dtype))


def _w(w, like=None):
    """Point-of-use dequant for int8 frozen weights (ops/quantparams.py):
    a QuantParam kernel becomes a transient bf16 (or `like`-dtype) tensor
    right before its matmul — inside the layer scan only one layer's
    kernels are ever live in full precision."""
    from ..ops.quantparams import QuantParam, dequant_param
    if isinstance(w, QuantParam):
        return dequant_param(w, like.dtype if like is not None else jnp.bfloat16)
    return w


def _mm(x, w):
    """``x @ w`` for the residual stream, fp32-island aware.

    When the activations run in fp32 over bf16 (or int8-quantized) weights —
    the decode/verify law under ``EngineConfig.decode_dtype="fp32"`` — the
    matmul INPUTS are cast to bf16 (full-rate MXU, same HBM bytes) while the
    product accumulates and returns in fp32, so the residual stream never
    re-rounds to bf16 between ops. That is what keeps the single-token
    vanilla step and the multi-token verify step numerically close enough
    (~1e-6 relative instead of bf16's ~4e-3) that greedy argmax ties cannot
    flip between the two reduction orders (the fp32-island discipline the
    reference pins for its verification math, `test/llama.py:410-420`,
    extended to the whole decode residual stream)."""
    from ..ops.quantparams import QuantParam, dequant_param
    if isinstance(w, QuantParam):
        w = dequant_param(w, jnp.bfloat16 if x.dtype == jnp.float32
                          else x.dtype)
    if x.dtype == jnp.float32 and w.dtype == jnp.bfloat16:
        # The bf16 rounding of the activations is LOAD-BEARING, not an
        # optimization hint: this environment compiles with
        # --xla_allow_excess_precision=true, under which XLA may elide an
        # f32->bf16->matmul cast SHAPE-DEPENDENTLY — measured on v5e: the
        # T=1 vanilla step kept fp32 activations while the T=85 verify
        # rounded (or vice versa), making the same token's cache K/V rows
        # differ in ~40% of elements by 1-2 bf16 ulps and eventually
        # flipping a greedy tie (round-3 hard_8k/pallas bitdiff_arms.py
        # forensics). The barrier pins the cast so every T computes the
        # identical function.
        xb = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
        return jax.lax.dot_general(
            xb, w,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.dot(x, w)


def mlp(x, lp):
    g = _mm(x, lp["w_gate"])
    u = _mm(x, lp["w_up"])
    return _mm(jax.nn.silu(g) * u, lp["w_down"])


def qkv(x, lp, cfg: ModelConfig):
    b, t, _ = x.shape
    hd = cfg.head_dim_
    q = _mm(x, lp["wq"])
    k = _mm(x, lp["wk"])
    v = _mm(x, lp["wv"])
    if cfg.attention_bias:
        q = q + lp["bq"]
        k = k + lp["bk"]
        v = v + lp["bv"]
    return (q.reshape(b, t, cfg.num_heads, hd),
            k.reshape(b, t, cfg.num_kv_heads, hd),
            v.reshape(b, t, cfg.num_kv_heads, hd))


def _index_layer(cache, i):
    """cache[i] along the leading [L] axis with a traced index; QuantKV
    slices both fields."""
    if isinstance(cache, qkv8.QuantKV):
        return qkv8.QuantKV(
            jax.lax.dynamic_index_in_dim(cache.qv, i, 0, False),
            jax.lax.dynamic_index_in_dim(cache.scale, i, 0, False))
    return jax.lax.dynamic_index_in_dim(cache, i, 0, False)


def _update_layer(cache, sl, i):
    """Write layer slice `sl` back at index i (in-place-aliasable DUS)."""
    if isinstance(cache, qkv8.QuantKV):
        return qkv8.QuantKV(
            jax.lax.dynamic_update_index_in_dim(cache.qv, sl.qv, i, 0),
            jax.lax.dynamic_update_index_in_dim(cache.scale, sl.scale, i, 0))
    return jax.lax.dynamic_update_index_in_dim(cache, sl, i, 0)


def write_cache_rows(cache, new: jnp.ndarray, starts: jnp.ndarray):
    """Write new[b] (T rows) into cache[b] at sequence offset starts[b].

    cache: [B, Hkv, S, D] (TPU-native layout: contiguous (chunk, D) tiles per
    head for the Pallas decode kernel) or a `QuantKV` (rows are quantized on
    write); new: [B, T, Hkv, D]; starts: [B].
    Implemented as a vmapped dynamic_update_slice (XLA lowers this to an
    in-place DUS when the buffer is donated/aliased).
    """
    # Per-batch DUS chain, NOT a batch-vmapped DUS: vmapping a
    # dynamic_update_slice over a BATCHED start index lowers to scatter,
    # and a scatter consumer makes XLA pick a scatter-friendly cache
    # layout INSIDE the decode while-loop while the attention kernel wants
    # the default layout — the full cache then relayout-copies every
    # step (measured: the 32k vanilla step carried ~0.5us per s_max ROW,
    # ~16 of its 25 ms at s_max 33k; profile_vanilla_r3e.log). B is a
    # static Python int, so the chain is B in-place DUS ops.
    #
    # Past serving-scale batch the chain would unroll into a B-op graph
    # whose XLA compile time explodes (distribution tests run B=16k
    # engines; a 16384-DUS while body compiles for tens of minutes) — use
    # ONE true batched scatter there instead.
    n_b = (cache.qv if isinstance(cache, qkv8.QuantKV) else cache).shape[0]
    if n_b > 16:
        t = new.shape[1]
        b_idx = jnp.repeat(jnp.arange(n_b), t)                    # [B*T]
        s_idx = (starts[:, None] + jnp.arange(t)[None]).reshape(n_b * t)
        if isinstance(cache, qkv8.QuantKV):
            q8, sc = qkv8.quantize(new.transpose(0, 2, 1, 3))     # [B,H,T,D]
            qv = cache.qv.at[b_idx, :, s_idx, :].set(
                q8.transpose(0, 2, 1, 3).reshape(n_b * t, q8.shape[1],
                                                 q8.shape[3]))
            scale = cache.scale.at[b_idx, :, s_idx].set(
                sc.transpose(0, 2, 1).reshape(n_b * t, sc.shape[1]))
            return qkv8.QuantKV(qv, scale)
        vals = new.astype(cache.dtype).reshape(n_b * t, new.shape[2],
                                               new.shape[3])      # [B*T,H,D]
        return cache.at[b_idx, :, s_idx, :].set(vals)
    if isinstance(cache, qkv8.QuantKV):
        # quantize AFTER transposing to cache layout: the scale update is
        # then produced [B, Hkv, T] with T minor, matching cache.scale's
        # S-minor layout. Quantizing first and transposing the scale
        # ([B,T,Hkv] -> [B,Hkv,T]) invites XLA to instead relayout the
        # WHOLE cache.scale operand Hkv-minor — Hkv=8 in the 128-lane dim
        # pads 16x, turning 134MB of scales into 2GB at 262k context
        # (measured; the quantize itself is per-row and order-independent).
        q8, sc = qkv8.quantize(new.transpose(0, 2, 1, 3))  # [B,H,T,D], [B,H,T]
        qv, scale = cache.qv, cache.scale
        for i in range(qv.shape[0]):
            qv = jax.lax.dynamic_update_slice(
                qv, q8[i:i + 1], (i, 0, starts[i], 0))
            scale = jax.lax.dynamic_update_slice(
                scale, sc[i:i + 1], (i, 0, starts[i]))
        return qkv8.QuantKV(qv, scale)

    nt = new.transpose(0, 2, 1, 3).astype(cache.dtype)      # [B, H, T, D]
    for i in range(cache.shape[0]):
        cache = jax.lax.dynamic_update_slice(
            cache, nt[i:i + 1], (i, 0, starts[i], 0))
    return cache


def write_cache_rows_layer(cache, new: jnp.ndarray, starts: jnp.ndarray, li):
    """Write new [B, T, Hkv, D] rows into ONE layer (traced index `li`) of
    the STACKED cache [L, B, Hkv, S, D] at per-batch offsets starts [B] —
    a plain DUS chain, so the carried stack updates in place with no
    per-layer slice-out/update-back pair (which XLA can materialize as an
    O(S) layer copy around an opaque kernel read)."""
    li = jnp.asarray(li, jnp.int32)
    if isinstance(cache, qkv8.QuantKV):
        q8, sc = qkv8.quantize(new.transpose(0, 2, 1, 3))  # [B,H,T,D],[B,H,T]
        qv, scale = cache.qv, cache.scale
        for i in range(qv.shape[1]):
            qv = jax.lax.dynamic_update_slice(
                qv, q8[None, i:i + 1], (li, i, 0, starts[i], 0))
            scale = jax.lax.dynamic_update_slice(
                scale, sc[None, i:i + 1], (li, i, 0, starts[i]))
        return qkv8.QuantKV(qv, scale)
    nt = new.transpose(0, 2, 1, 3).astype(cache.dtype)      # [B, H, T, D]
    for i in range(cache.shape[1]):
        cache = jax.lax.dynamic_update_slice(
            cache, nt[None, i:i + 1], (li, i, 0, starts[i], 0))
    return cache


def write_cache_rows_stacked(cache, new: jnp.ndarray, starts: jnp.ndarray):
    """All-layer commit write: new [L, B, T, Hkv, D] raw rows into the
    STACKED cache [L, B, Hkv, S, D] at per-batch offsets starts [B].

    NOT `vmap(write_cache_rows)` over L: the vmap batching rule turns the
    per-batch dynamic_update_slice into a SCATTER (operand batched, index
    unbatched), and a scatter consumer inside the decode while-loop makes
    XLA (a) relayout-copy the whole cache to a scatter-friendly layout and
    back, and (b) give up on in-place aliasing — measured as six
    bf16[16,1,8,34816,128] copies / 2.95GB peak temps per 32k step
    (scripts/hlo_engine_seg.py). A per-batch chain of plain DUS ops on the
    stacked array keeps the cache in the kernels' layout and in place.

    Large batches (distribution tests run B=16k engines) would unroll into
    a B-op graph whose XLA compile time explodes — past serving-scale
    batch ONE true batched scatter is the right trade (decode-loop layout
    perf is not the concern there)."""
    n_b = (cache.qv if isinstance(cache, qkv8.QuantKV) else cache).shape[1]
    t = new.shape[2]
    if n_b > 16:
        bt = n_b * t
        b_idx = jnp.repeat(jnp.arange(n_b), t)                    # [B*T]
        s_idx = (starts[:, None] + jnp.arange(t)[None]).reshape(bt)
        if isinstance(cache, qkv8.QuantKV):
            q8, sc = qkv8.quantize(new.transpose(0, 1, 3, 2, 4))  # [L,B,H,T,D]
            # advanced indices on non-adjacent axes (1, 3) move to front:
            # updates are [B*T, L, H, D] / [B*T, L, H]
            qv = cache.qv.at[:, b_idx, :, s_idx, :].set(
                q8.transpose(1, 3, 0, 2, 4).reshape(
                    bt, q8.shape[0], q8.shape[2], q8.shape[4]))
            scale = cache.scale.at[:, b_idx, :, s_idx].set(
                sc.transpose(1, 3, 0, 2).reshape(bt, sc.shape[0],
                                                 sc.shape[2]))
            return qkv8.QuantKV(qv, scale)
        vals = new.astype(cache.dtype).transpose(1, 2, 0, 3, 4)   # [B,T,L,H,D]
        vals = vals.reshape(bt, new.shape[0], new.shape[3], new.shape[4])
        return cache.at[:, b_idx, :, s_idx, :].set(vals)
    if isinstance(cache, qkv8.QuantKV):
        # same scale-layout rule as write_cache_rows: quantize AFTER
        # transposing so the scale update is S-minor like cache.scale
        q8, sc = qkv8.quantize(new.transpose(0, 1, 3, 2, 4))  # [L,B,H,T,D]
        qv, scale = cache.qv, cache.scale
        for i in range(qv.shape[1]):
            qv = jax.lax.dynamic_update_slice(
                qv, q8[:, i:i + 1], (0, i, 0, starts[i], 0))
            scale = jax.lax.dynamic_update_slice(
                scale, sc[:, i:i + 1], (0, i, 0, starts[i]))
        return qkv8.QuantKV(qv, scale)
    nt = new.transpose(0, 1, 3, 2, 4).astype(cache.dtype)    # [L,B,H,T,D]
    for i in range(cache.shape[1]):
        cache = jax.lax.dynamic_update_slice(
            cache, nt[:, i:i + 1], (0, i, 0, starts[i], 0))
    return cache


def causal_self_attention(q, k, v, lengths, window, anchors, attn_impl: str,
                          q_chunk: int = 512):
    """Causal (optionally sliding-window) self-attention over a full sequence.

    Memory-safe prefill: scans over query blocks, each attending keys
    [0, q_pos+1) via the chunked online-softmax kernel — O(chunk^2) live
    memory instead of the dense [S, S] score matrix. Semantics equal
    flash_attn_func(causal=True, window_size=(window, -1)) over the first
    `lengths[b]` tokens (reference `llama.py:218`, `llama_glide.py:199`).

    q: [B, S, H, D]; k, v: cache layout [B, Hkv, S', D] (S' >= S).
    """
    b, s, h, d = q.shape
    if attn_impl == "paged":
        # prefill computes over the FRESH contiguous K/V it just projected;
        # paging only changes where the cache rows are STORED (the server
        # scatters them into the pool at admission)
        attn_impl = "chunked"
    if isinstance(k, qkv8.QuantKV) and attn_impl == "pallas":
        # quantized reads: dequantize ONCE into a transient f32 view (the
        # exact values every decode-time read of the int8 cache sees) and
        # run the Pallas kernel — its band/window block skipping is what
        # makes a 131k draft-CA prefill tractable; the old chunked fallback
        # computed the full O(S^2) masked score matrix (~hours at 128k)
        k, v = qkv8.dequant(k), qkv8.dequant(v)
    if attn_impl == "dense":
        mask = att.prefill_mask(s, lengths, window=window, anchors=anchors)
        if isinstance(k, qkv8.QuantKV):
            k, v = qkv8.dequant(k), qkv8.dequant(v)
        return att.attend_masked(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), mask)
    if attn_impl == "pallas":
        from ..ops.pallas_prefill import flash_prefill
        return flash_prefill(q, k, v, lengths, window=window, anchors=anchors)
    if attn_impl == "sp":
        # sequence-parallel ring prefill: Q and KV sharded over the sequence
        # axis of attn_impl.mesh; KV blocks rotate via ppermute. A QuantKV
        # here is the draft CA reading the int8 target cache at prefill —
        # dequantize (sharded slices stay sharded; one-time prefill cost)
        from ..parallel.ring import ring_flash_prefill
        if isinstance(k, qkv8.QuantKV):
            k, v = qkv8.dequant(k), qkv8.dequant(v)
        assert k.shape[2] == s, (k.shape, s)
        return ring_flash_prefill(attn_impl.mesh, q, k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3), lengths,
                                  window=window, anchors=anchors,
                                  axis_name=attn_impl.axis)
    n_blocks = -(-s // q_chunk)
    pad = n_blocks * q_chunk - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qb = q.reshape(b, n_blocks, q_chunk, h, d).transpose(1, 0, 2, 3, 4)

    def body(_, inp):
        qi, blk = inp
        pos = blk * q_chunk + jnp.arange(q_chunk)[None, :]  # [1, q_chunk]
        pos = jnp.broadcast_to(pos, (b, q_chunk))
        k_hi = jnp.minimum(pos + 1, lengths[:, None])
        o, lse = _attend_prefix_chunked_khi(qi, k, v, k_hi, pos, window,
                                            anchors, chunk=1024)
        return None, (o, lse)

    # checkpoint per query block: backward recomputes each block's online
    # softmax instead of saving every per-KV-chunk probability matrix
    # (which is O(S^2) across blocks and OOMs full-param training at 4k+)
    body = jax.checkpoint(body, prevent_cse=False)
    _, (o, lse) = jax.lax.scan(body, None, (qb, jnp.arange(n_blocks)))
    o = o.transpose(1, 0, 2, 3, 4).reshape(b, n_blocks * q_chunk, h, d)
    lse = lse.transpose(1, 0, 2, 3).reshape(b, n_blocks * q_chunk, h)
    return o[:, :s], lse[:, :s]


def sliced_prefix_attention(q, k_cache, v_cache, k_hi, q_pos, window, anchors,
                            attn_impl: str, chunk: int = 1024, tables=None,
                            precision=jax.lax.Precision.HIGHEST,
                            layer_idx=None):
    """Attention of q over cache rows [0, k_hi) with optional sliding window.

    q: [B, Tq, H, D]; caches: [B, Hkv, S, D]. k_hi: [B] or [B, Tq] per-query
    exclusive upper bound (covers per-row cache lengths and the
    kvcache-causal semantics of flash_attn_with_kvcache used by the draft's
    cross-attention re-encode, ref `llama_glide.py:261-265`).
    Returns (o fp32, lse fp32).

    attn_impl "paged" (`ops.pallas_paged.PagedAttn`): the caches are page
    POOLS [n_pages, Hkv, page, D] addressed through `tables` [B, n_chunks].
    """
    b, tq = q.shape[:2]
    if k_hi.ndim == 1:
        k_hi2 = jnp.broadcast_to(k_hi[:, None], (b, tq))
    else:
        k_hi2 = k_hi
    if layer_idx is not None:
        # stacked [L, B, Hkv, S, D] caches: the pallas kernel indexes the
        # layer inside its BlockSpec index map (zero-copy); every other
        # impl falls back to slicing the layer out here.
        if attn_impl == "pallas":
            from ..ops.pallas_decode import flash_decode
            return flash_decode(q, k_cache, v_cache, k_hi2, q_pos, window,
                                anchors, layer=layer_idx,
                                precision=(jax.lax.Precision.DEFAULT
                                           if precision is None
                                           else precision))
        k_cache = _index_layer(k_cache, layer_idx)
        v_cache = _index_layer(v_cache, layer_idx)
    if attn_impl == "dense":
        s_max = k_cache.shape[2]
        kj = jnp.arange(s_max)[None, None, :]
        mask = kj < k_hi2[:, :, None]
        if window is not None:
            vis = kj >= q_pos[:, :, None] - window
            if anchors > 0:
                vis = vis | (kj < anchors)
            mask = mask & vis
        if isinstance(k_cache, qkv8.QuantKV):
            k_cache, v_cache = qkv8.dequant(k_cache), qkv8.dequant(v_cache)
        return att.attend_masked(q, k_cache.transpose(0, 2, 1, 3),
                                 v_cache.transpose(0, 2, 1, 3), mask,
                                 precision=precision)
    elif attn_impl == "chunked":
        return _attend_prefix_chunked_khi(q, k_cache, v_cache, k_hi2, q_pos,
                                          window, anchors, chunk,
                                          precision=precision)
    elif attn_impl == "pallas":
        from ..ops.pallas_decode import flash_decode
        return flash_decode(q, k_cache, v_cache, k_hi2, q_pos, window, anchors,
                            precision=(jax.lax.Precision.DEFAULT
                                       if precision is None else precision))
    elif attn_impl == "paged":
        from ..ops.pallas_paged import paged_flash_decode
        assert tables is not None, "paged attention needs page tables"
        return paged_flash_decode(q, k_cache, v_cache, tables, k_hi2, q_pos,
                                  window, anchors,
                                  precision=(jax.lax.Precision.DEFAULT
                                             if precision is None
                                             else precision))
    elif attn_impl == "sp":
        # exact decode/verify attention over a sequence-sharded cache
        from ..parallel.ring import sp_flash_decode
        return sp_flash_decode(attn_impl.mesh, q, k_cache, v_cache, k_hi2,
                               q_pos, window, anchors, axis_name=attn_impl.axis,
                               precision=(jax.lax.Precision.DEFAULT
                                          if precision is None
                                          else precision))
    raise ValueError(f"unknown attn_impl {attn_impl}")


def _attend_prefix_chunked_khi(q, k_cache, v_cache, k_hi2, q_pos, window,
                               anchors, chunk, precision=None):
    """Chunked online-softmax prefix attention with per-query upper bounds.

    q: [B, Tq, H, D]; caches: [B, Hkv, S, D] (native layout).

    `precision`: QK/PV matmul precision — HIGHEST on the decode/verify
    path (see `att.attend_masked`: the lossless gate needs the two arms'
    different prefix extents to agree below token margins, and the TPU
    default truncates the fp32 q and p operands to bf16), default (fast)
    for prefill, which is computed once and shared by both arms.
    """
    b, tq, h, d = q.shape
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    groups = h // hkv
    quant = isinstance(k_cache, qkv8.QuantKV)
    # [B, Hkv, G, Tq, D]
    qf = (q.astype(jnp.float32) * (d ** -0.5)).transpose(0, 2, 1, 3)
    qf = qf.reshape(b, hkv, groups, tq, d)
    scale_f = jnp.float32(d ** -0.5)
    qb16 = (jax.lax.optimization_barrier(
        q.astype(jnp.bfloat16)).transpose(0, 2, 1, 3)
        .reshape(b, hkv, groups, tq, d)
        if precision == "bf16_pinned" else None)
    n_chunks = max(1, -(-s // chunk))
    pad = n_chunks * chunk - s

    def chunked(cache):
        # [B, Hkv, S(+pad), ...] -> [n_chunks, B, Hkv, chunk, ...]
        arr = cache
        if pad:
            widths = ((0, 0), (0, 0), (0, pad)) + ((0, 0),) * (arr.ndim - 3)
            arr = jnp.pad(arr, widths)
        arr = arr.reshape((b, hkv, n_chunks, chunk) + arr.shape[3:])
        return jnp.moveaxis(arr, 2, 0)

    if quant:
        kc = (chunked(k_cache.qv), chunked(k_cache.scale))
        vc = (chunked(v_cache.qv), chunked(v_cache.scale))
    else:
        kc, vc = chunked(k_cache), chunked(v_cache)

    def body(carry, inp):
        m_run, l_run, acc = carry
        kch, vch, c_idx = inp                      # [B, Hkv, chunk, D]
        if quant:
            kch = qkv8.dequant(qkv8.QuantKV(*kch))
            vch = qkv8.dequant(qkv8.QuantKV(*vch))
        kj = c_idx * chunk + jnp.arange(chunk)
        mask = kj[None, None, :] < k_hi2[:, :, None]  # [B, Tq, chunk]
        if window is not None:
            vis = kj[None, None, :] >= q_pos[:, :, None] - window
            if anchors > 0:
                vis = vis | (kj[None, None, :] < anchors)
            mask = mask & vis
        mask = mask[:, None, None]                 # [B, 1, 1, Tq, chunk]
        if precision == "bf16_pinned":
            # pinned-cast bf16 operand law (see att.attend_masked): one
            # MXU pass, deterministic, scale applied after in fp32
            kb = jax.lax.optimization_barrier(kch.astype(jnp.bfloat16))
            sco = jnp.einsum("bhgqd,bhkd->bhgqk", qb16, kb,
                             preferred_element_type=jnp.float32) * scale_f
        else:
            sco = jnp.einsum("bhgqd,bhkd->bhgqk", qf, kch.astype(jnp.float32),
                             precision=precision)
        sco = jnp.where(mask, sco, att.NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(sco, axis=-1))
        p = jnp.where(mask, jnp.exp(sco - m_new[..., None]), 0.0)
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(p, axis=-1)
        if precision == "bf16_pinned":
            pb = jax.lax.optimization_barrier(p.astype(jnp.bfloat16))
            vb = jax.lax.optimization_barrier(vch.astype(jnp.bfloat16))
            pv = jnp.einsum("bhgqk,bhkd->bhgqd", pb, vb,
                            preferred_element_type=jnp.float32)
        else:
            pv = jnp.einsum("bhgqk,bhkd->bhgqd", p, vch.astype(jnp.float32),
                            precision=precision)
        acc_new = acc * alpha[..., None] + pv
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, hkv, groups, tq), att.NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, groups, tq), jnp.float32)
    a0 = jnp.zeros((b, hkv, groups, tq, d), jnp.float32)
    # checkpoint per KV chunk: under grad, the scan's linearization would
    # otherwise stack every chunk's probability matrix p ([B,Hkv,G,Tq,chunk]
    # fp32 x n_chunks ~ 1GB/query-block at seq 16k) as saved residuals;
    # recomputing p in the backward keeps only the O(chunk) carries live.
    body = jax.checkpoint(body, prevent_cse=False)
    (m_f, l_f, acc_f), _ = jax.lax.scan(body, (m0, l0, a0),
                                        (kc, vc, jnp.arange(n_chunks)))
    valid = l_f > 0
    o = jnp.where(valid[..., None], acc_f / jnp.maximum(l_f, 1e-30)[..., None], 0.0)
    lse = jnp.where(valid, jnp.where(m_f > att.NEG_INF / 2, m_f, 0.0)
                    + jnp.log(jnp.maximum(l_f, 1e-30)), -jnp.inf)
    o = o.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    lse = lse.reshape(b, h, tq).transpose(0, 2, 1)
    return o, lse


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def embed(params, tokens):
    return jnp.take(params["embed"], tokens, axis=0)


def _final(params, cfg, h):
    return rms_norm(h, params["final_norm"], cfg.rms_norm_eps)


def paged_causal_attention(q, k_pool, v_pool, tables, positions,
                           lengths=None, chunk: int = 256):
    """Memory-safe causal attention of a FULL sequence of queries over
    pooled KV: query i attends logical rows [0, min(i+1, lengths)). Scans
    fixed-size query chunks through `paged_flash_decode` (whose per-query
    k_hi bound provides the causal mask), so nothing O(S^2) — and the VMEM
    footprint stays at decode scale regardless of S. The prefix-cache
    prefill path: suffix queries attend shared prefix pages + their own
    freshly written rows. Returns (o fp32, lse fp32)."""
    from ..ops.pallas_paged import paged_flash_decode
    b, s, h, d = q.shape
    k_hi = positions + 1
    if lengths is not None:
        k_hi = jnp.minimum(k_hi, lengths[:, None])
    n_blocks = -(-s // chunk)
    pad = n_blocks * chunk - s
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k_hi = jnp.pad(k_hi, ((0, 0), (0, pad)), constant_values=1)
        positions = jnp.pad(positions, ((0, 0), (0, pad)))
    qb = q.reshape(b, n_blocks, chunk, h, d).transpose(1, 0, 2, 3, 4)
    khb = k_hi.reshape(b, n_blocks, chunk).transpose(1, 0, 2)
    pb = positions.reshape(b, n_blocks, chunk).transpose(1, 0, 2)

    def body(_, inp):
        qi, ki, pi = inp
        return None, paged_flash_decode(qi, k_pool, v_pool, tables, ki, pi)

    _, (o, lse) = jax.lax.scan(body, None, (qb, khb, pb))
    o = o.transpose(1, 0, 2, 3, 4).reshape(b, n_blocks * chunk, h, d)
    lse = lse.transpose(1, 0, 2, 3).reshape(b, n_blocks * chunk, h)
    return o[:, :s], lse[:, :s]


def paged_prefill_extend(params, cfg: ModelConfig, tokens: jnp.ndarray,
                         s0: jnp.ndarray, tables: jnp.ndarray,
                         kv_k: jnp.ndarray, kv_v: jnp.ndarray):
    """Prefill CONTINUATION over pooled KV: encode `tokens` [B, Tsfx] at
    positions s0.., writing their KV into the pool and attending the cached
    prefix pages causally — the compute-reuse half of prefix caching (the
    prefix's L-layer prefill is skipped entirely; only the suffix is run).
    Returns (hidden [B, Tsfx, Dm], kv_k, kv_v)."""
    if cfg.sliding_window is not None:
        # paged_causal_attention has no window plumbing: silently running
        # the suffix with full attention would diverge from the windowed
        # decode path (SpecServer gates prefix admissions on this)
        raise NotImplementedError("prefix-cache suffix prefill does not "
                                  "support sliding_window targets")
    from ..ops.pallas_paged import write_paged_rows
    b, t = tokens.shape
    hd = cfg.head_dim_
    positions = s0[:, None] + jnp.arange(t)[None, :]
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta,
                            scaling=cfg.rope_scaling)
    h = embed(params, tokens)

    def layer(h, lp_kv):
        lp, (ck, cv) = lp_kv
        x = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = qkv(x, lp, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = write_paged_rows(ck, k, tables, s0)
        cv = write_paged_rows(cv, v, tables, s0)
        o, _ = paged_causal_attention(q, ck, cv, tables, positions)
        o = _mm(o.astype(h.dtype).reshape(b, t, -1), lp["wo"])
        h = h + o
        x = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        h = h + mlp(x, lp)
        return h, (ck, cv)

    h, (kv_k, kv_v) = jax.lax.scan(layer, h, (params["layers"], (kv_k, kv_v)))
    return _final(params, cfg, h), kv_k, kv_v


def forward_prefill(params, cfg: ModelConfig, tokens: jnp.ndarray,
                    lengths: jnp.ndarray, kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                    attn_impl: str = "dense", positions: Optional[jnp.ndarray] = None):
    """Prompt prefill. tokens: [B, S] right-padded; lengths: [B].

    kv caches: [L, B, S_max, Hkv, D]. Writes rows [0:S). Returns
    (hidden [B, S, Dm], kv_k, kv_v).
    """
    b, s = tokens.shape
    hd = cfg.head_dim_
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, scaling=cfg.rope_scaling)
    h = embed(params, tokens)

    def layer(h, lp_kv):
        lp, (ck, cv) = lp_kv
        x = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = qkv(x, lp, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kt = k.transpose(0, 2, 1, 3)   # [B, Hkv, S, D] cache layout
        vt = v.transpose(0, 2, 1, 3)
        o, _ = causal_self_attention(q, kt, vt, lengths, cfg.sliding_window,
                                     cfg.attn_sinks, attn_impl)
        o = _mm(o.astype(h.dtype).reshape(b, s, -1), lp["wo"])
        h = h + o
        x = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        h = h + mlp(x, lp)

        def set_rows(c, new):
            if isinstance(c, qkv8.QuantKV):
                q8, sc = qkv8.quantize(new)
                return qkv8.QuantKV(c.qv.at[:, :, :s].set(q8),
                                    c.scale.at[:, :, :s].set(sc))
            return c.at[:, :, :s].set(new.astype(c.dtype))

        ck = set_rows(ck, kt)
        cv = set_rows(cv, vt)
        return h, (ck, cv)

    h, (kv_k, kv_v) = jax.lax.scan(layer, h, (params["layers"], (kv_k, kv_v)))
    return _final(params, cfg, h), kv_k, kv_v


def forward_append(params, cfg: ModelConfig, tokens: jnp.ndarray,
                   positions: jnp.ndarray, suffix_mask: jnp.ndarray,
                   cache_lens: jnp.ndarray, kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                   attn_impl: str = "dense", write_at: Optional[jnp.ndarray] = None,
                   collect_kv: bool = False, tables=None, compute_dtype=None,
                   ring_anchors: Optional[int] = None,
                   decode_precision: str = "highest"):
    """Hybrid-attention step over T new tokens.

    tokens: [B, T]; positions: [B, T] absolute; suffix_mask: [B, T, T]
    (True = attend; causal for chain decode, tree mask for tree verify —
    must include the diagonal), or None to SKIP suffix attention entirely:
    the segmented-prefill form, where new KV rows are written BEFORE the
    prefix attention and `cache_lens` is a per-query [B, T] bound
    (pos+1 clamped to the row length), so causality comes from the prefix
    bound alone and nothing O(T^2) is materialized. cache_lens: [B] (or
    [B, T] per-query) — prefix rows [0, cache_lens) are attended. New KV
    rows are written at [write_at, write_at+T) (default write_at =
    cache_lens, which must then be [B]).

    The per-layer attention is prefix flash-decode (with LSE) + dense masked
    suffix attention (with LSE), merged exactly — the reference's hybrid tree
    attention (`llama.py:357-421`) generalized to every decode shape.

    With ``collect_kv=True`` the caches are NOT written; instead the new
    per-layer roped (K, V) are returned stacked as [L, B, T, Hkv, D] so the
    engine can commit only the *accepted* rows for all layers in one shot —
    replacing the reference's "move only the last layer and re-forward
    accepted tokens" host-side workaround (`llama_glide.py:1166-1173`).

    ``compute_dtype=jnp.float32`` runs the residual stream in fp32 (matmul
    inputs still bf16 — see ``_mm``): the decode/verify fp32-island law that
    keeps the T=1 vanilla step and the T=N verify step close enough that
    greedy argmax ties cannot flip between their different reduction orders.
    Cache rows are still stored in the cache dtype, and the suffix attention
    sees the STORED (rounded/quantized) values — what any later cached read
    of those rows sees — on every path.

    ``decode_precision`` picks the decode/verify attention matmul law
    (EngineConfig.decode_precision): "highest" = exact f32 operands
    (6 MXU passes — measured ~35% tree-throughput tax at 8k); "high" =
    3-pass f32; "bf16_pinned" = operands explicitly rounded to bf16
    (deterministic, pinned against --xla_allow_excess_precision elision),
    fp32 accumulation, one MXU pass. All three are arm-deterministic; they
    differ in which (slightly different) target function both arms compute
    and in speed. Prefill keeps the fast compiler default either way.

    ``ring_anchors``: the caches are O(window) RING buffers ([L,B,Hkv,R,D],
    `ops.ring_cache`, EngineConfig.kv_ring) with that many pinned sink rows;
    prefix attention recovers key positions from the written count and runs
    one chunked online-softmax law for every T (decode, verify, prefill
    segment). Requires a sliding window (the engine validates capacity).
    """
    b, t = tokens.shape
    hd = cfg.head_dim_
    if write_at is None:
        write_at = cache_lens
    if decode_precision == "highest":
        dprec = jax.lax.Precision.HIGHEST
    elif decode_precision == "high":
        dprec = jax.lax.Precision.HIGH
    elif decode_precision in ("bf16_pinned", "bf16"):
        dprec = "bf16_pinned"
    else:
        raise ValueError(f"unknown decode_precision {decode_precision!r}")
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, scaling=cfg.rope_scaling)
    h = embed(params, tokens)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    if ring_anchors is not None:
        from ..ops import ring_cache as rc
        # prefix mask of really-written rows (segmented prefill: padded
        # rows past a row's length must not wrap the ring)
        ring_valid = (cache_lens > positions) if cache_lens.ndim == 2 else None
        if cache_lens.ndim == 2:
            ring_written = jnp.max(cache_lens, axis=1)      # post-write count
        elif collect_kv:
            ring_written = cache_lens                        # nothing written
        else:
            ring_written = cache_lens + t

    def write_rows(c, new):
        if ring_anchors is not None:
            return rc.ring_write(c, new, write_at, ring_anchors,
                                 valid=ring_valid)
        if attn_impl == "sp":
            from ..parallel.ring import sp_write_cache_rows
            return sp_write_cache_rows(attn_impl.mesh, c, new, write_at,
                                       attn_impl.axis)
        if attn_impl == "paged":
            from ..ops.pallas_paged import write_paged_rows
            return write_paged_rows(c, new, tables, write_at)
        return write_cache_rows(c, new, write_at)

    # The caches ride the layer scan as CARRY (per-layer dynamic slice +
    # in-place dynamic-update), NOT as scan xs->ys: stacked ys would
    # allocate a second full [L,...] cache every call — at 131k context
    # that is +4.4GB (K+V int8) live per decode step / prefill segment,
    # measured as the AllocateBuffer pair that pushed the long_128k graph
    # to 17.4G. A carry updates in place. The per-layer math is unchanged
    # (the kernel always read a per-layer slice), so results are
    # bit-identical to the xs/ys form.
    # Decode/verify fast path (collect_kv=True, pallas): attention reads the
    # STACKED [L, ...] cache with the layer picked inside the kernel's
    # BlockSpec index map. Slicing the layer out here (dynamic-slice feeding
    # an opaque pallas_call) materializes the full [B, Hkv, S, D] slice —
    # ~134MB x 2(KV) x L per step, measured as the s_max-proportional ~2/3
    # of the 32k vanilla step (profile_vanilla_r3e.log).
    _s_rows = (kv_k.qv if isinstance(kv_k, qkv8.QuantKV) else kv_k).shape[3]
    # unaligned caches (tests, small rings) fall back to per-layer slicing —
    # stacked mode would otherwise need an O(S) pad copy per step
    stacked_read = (attn_impl == "pallas" and _s_rows % 2048 == 0)
    # stacked WRITES too (non-collect paths): a per-layer slice-out /
    # update-back pair around the row write invites XLA to materialize the
    # [B, Hkv, S, D] layer slice; a plain DUS at (li, b, ..) on the carried
    # stack stays in place
    stacked_write = stacked_read and ring_anchors is None \
        and attn_impl not in ("sp", "paged")

    def layer(carry, lp_li):
        h, kv_k_c, kv_v_c = carry
        lp, li = lp_li
        if stacked_read:
            ck, cv = kv_k_c, kv_v_c  # stacked; kernels index the layer
        else:
            ck = _index_layer(kv_k_c, li)
            cv = _index_layer(kv_v_c, li)
        x = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
        q, k, v = qkv(x, lp, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # Write BEFORE the attention read on every path: the attention
        # kernel then consumes the post-write buffer (no anti-dependency
        # from a pre-write view into the carry that a later DUS would
        # invalidate — that ordering measurably costs whole-cache defensive
        # copies at 262k). Decode prefix bounds (k_hi = cache_lens) never
        # cover the new rows, so results are unchanged.
        if not collect_kv:
            if stacked_write:
                kv_k_c = write_cache_rows_layer(kv_k_c, k, write_at, li)
                kv_v_c = write_cache_rows_layer(kv_v_c, v, write_at, li)
                ck, cv = kv_k_c, kv_v_c
            else:
                # ring/sp/paged writers operate on a per-layer slice
                ck_l = ck if not stacked_read else _index_layer(kv_k_c, li)
                cv_l = cv if not stacked_read else _index_layer(kv_v_c, li)
                ck_l = write_rows(ck_l, k)
                cv_l = write_rows(cv_l, v)
                kv_k_c = _update_layer(kv_k_c, ck_l, li)
                kv_v_c = _update_layer(kv_v_c, cv_l, li)
                ck = kv_k_c if stacked_read else ck_l
                cv = kv_v_c if stacked_read else cv_l
        li_read = li if stacked_read else None
        if ring_anchors is not None:
            # decode/verify (suffix_mask given): HIGHEST matmul precision —
            # the lossless-gate law (see _attend_prefix_chunked_khi). The
            # segmented-prefill form (suffix_mask None) keeps the fast
            # default: prefill is computed once, shared by both arms.
            o_p, lse_p = rc.ring_attention(
                q, ck, cv, cache_lens, positions, ring_written,
                cfg.sliding_window, ring_anchors, impl=attn_impl,
                precision=(dprec if suffix_mask is not None else None),
                layer=li_read)
        elif suffix_mask is None and attn_impl == "pallas":
            # segmented prefill, pallas: positions are AFFINE (q_off +
            # arange — _prefill_seg_body's contract) with per-query bound
            # k_hi = min(pos + 1, row_len). The dedicated prefill kernel
            # derives positions from its block index, so query blocks are
            # 512 positions instead of flash_decode's R_MAX=640 ROWS —
            # ~13x fewer streaming passes over the KV band and no host
            # lax.map splitting (the old path cut a T=8192 segment into
            # ~52 sequential pallas calls).
            from ..ops.pallas_prefill import flash_cache_prefill
            o_p = flash_cache_prefill(
                q, ck, cv, positions[0, 0], jnp.max(cache_lens, axis=1),
                cfg.sliding_window, cfg.attn_sinks, layer=li_read)
            lse_p = None
        else:
            # suffix_mask None = segmented prefill: fast default precision
            # (one computation shared by both lossless-gate arms). Decode/
            # verify: HIGHEST (see _attend_prefix_chunked_khi docstring).
            o_p, lse_p = sliced_prefix_attention(
                q, ck, cv, cache_lens, positions, cfg.sliding_window,
                cfg.attn_sinks, attn_impl, tables=tables,
                precision=(dprec if suffix_mask is not None else None),
                layer_idx=li_read)
        if suffix_mask is None:
            # segmented prefill: causality is fully encoded in the per-query
            # prefix bound (rows were written above); no suffix term
            o = _mm(o_p.astype(h.dtype).reshape(b, t, -1), lp["wo"])
            h = h + o
            x = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
            h = h + mlp(x, lp)
            return (h, kv_k_c, kv_v_c), (k, v)
        if isinstance(ck, qkv8.QuantKV):
            # suffix attention sees exactly what a later CACHED read of these
            # rows will see — required for spec-vs-vanilla token exactness
            # (quantkv.py rule 2). collect_kv still returns RAW k/v: the
            # engine's commit re-quantizes them to bit-identical ints.
            k_s, v_s = qkv8.quant_dequant(k), qkv8.quant_dequant(v)
        else:
            # same rule for plain caches: under fp32 compute the fresh k/v
            # are fp32 but the cache stores (and later reads) their
            # cache-dtype rounding — attend the stored values. The barrier
            # pins the round-trip: f32->bf16->f32 is exactly the pattern
            # --xla_allow_excess_precision=true deletes, and eliding it
            # here would make the verify suffix see values a later cached
            # read never will (see _mm).
            k_s = jax.lax.optimization_barrier(k.astype(ck.dtype))
            v_s = jax.lax.optimization_barrier(v.astype(ck.dtype))
        o_s, lse_s = att.attend_masked(q, k_s, v_s, suffix_mask,
                                       precision=dprec)
        o = att.merge_attention(o_p, lse_p, o_s, lse_s)
        o = _mm(o.astype(h.dtype).reshape(b, t, -1), lp["wo"])
        h = h + o
        x = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
        h = h + mlp(x, lp)
        return (h, kv_k_c, kv_v_c), (k, v)

    (h, kv_k, kv_v), (new_k, new_v) = jax.lax.scan(
        layer, (h, kv_k, kv_v),
        (params["layers"], jnp.arange(cfg.num_layers)))
    out = _final(params, cfg, h)
    if collect_kv:
        return out, kv_k, kv_v, new_k, new_v
    return out, kv_k, kv_v


def train_layer(h, lp, cfg: ModelConfig, cos, sin, lengths, attn_impl: str):
    """One decoder layer of the training-mode (no-cache) causal forward.
    Shared by `forward_train`'s layer scan and the pipeline-parallel stage
    scan (`parallel.pipeline`). Returns (h, (k, v)) with K/V post-RoPE in
    [B, T, Hkv, D] layout."""
    b, s = h.shape[:2]
    x = rms_norm(h, lp["input_norm"], cfg.rms_norm_eps)
    q, k, v = qkv(x, lp, cfg)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    o, _ = causal_self_attention(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), lengths,
                                 cfg.sliding_window, cfg.attn_sinks,
                                 attn_impl)
    o = _mm(o.astype(h.dtype).reshape(b, s, -1), lp["wo"])
    h = h + o
    x = rms_norm(h, lp["post_norm"], cfg.rms_norm_eps)
    h = h + mlp(x, lp)
    return h, (k, v)


def forward_train(params, cfg: ModelConfig, tokens: jnp.ndarray,
                  positions: Optional[jnp.ndarray] = None,
                  return_last_kv: bool = False, attn_impl: str = "dense",
                  lengths: Optional[jnp.ndarray] = None, remat: bool = True,
                  unroll_layers: bool = False):
    """Training-mode causal forward (no cache).

    With ``return_last_kv`` also returns the last layer's post-RoPE (K, V)
    for GLIDE draft training (ref ``glide_training``, `llama.py:295-302` —
    the cache stores roped keys, so the draft cross-attends roped keys).

    ``unroll_layers`` replaces the layer ``lax.scan`` with a Python loop.
    Under ``grad``, the scan's stacked-parameter gradient is a single
    contiguous [L, ...] while-loop carry that XLA double-buffers (two ~1GB
    blocks per large weight at 2.5B scale) and that fragments HBM badly; the
    unrolled form accumulates per-layer slices instead, which is what lets
    full-param seq-16384 training fit one 16GB chip.
    """
    b, s = tokens.shape
    hd = cfg.head_dim_
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, scaling=cfg.rope_scaling)
    h = embed(params, tokens)

    def layer(h, lp):
        return train_layer(h, lp, cfg, cos, sin, lengths, attn_impl)

    if unroll_layers:
        # remat boundary every 2 layers (not 1): halves the saved boundary
        # activations (128MB x L at 16k seq) for one extra layer recompute
        # per pair in the backward.
        def pair(h, lps):
            kv = None
            for lp in lps:
                h, kv = layer(h, lp)
            return h, kv
        if remat:
            pair = jax.checkpoint(pair)
        kv = None
        for i in range(0, cfg.num_layers, 2):
            lps = [jax.tree_util.tree_map(lambda x, j=j: x[j], params["layers"])
                   for j in range(i, min(i + 2, cfg.num_layers))]
            h, kv = pair(h, lps)
        out = _final(params, cfg, h)
        if return_last_kv:
            return out, kv
        return out
    if remat:
        layer = jax.checkpoint(layer)
    h, (ks, vs) = jax.lax.scan(layer, h, params["layers"])
    out = _final(params, cfg, h)
    if return_last_kv:
        return out, (ks[-1], vs[-1])
    return out


def logits_at(params, hidden_rows: jnp.ndarray) -> jnp.ndarray:
    """Project selected hidden rows to fp32 logits."""
    w = lm_head_weight(params)
    return jnp.dot(hidden_rows.astype(jnp.float32), w.astype(jnp.float32))


def alloc_kv_cache(cfg: ModelConfig, batch: int, s_max: int, dtype=jnp.bfloat16):
    """[L, B, Hkv, S, D] — head-major so per-head (chunk, D) tiles are
    contiguous for the Pallas decode kernel's DMA."""
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, s_max, cfg.head_dim_)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
