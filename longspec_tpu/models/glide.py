"""GLIDE draft layer: sliding-window self-attention + cross-attention over the
target model's last-layer KV cache + MLP, with three RMSNorms.

TPU-native re-design of the reference draft
(`longspec/test/llama_glide.py:23-468`): one functional layer whose state is
an explicit draft KV cache, driven by the same three shapes of step the
target model uses (prefill / append / train). The draft shares the target's
embedding and LM head, so it adds only its own single layer of parameters
and a single-layer KV cache.

Key semantics carried over from the reference:
  * self-attention uses a left sliding window of `window` tokens
    (flash ``window_size=(512, -1)``: `llama_glide.py:199, 227, 262, 300`);
  * q/k/v projections carry bias (`llama_glide.py:49-51`);
  * cross-attention queries are RoPE'd and attend the target's last-layer
    *post-RoPE* KV rows with "kvcache-causal" visibility: the i-th of T new
    draft tokens sees target rows [0, llm_len - T_valid + i + 1)
    (flash_attn_with_kvcache causal semantics, `llama_glide.py:261-265`);
    during tree expansion visibility is simply [0, llm_len)
    (causal=False, `llama_glide.py:296-297`);
  * training-time cross-attention truncates the teacher KV by a random
    1..4-token pad so the draft learns to run 1-4 tokens ahead of the
    target cache (`llama_glide.py:105-145`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, DraftConfig
from ..ops import attention as att
from ..ops.rope import rope_cos_sin, apply_rope
from .llama import (rms_norm, write_cache_rows, sliced_prefix_attention,
                    causal_self_attention)


def init_draft_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    hd = cfg.head_dim_
    D, I, H, Hkv = cfg.hidden_size, cfg.intermediate_size, cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(rng, 11)

    def w(key, *shape):
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    def attn(k0, k1, k2, k3):
        return {
            "wq": w(k0, D, H * hd), "bq": jnp.zeros((H * hd,), dtype),
            "wk": w(k1, D, Hkv * hd), "bk": jnp.zeros((Hkv * hd,), dtype),
            "wv": w(k2, D, Hkv * hd), "bv": jnp.zeros((Hkv * hd,), dtype),
            "wo": w(k3, H * hd, D),
        }

    return {
        "input_norm": jnp.ones((D,), dtype),
        "sa": attn(ks[0], ks[1], ks[2], ks[3]),
        "post_sa_norm": jnp.ones((D,), dtype),
        "ca": attn(ks[4], ks[5], ks[6], ks[7]),
        "post_ca_norm": jnp.ones((D,), dtype),
        "w_gate": w(ks[8], D, I),
        "w_up": w(ks[9], D, I),
        "w_down": w(ks[10], I, D),
    }


def qdot(x, w):
    """Matmul that dispatches on the weight leaf: a plain array runs in the
    ambient dtype; a `{"w8"|"w4", "scale"}` dict (from
    `quantize_draft_params`) runs as a native int8 MXU matmul — per-row
    dynamic activation scales x per-output-channel weight scales — reading
    half (int8) or a quarter (int4, stored packed; converted to int8 in
    VMEM) of the bf16 weight bytes."""
    if not isinstance(w, dict):
        return jnp.dot(x, w)
    xf = x.astype(jnp.float32)
    xmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x8 = jnp.round(xf * (127.0 / jnp.maximum(xmax, 1e-30))).astype(jnp.int8)
    wq = w["w4"].astype(jnp.int8) if "w4" in w else w["w8"]
    acc = jax.lax.dot_general(x8, wq,
                              (((x8.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (xmax / 127.0) * w["scale"]
    return out.astype(x.dtype)


def quantize_draft_params(draft_params, bits: int = 8):
    """Per-output-channel absmax int8/int4 copies of every 2-D draft kernel
    (biases/norms untouched). Feed the result anywhere draft params are
    accepted at decode time — `qdot` dispatches on the leaf shape. int4
    stores `jnp.int4` (XLA packs two nibbles per byte in HBM), quartering
    the weight bytes each tree level re-reads; proposal quality shifts a
    little more than int8, emitted tokens cannot (verification is full
    precision)."""
    assert bits in (8, 4), bits
    qmax = 127.0 if bits == 8 else 7.0

    def one(w):
        if getattr(w, "ndim", 0) != 2:
            return w
        wf = w.astype(jnp.float32)
        scale = jnp.max(jnp.abs(wf), axis=0) / qmax
        wq = jnp.round(wf / jnp.maximum(scale, 1e-30)[None, :])
        if bits == 8:
            return {"w8": wq.astype(jnp.int8), "scale": scale}
        return {"w4": wq.astype(jnp.int4), "scale": scale}

    return jax.tree.map(one, draft_params)


# ---------------------------------------------------------------------------
# Ring-buffer draft KV cache (DraftConfig.ring_size) — the machinery lives
# in ops/ring_cache.py, shared with the TARGET ring cache
# (EngineConfig.kv_ring). See that module's docstring for the row/position
# recovery scheme and eviction-safety argument.
# ---------------------------------------------------------------------------
from ..ops.ring_cache import (ring_index, ring_positions, ring_write,
                              ring_fill_from_prefill, ring_prefix_attention)


def _proj_qkv(x, ap, cfg: ModelConfig):
    b, t, _ = x.shape
    hd = cfg.head_dim_
    q = (qdot(x, ap["wq"]) + ap["bq"]).reshape(b, t, cfg.num_heads, hd)
    k = (qdot(x, ap["wk"]) + ap["bk"]).reshape(b, t, cfg.num_kv_heads, hd)
    v = (qdot(x, ap["wv"]) + ap["bv"]).reshape(b, t, cfg.num_kv_heads, hd)
    return q, k, v


def _mlp(x, p):
    return qdot(jax.nn.silu(qdot(x, p["w_gate"])) * qdot(x, p["w_up"]),
                p["w_down"])


def glide_forward(
    draft_params,
    cfg: ModelConfig,
    dcfg: DraftConfig,
    hidden: jnp.ndarray,            # [B, T, Dm] embedded input tokens
    positions: jnp.ndarray,         # [B, T] absolute positions
    d_kv_k: jnp.ndarray,            # [B, Hkv, Sd, D] draft self-attn KV cache
    d_kv_v: jnp.ndarray,
    d_cache_lens: jnp.ndarray,      # [B] valid draft KV rows
    llm_k: jnp.ndarray,             # [B, Hkv, S, D] target last-layer KV (roped)
    llm_v: jnp.ndarray,
    llm_k_hi: jnp.ndarray,          # [B] or [B, T] per-query CA upper bound
    suffix_mask: Optional[jnp.ndarray] = None,  # [B, T, T] (None => causal)
    attn_impl: str = "dense",
    write_at: Optional[jnp.ndarray] = None,
    suffix_kv: Optional[tuple] = None,          # (tk, tv): [B, Ns, Hkv, D]
    suffix_write_offset: int = 0,
    d_written: Optional[jnp.ndarray] = None,    # [B] true written count
                                                # (ring mode w/ suffix_kv)
    tables: Optional[jnp.ndarray] = None,       # [B, n_chunks] page tables
                                                # (attn_impl "paged": llm_k/v
                                                # are page POOLS)
    no_suffix: bool = False,                    # segmented prefill: skip the
                                                # dense suffix term; causality
                                                # comes from per-query
                                                # d_cache_lens/llm_k_hi bounds
                                                # ([B, T] allowed) and rows
                                                # written before attention
    write_valid: Optional[jnp.ndarray] = None,  # [B, T] ring-write row mask
    llm_ring_anchors: Optional[int] = None,     # target cache is a ring
                                                # (EngineConfig.kv_ring):
                                                # CA recovers key positions
    llm_written: Optional[jnp.ndarray] = None,  # [B] target written count
    llm_layer=None,                             # llm_k/v are the STACKED
                                                # [L, ...] target cache; CA
                                                # reads this layer zero-copy
                                                # (pallas BlockSpec index)
):
    """One GLIDE layer step over T new tokens.

    Self-attention = sliding-window prefix attention over the draft cache
    merged (via LSE) with suffix attention under `suffix_mask`; cross-
    attention = prefix attention over the target KV bounded by `llm_k_hi`.

    Without `suffix_kv`: new draft KV rows are written into the main cache at
    [write_at, write_at+T) (default: d_cache_lens) and the suffix keys are
    the T new tokens themselves. Returns (hidden', d_kv_k', d_kv_v').

    With `suffix_kv=(tk, tv)`: the new roped K/V are written into that side
    buffer at static offset `suffix_write_offset` and suffix attention runs
    over the whole buffer under suffix_mask [B, T, Ns] — this is the tree-
    expansion step, where queries of level l attend root + earlier-level
    nodes held in the side buffer (the reference writes tree KV into the
    main cache instead, `llama_glide.py:309-319`; a side buffer keeps the
    draft cache strictly append-only). Returns (hidden', tk', tv').
    """
    b, t, _ = hidden.shape
    hd = cfg.head_dim_
    if write_at is None:
        write_at = d_cache_lens
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, scaling=cfg.rope_scaling)
    if suffix_mask is None and not no_suffix:
        cm = att.causal_mask(t, t)
        if dcfg.window is not None:
            qi = jnp.arange(t)[:, None]
            kj = jnp.arange(t)[None, :]
            cm = cm & (kj >= qi - dcfg.window)
        suffix_mask = jnp.broadcast_to(cm[None], (b, t, t))

    # --- sliding-window self-attention ---
    x = rms_norm(hidden, draft_params["input_norm"], cfg.rms_norm_eps)
    q, k, v = _proj_qkv(x, draft_params["sa"], cfg)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    ring = dcfg.ring_size
    if suffix_kv is None:
        if ring is not None:
            d_kv_k = ring_write(d_kv_k, k, write_at, dcfg.anchors,
                                valid=write_valid)
            d_kv_v = ring_write(d_kv_v, v, write_at, dcfg.anchors,
                                valid=write_valid)
        elif attn_impl == "sp":
            from ..parallel.ring import sp_write_cache_rows
            d_kv_k = sp_write_cache_rows(attn_impl.mesh, d_kv_k, k, write_at,
                                         attn_impl.axis)
            d_kv_v = sp_write_cache_rows(attn_impl.mesh, d_kv_v, v, write_at,
                                         attn_impl.axis)
        else:
            d_kv_k = write_cache_rows(d_kv_k, k, write_at)
            d_kv_v = write_cache_rows(d_kv_v, v, write_at)
        sk, sv = k, v
    else:
        tk, tv = suffix_kv
        tk = jax.lax.dynamic_update_slice(tk, k.astype(tk.dtype),
                                          (0, suffix_write_offset, 0, 0))
        tv = jax.lax.dynamic_update_slice(tv, v.astype(tv.dtype),
                                          (0, suffix_write_offset, 0, 0))
        sk, sv = tk, tv
    if ring is not None:
        # true written count: rows just written hold positions >= the k_hi
        # bound, so they are masked; but position RECOVERY needs the real
        # count or a recycled row would report its pre-overwrite position
        if d_written is None:
            d_written = (write_at + t if suffix_kv is None else d_cache_lens)
        o_p, lse_p = ring_prefix_attention(q, d_kv_k, d_kv_v, d_cache_lens,
                                           positions, d_written,
                                           dcfg.window, dcfg.anchors)
    else:
        # the draft's OWN cache is always dense (it is O(window) small), so
        # paged mode only applies to the cross-attention below
        sa_impl = "chunked" if attn_impl == "paged" else attn_impl
        o_p, lse_p = sliced_prefix_attention(q, d_kv_k, d_kv_v, d_cache_lens,
                                             positions, dcfg.window,
                                             dcfg.anchors, sa_impl)
    if no_suffix:
        o = o_p
    else:
        o_s, lse_s = att.attend_masked(q, sk, sv, suffix_mask)
        o = att.merge_attention(o_p, lse_p, o_s, lse_s)
    o = qdot(o.astype(hidden.dtype).reshape(b, t, -1), draft_params["sa"]["wo"])
    hidden = hidden + o

    # --- cross-attention over target last-layer KV ---
    x = rms_norm(hidden, draft_params["post_sa_norm"], cfg.rms_norm_eps)
    qc, _, _ = _proj_qkv(x, draft_params["ca"], cfg)
    qc = apply_rope(qc, cos, sin)
    if llm_ring_anchors is not None:
        from ..ops.ring_cache import ring_attention
        o_c, _ = ring_attention(
            qc, llm_k, llm_v, llm_k_hi, positions, llm_written,
            dcfg.ca_window, llm_ring_anchors,
            impl="chunked" if attn_impl == "paged" else attn_impl,
            layer=llm_layer)
    else:
        o_c, _ = sliced_prefix_attention(qc, llm_k, llm_v, llm_k_hi,
                                         positions, dcfg.ca_window,
                                         dcfg.ca_anchors, attn_impl,
                                         tables=tables, layer_idx=llm_layer)
    o_c = qdot(o_c.astype(hidden.dtype).reshape(b, t, -1),
                  draft_params["ca"]["wo"])
    hidden = hidden + o_c

    # --- MLP ---
    x = rms_norm(hidden, draft_params["post_ca_norm"], cfg.rms_norm_eps)
    hidden = hidden + _mlp(x, draft_params)
    if suffix_kv is None:
        return hidden, d_kv_k, d_kv_v
    return hidden, tk, tv


def glide_prefill(
    draft_params,
    cfg: ModelConfig,
    dcfg: DraftConfig,
    hidden: jnp.ndarray,       # [B, S, Dm] embedded prompt
    positions: jnp.ndarray,    # [B, S]
    lengths: jnp.ndarray,      # [B] prompt lengths
    d_kv_k: jnp.ndarray, d_kv_v: jnp.ndarray,
    llm_k: jnp.ndarray, llm_v: jnp.ndarray,  # [B, Hkv, S, D]
    attn_impl: str = "chunked",
    tables=None,                             # [B, n_chunks] ("paged": llm_*
                                             # are page POOLS)
):
    """Memory-safe draft prompt prefill (ref `llama_glide.py:206-233` +
    ca_prefill `:263-265`): window-causal SA over the prompt, lag-0 causal CA
    over the target's last-layer KV. Writes draft KV rows [0:S)."""
    b, s, _ = hidden.shape
    cos, sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta, scaling=cfg.rope_scaling)

    x = rms_norm(hidden, draft_params["input_norm"], cfg.rms_norm_eps)
    q, k, v = _proj_qkv(x, draft_params["sa"], cfg)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    kt = k.transpose(0, 2, 1, 3)  # cache layout [B, Hkv, S, D]
    vt = v.transpose(0, 2, 1, 3)
    if dcfg.ring_size is not None:
        d_kv_k, d_kv_v = ring_fill_from_prefill(kt, vt, lengths, d_kv_k,
                                                d_kv_v, dcfg.anchors)
    else:
        d_kv_k = d_kv_k.at[:, :, :s].set(kt.astype(d_kv_k.dtype))
        d_kv_v = d_kv_v.at[:, :, :s].set(vt.astype(d_kv_v.dtype))
    o, _ = causal_self_attention(q, kt, vt, lengths, dcfg.window, dcfg.anchors,
                                 attn_impl)
    hidden = hidden + qdot(o.astype(hidden.dtype).reshape(b, s, -1),
                           draft_params["sa"]["wo"])

    x = rms_norm(hidden, draft_params["post_sa_norm"], cfg.rms_norm_eps)
    qc, _, _ = _proj_qkv(x, draft_params["ca"], cfg)
    qc = apply_rope(qc, cos, sin)
    # lag-0 causal CA over the target KV == causal self-attn masking with
    # external keys (query i attends llm rows [0, i+1)); q-blocked for memory.
    if attn_impl == "paged" and tables is not None:
        from .llama import paged_causal_attention
        if dcfg.ca_window is not None:
            raise NotImplementedError("ca_window is not plumbed through the "
                                      "paged prefix-cache prefill path")
        o_c, _ = paged_causal_attention(qc, llm_k, llm_v, tables, positions,
                                        lengths=lengths)
    else:
        # tables=None under "paged": the DENSE batch-1 admission prefill —
        # llm_* are contiguous caches (causal_self_attention maps paged ->
        # chunked internally)
        o_c, _ = causal_self_attention(qc, llm_k[:, :, :s], llm_v[:, :, :s],
                                       lengths, dcfg.ca_window,
                                       dcfg.ca_anchors, attn_impl)
    hidden = hidden + qdot(o_c.astype(hidden.dtype).reshape(b, s, -1),
                           draft_params["ca"]["wo"])

    x = rms_norm(hidden, draft_params["post_ca_norm"], cfg.rms_norm_eps)
    return hidden + _mlp(x, draft_params), d_kv_k, d_kv_v


def glide_train_forward(
    draft_params,
    cfg: ModelConfig,
    dcfg: DraftConfig,
    hidden: jnp.ndarray,      # [B, S, Dm] embedded tokens
    positions: jnp.ndarray,   # [B, S] (anchor-offset randomized by caller)
    llm_k: jnp.ndarray,       # [B, S, Hkv, D] teacher last-layer roped KV
    llm_v: jnp.ndarray,
    pad_size: jnp.ndarray,    # scalar int32 in [1, 4]
    lengths: Optional[jnp.ndarray] = None,
    attn_impl: str = "dense",
):
    """Training forward (ref `llama_glide.py:181-204` + `:105-145`).

    Self-attention: causal with left window. Cross-attention: query i attends
    teacher rows [0, i - pad_size] — i.e. the teacher cache truncated by
    `pad_size` tokens, with the first `pad_size` outputs zeroed, exactly the
    reference's pad-shift construction (`llama_glide.py:123-140`).

    ``attn_impl="chunked"`` routes both attentions through the online-softmax
    chunked machinery — mandatory at long seq: the dense masks are [B, S, S]
    and the dense score matrices [B, H, S, S] (tens of GB at seq 16k).
    """
    b, s, _ = hidden.shape
    hd = cfg.head_dim_
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta, scaling=cfg.rope_scaling)

    # self-attention (window + causal + per-row lengths)
    x = rms_norm(hidden, draft_params["input_norm"], cfg.rms_norm_eps)
    q, k, v = _proj_qkv(x, draft_params["sa"], cfg)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if attn_impl == "dense":
        sa_mask = att.prefill_mask(s, lengths, window=dcfg.window,
                                   anchors=dcfg.anchors)
        o, _ = att.attend_masked(q, k, v, sa_mask)
    else:
        o, _ = causal_self_attention(q, k.transpose(0, 2, 1, 3),
                                       v.transpose(0, 2, 1, 3), lengths,
                                       dcfg.window, dcfg.anchors, attn_impl)
    o = jnp.dot(o.astype(hidden.dtype).reshape(b, s, -1), draft_params["sa"]["wo"])
    hidden = hidden + o

    # cross-attention with pad-truncated teacher KV
    x = rms_norm(hidden, draft_params["post_sa_norm"], cfg.rms_norm_eps)
    qc, _, _ = _proj_qkv(x, draft_params["ca"], cfg)
    qc = apply_rope(qc, cos, sin)
    if attn_impl == "dense":
        qi = jnp.arange(s)[:, None]
        kj = jnp.arange(s)[None, :]
        ca_mask = ((kj <= qi - pad_size)[None]
                   & (kj[None] < lengths[:, None, None]))
        if dcfg.ca_window is not None:
            # window in ROW space from the query's own row (decode passes
            # positions == cache rows to sliced_prefix_attention); the
            # anchor-offset randomization only shifts rope phases
            vis = kj >= qi - dcfg.ca_window
            if dcfg.ca_anchors > 0:
                vis = vis | (kj < dcfg.ca_anchors)
            ca_mask = ca_mask & vis[None]
        o_c, _ = att.attend_masked(qc, llm_k, llm_v, ca_mask)
    else:
        # per-query exclusive bound: query i sees teacher rows [0, i-pad+1)
        k_hi2 = jnp.minimum(
            jnp.clip(jnp.arange(s)[None, :] - pad_size + 1, 0, None),
            lengths[:, None]).astype(jnp.int32)
        kc = llm_k.transpose(0, 2, 1, 3)
        vc = llm_v.transpose(0, 2, 1, 3)
        # scan over query blocks (same memory plan as causal_self_attention:
        # one block's online-softmax state live at a time, checkpointed so
        # the backward recomputes instead of stacking per-block probs)
        qb_size = min(512, s)
        n_blocks = -(-s // qb_size)
        pad_q = n_blocks * qb_size - s
        qc_p = jnp.pad(qc, ((0, 0), (0, pad_q), (0, 0), (0, 0))) if pad_q else qc
        khi_p = jnp.pad(k_hi2, ((0, 0), (0, pad_q))) if pad_q else k_hi2
        rows = jnp.broadcast_to(jnp.arange(n_blocks * qb_size)[None],
                                (b, n_blocks * qb_size))  # query ROW indices
        qb = qc_p.reshape(b, n_blocks, qb_size, *qc.shape[2:]).transpose(
            1, 0, 2, 3, 4)
        khi_b = khi_p.reshape(b, n_blocks, qb_size).transpose(1, 0, 2)
        rows_b = rows.reshape(b, n_blocks, qb_size).transpose(1, 0, 2)

        def ca_body(_, inp):
            q_blk, khi_blk, row_blk = inp
            # draft CA prefill: fast default matmul precision — the draft
            # only PROPOSES tokens, so its rounding cannot affect the T=0
            # lossless gate (the target verify decides every emitted token)
            o_blk, _ = sliced_prefix_attention(
                q_blk, kc, vc, khi_blk, row_blk,
                dcfg.ca_window, dcfg.ca_anchors, attn_impl, precision=None)
            return None, o_blk

        ca_body = jax.checkpoint(ca_body, prevent_cse=False)
        _, o_c = jax.lax.scan(ca_body, None, (qb, khi_b, rows_b))
        o_c = o_c.transpose(1, 0, 2, 3, 4).reshape(
            b, n_blocks * qb_size, *o_c.shape[3:])[:, :s]
    # rows i < pad_size have no visible key -> both impls return 0 there,
    # matching the reference's zero left-padding of the CA output.
    o_c = jnp.dot(o_c.astype(hidden.dtype).reshape(b, s, -1),
                  draft_params["ca"]["wo"])
    hidden = hidden + o_c

    x = rms_norm(hidden, draft_params["post_ca_norm"], cfg.rms_norm_eps)
    return hidden + _mlp(x, draft_params)
