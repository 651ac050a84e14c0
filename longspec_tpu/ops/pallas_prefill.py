"""Pallas TPU flash-attention prefill kernel (causal + sliding window).

TPU-native equivalent of the reference's `flash_attn_func` uses
(`longspec/test/llama.py:218` causal prefill; `llama_glide.py:199,227`
sliding-window draft prefill) plus per-row valid lengths and an optional
"external keys" mode for the draft's lag-0 cross-attention prefill
(`llama_glide.py:263-265`: query i attends key rows [0, i+1)).

Design: grid (B, Hkv, n_q_blocks, n_k_blocks) — for each (batch, kv-head,
query block) the KV blocks stream sequentially with online-softmax scratch.
Blocks fully outside the causal/window band are skipped: compute is
predicated off and DMA avoided by clamping the index map to the last block
that intersects the band (consecutive equal indices skip the re-fetch).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _prefill_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                    m_scr, l_scr, acc_scr,
                    *, scale, q_blk, k_blk, window, anchors, g, t):
    qi = pl.program_id(2)
    kc = pl.program_id(3)

    @pl.when(kc == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    b_idx = pl.program_id(0)
    seq_len = lens_ref[b_idx]
    q_start = qi * q_blk
    k_start = kc * k_blk
    # block intersects the band iff k_start <= q_end and (no window or
    # k_end > q_start - window) and k_start < seq_len
    q_end = q_start + q_blk - 1
    live = (k_start <= q_end) & (k_start < seq_len)
    if window is not None:
        win_live = (k_start + k_blk > q_start - window)
        if anchors > 0:
            win_live = win_live | (k_start < anchors)
        live = live & win_live

    @pl.when(live)
    def _():
        # q rows are (g, t) flattened: row = i * t + pos_in_block
        q = q_ref[0, 0].astype(jnp.float32)           # [G*q_blk, D]
        k = k_ref[0, 0].astype(jnp.float32)           # [k_blk, D]
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        qpos = q_start + row % q_blk                  # query absolute position
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (col <= qpos) & (col < seq_len) & (qpos < seq_len)
        if window is not None:
            vis = col >= qpos - window
            if anchors > 0:
                vis = jnp.logical_or(vis, col < anchors)
            mask = jnp.logical_and(mask, vis)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(kc == pl.num_programs(3) - 1)
    def _():
        l = l_scr[:]
        valid = l > 0.0
        o_ref[0, 0] = jnp.where(valid, acc_scr[:] / jnp.where(valid, l, 1.0), 0.0)
        m_safe = jnp.where(m_scr[:] > NEG_INF / 2, m_scr[:], 0.0)
        lse_ref[0, 0] = jnp.where(valid, m_safe + jnp.log(jnp.where(valid, l, 1.0)),
                                  -jnp.inf)


@functools.partial(jax.jit, static_argnames=("window", "anchors", "q_blk",
                                             "k_blk", "interpret", "kv_in_cache_layout"))
def flash_prefill(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  lengths: jnp.ndarray, window: Optional[int] = None,
                  anchors: int = 0, q_blk: int = 256, k_blk: int = 512,
                  interpret: Optional[bool] = None,
                  kv_in_cache_layout: bool = True):
    """Causal (optionally sliding-window) self/cross attention over a full
    sequence with per-row lengths.

    q: [B, S, H, D]; k, v: [B, Hkv, S, D] (cache layout; pass
    kv_in_cache_layout=False for [B, S, Hkv, D]).
    Returns (o fp32 [B, S, H, D], lse fp32 [B, S, H]).
    """
    b, s, h, d = q.shape
    if not kv_in_cache_layout:
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    hkv = k.shape[1]
    g = h // hkv
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n_q = -(-s // q_blk)
    n_k = -(-s // k_blk)
    s_qpad = n_q * q_blk
    s_kpad = n_k * k_blk
    # group queries by kv head: [B, Hkv, G, S, D] -> [B, Hkv, G*S, D] where
    # within a q block rows are [g0 rows.., g1 rows..] — we instead interleave
    # blocks: easier layout: [B, Hkv, n_q, G*q_blk, D] flattened.
    qg = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, s, d)
    if s_qpad != s:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, s_qpad - s), (0, 0)))
    # [B, Hkv, G, n_q, q_blk, D] -> [B, Hkv, n_q, G, q_blk, D] -> flat rows
    qg = qg.reshape(b, hkv, g, n_q, q_blk, d).transpose(0, 1, 3, 2, 4, 5)
    qg = qg.reshape(b, hkv, n_q * g * q_blk, d)
    if s_kpad != s:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_kpad - s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_kpad - s), (0, 0)))

    rows = g * q_blk
    lens = lengths.astype(jnp.int32)

    kernel = functools.partial(_prefill_kernel, scale=d ** -0.5, q_blk=q_blk,
                               k_blk=k_blk, window=window, anchors=anchors,
                               g=g, t=s)
    vm = pltpu.VMEM
    # clamp KV index into the live band for this q block: skip DMA of dead
    # upper-triangle blocks and of blocks entirely left of the window. With
    # anchors (attention sinks), the sinks live in KV block 0 (anchors <=
    # k_blk), so grid step kc=0 fetches the real block 0 and steps 1..
    # clamp into [first_live, last_live] — dead mid-band steps map onto
    # first_live (fetched once, compute predicated off by `live`). At 131k
    # ctx with window 12288 this cuts prefill-attention HBM traffic ~10x.
    def k_idx(i, j, qi, kc, lens_pf):
        last_live = jnp.minimum((qi * q_blk + q_blk - 1) // k_blk, n_k - 1)
        kcc = jnp.minimum(kc, last_live)
        if window is not None and 0 <= anchors <= k_blk:
            first_live = jnp.maximum((qi * q_blk - window) // k_blk, 0)
            if anchors == 0:
                kcc = jnp.maximum(kcc, first_live)
            else:
                kcc = jnp.where(kc == 0, 0, jnp.maximum(kcc, first_live))
        return (i, j, kcc, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 1, rows, d),
                         lambda i, j, qi, kc, lens_pf: (i, j, qi, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, k_blk, d), k_idx, memory_space=vm),
            pl.BlockSpec((1, 1, k_blk, d), k_idx, memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rows, d),
                         lambda i, j, qi, kc, lens_pf: (i, j, qi, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, rows, 1),
                         lambda i, j, qi, kc, lens_pf: (i, j, qi, 0),
                         memory_space=vm),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, n_q * rows, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, n_q * rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lens, qg, k, v)

    o = o.reshape(b, hkv, n_q, g, q_blk, d).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(b, hkv, g, s_qpad, d)[:, :, :, :s]
    o = o.reshape(b, h, s, d).transpose(0, 2, 1, 3)
    lse = lse.reshape(b, hkv, n_q, g, q_blk).transpose(0, 1, 3, 2, 4)
    lse = lse.reshape(b, h, s_qpad)[:, :, :s].transpose(0, 2, 1)
    return o, lse


# ---------------------------------------------------------------------------
# Segmented-prefill attention over the KV cache (affine positions)
# ---------------------------------------------------------------------------

def _cache_prefill_kernel(pf_ref, q_ref, k_ref, v_ref, *rest, scale, q_blk,
                          chunk, window, anchors, g, quant, stacked):
    if quant:
        (ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr) = rest
    else:
        ks_ref = vs_ref = None
        (o_ref, m_scr, l_scr, acc_scr) = rest
    qb = pl.program_id(2)
    kc = pl.program_id(3)

    @pl.when(kc == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    b_idx = pl.program_id(0)
    q_off = pf_ref[0]
    row_len = pf_ref[2 + b_idx]
    q_lo = q_off + qb * q_blk                  # first query position in block
    k_start = kc * chunk
    live = (k_start <= q_lo + q_blk - 1) & (k_start < row_len)
    if window is not None:
        win_live = k_start + chunk > q_lo - window
        if anchors > 0:
            win_live = win_live | (k_start < anchors)
        live = live & win_live

    @pl.when(live)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)            # [G*q_blk, D]
        k = (k_ref[0, 0, 0] if stacked else k_ref[0, 0]).astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * (ks_ref[0, 0, 0] if stacked else ks_ref[0, 0])
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        qpos = q_lo + row % q_blk                      # affine positions
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # khi = min(qpos + 1, row_len): causal bound + per-row valid length
        mask = (col <= qpos) & (col < row_len)
        if window is not None:
            vis = col >= qpos - window
            if anchors > 0:
                vis = jnp.logical_or(vis, col < anchors)
            mask = jnp.logical_and(mask, vis)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = (v_ref[0, 0, 0] if stacked else v_ref[0, 0]).astype(jnp.float32)
        pv = (p * (vs_ref[0, 0, 0] if stacked else vs_ref[0, 0])
              if quant else p)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(kc == pl.num_programs(3) - 1)
    def _():
        l = l_scr[:]
        valid = l > 0.0
        o_ref[0, 0] = jnp.where(valid,
                                acc_scr[:] / jnp.where(valid, l, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("window", "anchors", "q_blk",
                                             "chunk", "interpret"))
def flash_cache_prefill(q: jnp.ndarray, k_cache, v_cache,
                        q_off: jnp.ndarray, row_len: jnp.ndarray,
                        window: Optional[int] = None, anchors: int = 0,
                        q_blk: int = 512, chunk: int = 2048,
                        interpret: Optional[bool] = None,
                        layer: Optional[jnp.ndarray] = None):
    """Segmented-prefill attention: T new queries at AFFINE positions
    q_off + arange(T) attend cache rows [0, min(pos+1, row_len[b])) with an
    optional sliding window + sinks. The affine-position structure is what
    lets this beat `flash_decode`'s generic per-row-k_hi path for prefill
    segments: no per-row khi/qpos tiles in VMEM (positions derive from the
    block index), so query blocks are q_blk=512 positions (G*512 rows)
    instead of R_MAX=640 ROWS — fewer streaming passes over the KV band and
    no host-level lax.map splitting (the old path cut T=8192 segments into
    ~52 sequential pallas calls, each re-streaming its band).

    q: [B, T, H, D] (T % q_blk == 0 after padding here); caches
    [B, Hkv, S, D] or QuantKV, or stacked [L, ...] with `layer` given
    (zero-copy layer pick, like flash_decode). q_off: scalar int32 (same
    offset for every row — the segmented prefill slices one token matrix);
    row_len: [B] int32. Returns o fp32 [B, T, H, D] (no LSE: the
    suffix-free prefill path never merges).

    Semantics equal sliced_prefix_attention(..., k_hi=min(pos+1, row_len))
    — oracle-tested in tests/test_pallas.py.
    """
    from .quantkv import QuantKV
    quant = isinstance(k_cache, QuantKV)
    stacked = layer is not None
    b, t, h, d = q.shape
    hkv = (k_cache.qv if quant else k_cache).shape[1 + stacked]
    g = h // hkv
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    n_qb = -(-t // q_blk)
    t_pad = n_qb * q_blk
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
    # [B, T, H, D] -> [B, Hkv, n_qb, G*q_blk, D] (g-major inside a block)
    qg = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, t_pad, d)
    qg = qg.reshape(b, hkv, g, n_qb, q_blk, d).transpose(0, 1, 3, 2, 4, 5)
    qg = qg.reshape(b, hkv, n_qb * g * q_blk, d)
    rows = g * q_blk

    if quant:
        if stacked:
            k_scale = k_cache.scale[:, :, :, None, :]
            v_scale = v_cache.scale[:, :, :, None, :]
        else:
            k_scale = k_cache.scale[:, :, None, :]
            v_scale = v_cache.scale[:, :, None, :]
        k_cache, v_cache = k_cache.qv, v_cache.qv
    s = k_cache.shape[2 + stacked]
    if s % chunk:
        if stacked:
            raise ValueError("stacked flash_cache_prefill needs a "
                             f"chunk-aligned cache (S={s}, chunk={chunk})")
        pad = chunk - s % chunk
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if quant:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, 0), (0, pad)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, 0), (0, pad)))
        s += pad
    n_k = s // chunk

    layer_s = (jnp.int32(0) if layer is None
               else jnp.asarray(layer, jnp.int32).reshape(()))
    pf = jnp.concatenate([jnp.asarray(q_off, jnp.int32).reshape(1),
                          layer_s.reshape(1),
                          row_len.astype(jnp.int32).reshape(-1)])

    kernel = functools.partial(_cache_prefill_kernel, scale=d ** -0.5,
                               q_blk=q_blk, chunk=chunk, window=window,
                               anchors=anchors, g=g, quant=quant,
                               stacked=stacked)

    a_chunks = -(-anchors // chunk) if anchors > 0 else 0

    def kv_map(i, j, qb, kc, pf_s):
        # clamp into this q block's live chunk band [c_lo, c_hi]; dead grid
        # steps re-point at a fetched block (no DMA), compute predicated off
        q_lo = pf_s[0] + qb * q_blk
        c_hi = jnp.clip((q_lo + q_blk - 1) // chunk, 0, n_k - 1)
        kcc = jnp.minimum(kc, c_hi)
        if window is not None:
            c_lo = jnp.maximum((q_lo - window) // chunk, 0)
            if a_chunks:
                kcc = jnp.where(kc < a_chunks, kc, jnp.maximum(kcc, c_lo))
            else:
                kcc = jnp.maximum(kcc, c_lo)
        return (pf_s[1], i, j, kcc, 0) if stacked else (i, j, kcc, 0)

    def sc_map(i, j, qb, kc, pf_s):
        idx = kv_map(i, j, qb, kc, pf_s)
        return idx[:-2] + (0, idx[-2])

    vm = pltpu.VMEM
    kv_block = (1, 1, 1, chunk, d) if stacked else (1, 1, chunk, d)
    sc_block = (1, 1, 1, 1, chunk) if stacked else (1, 1, 1, chunk)
    in_specs = [
        pl.BlockSpec((1, 1, rows, d), lambda i, j, qb, kc, pf_s: (i, j, qb, 0),
                     memory_space=vm),
        pl.BlockSpec(kv_block, kv_map, memory_space=vm),
        pl.BlockSpec(kv_block, kv_map, memory_space=vm),
    ]
    inputs = [pf, qg, k_cache, v_cache]
    if quant:
        in_specs += [pl.BlockSpec(sc_block, sc_map, memory_space=vm),
                     pl.BlockSpec(sc_block, sc_map, memory_space=vm)]
        inputs += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, n_qb, n_k),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, rows, d),
                         lambda i, j, qb, kc, pf_s: (i, j, qb, 0),
                         memory_space=vm),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
    )
    (o,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, hkv, n_qb * rows, d),
                                        jnp.float32)],
        interpret=interpret,
    )(*inputs)

    o = o.reshape(b, hkv, n_qb, g, q_blk, d).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(b, hkv, g, t_pad, d)[:, :, :, :t]
    o = o.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return o
