"""Ring-buffer KV cache: O(window) physical rows for windowed attention.

Shared by the DRAFT cache (`DraftConfig.ring_size`, models/glide.py) and the
TARGET cache (`EngineConfig.kv_ring`, engine/engine.py). A model whose
decode-time attention is sliding-window + sinks only ever reaches `window`
recent positions plus `anchors` sink rows, so the cache needs O(window)
physical rows, not O(context): rows [0, anchors) pin the sinks; position
p >= anchors lives at physical row anchors + (p - anchors) % W with
W = R - anchors. A row's position is recoverable from (row, written count)
alone — the LARGEST congruent position below the written count — so no
per-row position state is carried; overwritten positions are exactly the
ones that fell out of every reachable window (callers validate
W >= window + writes-per-dispatch).

This replaces the reference's approach of *renting bigger GPUs* for its
262k-context registry entries (`inference_long-bench.py:58-61`): a 262144-
token windowed decode fits one 16GB v5e with GBs to spare.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import attention as att

# q-block size for ring_chunked_prefix_attention's large-T split (module
# level so tests can force the split on tiny shapes)
TQ_BLOCK = 512


def ring_index(pos, anchors: int, ring: int):
    """Physical ring row of absolute position `pos`."""
    w = ring - anchors
    return jnp.where(pos < anchors, pos, anchors + (pos - anchors) % w)


def recover_positions(r, d, anchors: int, w):
    """THE position-recovery law (single definition): the position held by
    physical row(s) `r` given `d` written positions — the largest position
    congruent to r (mod w, past the pinned anchors) that is < d. Returns
    (pos, valid) broadcast over r/d."""
    k = jnp.maximum((d - 1 - r) // w, 0)
    p = jnp.where(r < anchors, r, r + k * w)
    return p, p < d


def ring_positions(d_len, anchors: int, ring: int):
    """Positions currently held by each physical row, given `d_len` written
    positions. d_len: [...]-shaped int; returns (pos [..., R], valid [..., R]).
    Invalid rows (never written) report a position >= d_len."""
    return recover_positions(jnp.arange(ring), d_len[..., None], anchors,
                             ring - anchors)


def _ring_write_gather(cache, new, write_at, anchors: int, valid=None):
    """Large-T ring write as GATHER + select instead of scatter.

    TPU scatter is row-serial — a segmented-prefill write of T=8192 rows
    into the ring costs orders of magnitude more than the bytes moved. The
    ring is small (O(window)), so invert the mapping: for each physical row
    r, recover the position it holds AFTER this write (recover_positions at
    d = end-of-write) and, when that position falls inside [write_at, end),
    gather it from `new` — two vectorized passes over the ring instead of T
    serial row updates. Bit-identical to the scatter form (same rows end up
    holding the same values; gated in tests/test_target_ring.py)."""
    b, t = new.shape[0], new.shape[1]
    ring = cache.shape[2]
    if valid is not None:
        count = jnp.sum(valid.astype(jnp.int32), axis=1)          # [B]
    else:
        count = jnp.full((b,), t, jnp.int32)
    end = write_at + count                                        # [B]
    r = jnp.arange(ring)
    p, vld = recover_positions(r, end[:, None], anchors, ring - anchors)
    take = vld & (p >= write_at[:, None])                         # [B, R]
    j = jnp.clip(p - write_at[:, None], 0, t - 1)                 # [B, R]
    # new: [B, T, Hkv, D] -> gather rows by j -> [B, R, Hkv, D]
    g = jnp.take_along_axis(new, j[:, :, None, None], axis=1)
    g = jnp.moveaxis(g, 1, 2).astype(cache.dtype)                 # [B,Hkv,R,D]
    return jnp.where(take[:, None, :, None], g, cache)


def ring_write(cache, new, write_at, anchors: int, valid=None):
    """Scatter T new rows at positions [write_at, write_at+T) into the ring.

    cache: [B, Hkv, R, D]; new: [B, T, Hkv, D]; write_at: [B].
    `valid` [B, T] masks rows out of the write entirely (segmented prefill:
    a padded row's junk positions would otherwise wrap the ring and evict
    live rows — unlike a dense cache, where junk beyond `lengths` is inert).

    When T exceeds the ring's window capacity (segmented prefill with
    prefill_seg >> ring_size), positions that are guaranteed already
    evicted by the END of this write are dropped up front: a slot must be
    scattered at most once per call, because duplicate-index .at[].set
    ordering is undefined and a stale earlier wrap could otherwise survive
    as if it were the latest position."""
    b, t = new.shape[0], new.shape[1]
    ring = cache.shape[2]
    if t >= 256:
        # prefill segments: gather-select beats the row-serial TPU scatter
        return _ring_write_gather(cache, new, write_at, anchors, valid)
    pos = write_at[:, None] + jnp.arange(t)[None, :]             # [B, T]
    w = ring - anchors
    # per-row effective end: `valid` is a prefix mask (pos < row length), so
    # the row's last written position is write_at + count(valid) — a padded
    # row's recent window ends at its LENGTH, not at the segment end
    if valid is not None:
        end = write_at + jnp.sum(valid.astype(jnp.int32), axis=1)
    else:
        end = write_at + t
    keep = (pos >= end[:, None] - w) | (pos < anchors)
    if valid is not None:
        keep = keep & valid
    idx = jnp.where(keep, ring_index(pos, anchors, ring), ring)  # OOB -> drop

    def one(c, n, i):
        return c.at[:, i, :].set(n.astype(c.dtype), mode="drop")

    return jax.vmap(one)(cache, new.transpose(0, 2, 1, 3), idx)


def ring_fill_from_prefill(k_t, v_t, lengths, cache_k, cache_v, anchors: int):
    """Populate the ring from full prefill K/V (cache layout [B, Hkv, S, D]):
    for each ring row, gather the position it should hold at d_len=lengths.
    Rows not yet reachable are zeroed."""
    ring = cache_k.shape[2]
    pos, valid = ring_positions(lengths, anchors, ring)
    src = jnp.clip(pos, 0, k_t.shape[2] - 1)[:, None, :, None]   # [B,1,R,1]

    def gather(full, cache):
        g = jnp.take_along_axis(full, jnp.broadcast_to(
            src, (full.shape[0], full.shape[1], ring, full.shape[3])), axis=2)
        g = jnp.where(valid[:, None, :, None], g, 0)
        return g.astype(cache.dtype)

    return gather(k_t, cache_k), gather(v_t, cache_v)


def ring_prefix_attention(q, cache_k, cache_v, k_hi, q_pos, d_len,
                          window, anchors: int):
    """Dense masked attention over the ring, mask built from RECOVERED key
    positions (right shape when the ring is ~window-sized and T is small).
    Semantics match `sliced_prefix_attention` over a full-length cache
    restricted to window+anchors visibility. Returns (o fp32, lse fp32)."""
    b, tq = q.shape[:2]
    ring = cache_k.shape[2]
    if k_hi.ndim == 1:
        k_hi = jnp.broadcast_to(k_hi[:, None], (b, tq))
    pos, valid = ring_positions(d_len, anchors, ring)        # [B, R]
    mask = valid[:, None, :] & (pos[:, None, :] < k_hi[:, :, None])
    if window is not None:
        vis = pos[:, None, :] >= q_pos[:, :, None] - window
        if anchors > 0:
            vis = vis | (pos[:, None, :] < anchors)
        mask = mask & vis
    return att.attend_masked(q, cache_k.transpose(0, 2, 1, 3),
                             cache_v.transpose(0, 2, 1, 3), mask)


def ring_attention(q, cache_k, cache_v, k_hi, q_pos, d_len, window,
                   anchors: int, impl: str = "chunked", precision=None,
                   layer=None):
    """Ring prefix attention dispatched on the engine attention impl:
    "pallas" streams the ring through the flash-decode kernel with in-kernel
    position recovery (pallas_decode.flash_decode(ring=True) — one VMEM
    pass, masks computed in registers); anything else runs the pure-XLA
    chunked oracle below. Same (o, lse) contract.

    `layer`: stacked [L, ...] caches — pallas indexes the layer in its
    BlockSpec (zero-copy); the chunked fallback slices it out here."""
    if impl == "pallas":
        from .pallas_decode import flash_decode
        return flash_decode(q, cache_k, cache_v, k_hi, q_pos, window,
                            anchors, ring=True, d_len=d_len, layer=layer,
                            precision=(jax.lax.Precision.DEFAULT
                                       if precision is None else precision))
    if layer is not None:
        cache_k = jax.lax.dynamic_index_in_dim(cache_k, layer, keepdims=False)
        cache_v = jax.lax.dynamic_index_in_dim(cache_v, layer, keepdims=False)
    return ring_chunked_prefix_attention(q, cache_k, cache_v, k_hi, q_pos,
                                         d_len, window, anchors,
                                         precision=precision)


def ring_chunked_prefix_attention(q, cache_k, cache_v, k_hi, q_pos, d_len,
                                  window, anchors: int, chunk: int = 2048,
                                  precision=None):
    """Chunked online-softmax attention over the ring — the large-T form
    (segmented prefill runs 8192-query segments; a dense [T, R] mask matrix
    would be GBs there). Per KV chunk, key positions are RECOVERED from the
    physical row index and the written count, and the mask/visibility math
    matches `ring_prefix_attention` exactly. One code path serves T=1
    decode, T~85 verify and T=8192 prefill segments — the same shared-law
    property the fp32-island discipline relies on.

    q: [B, T, H, D]; caches: [B, Hkv, R, D]; k_hi: [B] or [B, T]; q_pos and
    d_len as in `ring_positions`. Returns (o fp32, lse fp32)."""
    b, tq, h, d = q.shape
    hkv, ring = cache_k.shape[1], cache_k.shape[2]
    groups = h // hkv
    if k_hi.ndim == 1:
        k_hi2 = jnp.broadcast_to(k_hi[:, None], (b, tq))
    else:
        k_hi2 = k_hi
    # q-block large query batches (prefill segments): the per-chunk score/
    # probability tensors are [B,Hkv,G,Tq,chunk] f32 — at Tq=8192 that is
    # ~2GB per chunk step; 512-query blocks keep them ~130MB. Exact: queries
    # are independent given their per-row bounds.
    if tq > TQ_BLOCK:
        n_b = -(-tq // TQ_BLOCK)
        t_pad = n_b * TQ_BLOCK
        if t_pad != tq:
            q = jnp.pad(q, ((0, 0), (0, t_pad - tq), (0, 0), (0, 0)))
            k_hi2 = jnp.pad(k_hi2, ((0, 0), (0, t_pad - tq)))  # k_hi=0: dead
            q_pos = jnp.pad(q_pos, ((0, 0), (0, t_pad - tq)))
        qs = jnp.moveaxis(q.reshape(b, n_b, TQ_BLOCK, h, d), 1, 0)
        ks = jnp.moveaxis(k_hi2.reshape(b, n_b, TQ_BLOCK), 1, 0)
        ps = jnp.moveaxis(q_pos.reshape(b, n_b, TQ_BLOCK), 1, 0)
        o, lse = jax.lax.map(
            lambda args: ring_chunked_prefix_attention(
                args[0], cache_k, cache_v, args[1], args[2], d_len,
                window, anchors, chunk, precision),
            (qs, ks, ps))
        o = jnp.moveaxis(o, 0, 1).reshape(b, t_pad, h, d)[:, :tq]
        lse = jnp.moveaxis(lse, 0, 1).reshape(b, t_pad, h)[:, :tq]
        return o, lse
    qf = (q.astype(jnp.float32) * (d ** -0.5)).transpose(0, 2, 1, 3)
    qf = qf.reshape(b, hkv, groups, tq, d)
    scale_f = jnp.float32(d ** -0.5)
    qb16 = (jax.lax.optimization_barrier(
        q.astype(jnp.bfloat16)).transpose(0, 2, 1, 3)
        .reshape(b, hkv, groups, tq, d)
        if precision == "bf16_pinned" else None)
    n_chunks = max(1, -(-ring // chunk))
    pad = n_chunks * chunk - ring
    w = ring - anchors

    def chunked(cache):
        arr = cache
        if pad:
            arr = jnp.pad(arr, ((0, 0), (0, 0), (0, pad), (0, 0)))
        arr = arr.reshape(b, hkv, n_chunks, chunk, arr.shape[3])
        return jnp.moveaxis(arr, 2, 0)

    kc, vc = chunked(cache_k), chunked(cache_v)
    d_col = d_len[:, None]                                    # [B, 1]

    def body(carry, inp):
        m_run, l_run, acc = carry
        kch, vch, c_idx = inp                      # [B, Hkv, chunk, D]
        r = c_idx * chunk + jnp.arange(chunk)      # physical rows [chunk]
        p, valid = recover_positions(r[None, :], d_col, anchors, w)
        valid = valid & (r[None, :] < ring)                   # [B, chunk]
        mask = valid[:, None, :] & (p[:, None, :] < k_hi2[:, :, None])
        if window is not None:
            vis = p[:, None, :] >= q_pos[:, :, None] - window
            if anchors > 0:
                vis = vis | (p[:, None, :] < anchors)
            mask = mask & vis                                  # [B, Tq, chunk]
        mask = mask[:, None, None]                             # [B,1,1,Tq,chunk]
        if precision == "bf16_pinned":
            # pinned-cast bf16 operand law (att.attend_masked docstring)
            kb = jax.lax.optimization_barrier(kch.astype(jnp.bfloat16))
            sco = jnp.einsum("bhgqd,bhkd->bhgqk", qb16, kb,
                             preferred_element_type=jnp.float32) * scale_f
        else:
            sco = jnp.einsum("bhgqd,bhkd->bhgqk", qf,
                             kch.astype(jnp.float32), precision=precision)
        sco = jnp.where(mask, sco, att.NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(sco, axis=-1))
        pmat = jnp.where(mask, jnp.exp(sco - m_new[..., None]), 0.0)
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(pmat, axis=-1)
        if precision == "bf16_pinned":
            pb = jax.lax.optimization_barrier(pmat.astype(jnp.bfloat16))
            vb = jax.lax.optimization_barrier(vch.astype(jnp.bfloat16))
            pv = jnp.einsum("bhgqk,bhkd->bhgqd", pb, vb,
                            preferred_element_type=jnp.float32)
        else:
            pv = jnp.einsum("bhgqk,bhkd->bhgqd", pmat,
                            vch.astype(jnp.float32), precision=precision)
        acc = acc * alpha[..., None] + pv
        return (m_new, l_new, acc), None

    m0 = jnp.full((b, hkv, groups, tq), att.NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, groups, tq), jnp.float32)
    a0 = jnp.zeros((b, hkv, groups, tq, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0),
                                  (kc, vc, jnp.arange(n_chunks)))
    valid_q = l > 0.0
    o = acc / jnp.where(valid_q, l, 1.0)[..., None]
    o = jnp.where(valid_q[..., None], o, 0.0)
    m_safe = jnp.where(m > att.NEG_INF / 2, m, 0.0)
    lse = jnp.where(valid_q, m_safe + jnp.log(jnp.where(valid_q, l, 1.0)),
                    -jnp.inf)
    # [B, Hkv, G, Tq, D] -> [B, Tq, H, D]
    o = o.reshape(b, hkv * groups, tq, d).transpose(0, 2, 1, 3)
    lse = lse.reshape(b, hkv * groups, tq).transpose(0, 2, 1)
    return o, lse
