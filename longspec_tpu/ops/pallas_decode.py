"""Pallas TPU flash-decode kernel.

The TPU-native equivalent of the reference's `flash_attn_with_kvcache`
(CUDA, used at `longspec/test/llama.py:324-325, 385` and
`llama_glide.py:261-300`) with the extra capabilities hybrid tree attention
needs (SURVEY.md §7.3):

  * per-QUERY exclusive key upper bound `k_hi` (covers per-row cache lengths
    AND the kvcache-causal re-encode semantics in one mechanism);
  * optional sliding window with attention-sink anchors;
  * fp32 log-sum-exp output for exact merging with the tree-masked suffix.

Design: grid (B, Hkv, S/chunk); for each (batch, kv-head) the G*T query rows
(G = GQA group size x T new tokens) stay resident in VMEM while KV chunks
stream through; online-softmax state (m, l, acc) lives in VMEM scratch across
chunk iterations (TPU grids execute sequentially over the minor dimension).
Chunks entirely beyond every query's k_hi are skipped: their compute is
predicated off AND their DMA is avoided by clamping the BlockSpec index map
to the last useful chunk (Pallas skips re-fetching an unchanged block).

Chunk default (2048) is measured, not guessed (scripts/tune_decode.py on one
v5e chip, decode t=1 and tree-verify t=69 at 8k/32k): 2048 wins or ties
every shape; vs the XLA chunked path the kernel is ~15% faster at 8k and
~40% faster at 32k (1.09 ms vs 1.81 ms, t=1) — the sequential-grid VMEM
streaming pays off exactly where the north star lives (long context).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Max G*T query rows kept VMEM-resident per kernel call; larger query
# batches (segmented prefill) are split along T and lax.map'ed. Scoped
# VMEM cost is ~17.1KB/row at D=128 — the (R, 1) khi/qpos/lse/m/l tiles
# each lane-pad to 128, so rows cost far more than the q/acc math says.
# 640 is the largest value where the worst caller (bf16 KV + window +
# anchors, chunk 2048) fits the 16MB scoped budget on v5e, measured by
# AOT compile; decode/verify calls (R <= ~340) are untouched.
R_MAX = 640


def _decode_kernel(nchunk_ref, khi_ref, qpos_ref, q_ref, k_ref, v_ref,
                   *rest, scale, chunk, window, anchors, t, g, quant=False,
                   ring=None, stacked=False, precision=None):
    if quant:
        # int8 KV + per-row scales (ops.quantkv). Scales ride as [1, chunk]
        # lane-major tiles (a (chunk, 1) block would pad to 128 lanes and
        # cost as much DMA as the int8 KV itself) and are applied to the
        # score/probability matrices — sum_d q_d*(k_d*s) == (sum_d q_d*k_d)*s
        (ks_ref, vs_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest
    else:
        ks_ref = vs_ref = None
        (o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest
    c = pl.program_id(2)
    # scalar-prefetch layout: [n_used, c_lo, layer, d_len(b)...] — slot 2 is
    # the stacked-cache layer index (consumed by the index maps, not here)
    # per-batch written-position count (ring mode), read at kernel top level:
    # program_id inside a pl.when body fails interpret-mode lowering
    d_count = nchunk_ref[3 + pl.program_id(0)] if ring is not None else None

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    n_used = nchunk_ref[0]
    c_lo = nchunk_ref[1]

    # skip chunks above every query's k_hi AND (with a window) chunks below
    # every query's window start — the chunks holding anchor sinks (all
    # ceil(anchors/chunk) of them, not just chunk 0) stay live.
    # Ring mode: positions are scattered over physical rows mod the ring
    # width, so no chunk is position-sorted — every chunk below n_used
    # (= the whole ring) is live; masking is entirely per-row.
    live = c < n_used
    if window is not None and ring is None:
        in_win = c >= c_lo
        if anchors > 0:
            in_win = jnp.logical_or(in_win, c < -(-anchors // chunk))
        live = jnp.logical_and(live, in_win)

    @pl.when(live)
    def _():
        # Decode/verify matmul-precision law (the lossless gate's bite):
        # a DEFAULT-precision f32 MXU dot lets the compiler truncate the
        # operands to bf16 per-fusion, injecting ~1e-3 program-dependent
        # rounding into the scores — enough that the vanilla and tree
        # arms' committed K/V rows drift 1-2 bf16 ulps and a 0.004-margin
        # greedy tie flips (bitdiff_hard8k_r4.log). Two deterministic
        # alternatives, selected by `precision`:
        #   * Precision.HIGHEST — exact f32 operands (6 MXU passes;
        #     measured ~35% tree-throughput tax at 8k);
        #   * "bf16_pinned" — operands EXPLICITLY rounded to bf16 (RTNE,
        #     written into the program, so every arm computes the same
        #     function), fp32 accumulation, ONE MXU pass. Scale applied
        #     after the dot in f32 so q is rounded once, unscaled.
        kr = k_ref[0, 0, 0] if stacked else k_ref[0, 0]
        if precision == "bf16_pinned":
            qb = q_ref[0, 0].astype(jnp.bfloat16)    # [R, D]
            s = jax.lax.dot_general(qb, kr.astype(jnp.bfloat16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale                             # [R, chunk]
        else:
            q = q_ref[0, 0].astype(jnp.float32)      # [R, D]
            s = jax.lax.dot_general(q * scale, kr.astype(jnp.float32),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=precision)  # [R, chunk]
        if quant:                                    # [1, chunk] K scales
            s = s * (ks_ref[0, 0, 0] if stacked else ks_ref[0, 0])
        col = c * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        khi = khi_ref[0]                              # [R, 1]
        if ring is not None:
            # O(window) ring cache (ops/ring_cache.py): physical row `col`
            # holds RECOVERED position p — the largest position congruent
            # to col (mod w, past the pinned sink rows) below the written
            # count d (per-batch scalar at prefetch slot 2+b). Same law as
            # ring_cache.recover_positions.
            ring_size = ring
            d = d_count
            w = ring_size - anchors
            kk = jnp.maximum((d - 1 - col) // w, 0)
            p = jnp.where(col < anchors, col, col + kk * w)
            valid = jnp.logical_and(p < d, col < ring_size)
            mask = jnp.logical_and(valid, p < khi)
        else:
            p = col
            mask = col < khi
        if window is not None:
            qpos = qpos_ref[0]                        # [R, 1]
            vis = p >= qpos - window
            if anchors > 0:
                vis = jnp.logical_or(vis, p < anchors)
            mask = jnp.logical_and(mask, vis)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:]                             # [R, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)               # [R, 1]
        l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        vr = v_ref[0, 0, 0] if stacked else v_ref[0, 0]
        pv_in = (p * (vs_ref[0, 0, 0] if stacked else vs_ref[0, 0])
                 if quant else p)                     # [1, chunk] V scales
        if precision == "bf16_pinned":
            pv = jax.lax.dot_general(pv_in.astype(jnp.bfloat16),
                                     vr.astype(jnp.bfloat16),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot_general(pv_in, vr.astype(jnp.float32),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)  # [R, D]
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new
        l_scr[:] = l_new

    @pl.when(c == pl.num_programs(2) - 1)
    def _():
        l = l_scr[:]
        valid = l > 0.0
        o = acc_scr[:] / jnp.where(valid, l, 1.0)
        o_ref[0, 0] = jnp.where(valid, o, 0.0)
        m_safe = jnp.where(m_scr[:] > NEG_INF / 2, m_scr[:], 0.0)
        lse = jnp.where(valid, m_safe + jnp.log(jnp.where(valid, l, 1.0)),
                        -jnp.inf)
        lse_ref[0, 0] = lse


def _kv_index_map(i, j, c, nu, *, a_chunks=1, stacked=False):
    """KV block fetch index: skipped grid steps re-point at an already-
    fetched block so Pallas copies nothing for them — chunks past n_used
    (nu[0]) clamp to the last useful chunk; with a window, dead chunks
    below c_lo (nu[1], except the `a_chunks` anchor-sink chunks) point at
    the window-start chunk. `stacked`: the cache keeps its [L, ...] layer
    dim and nu[2] picks the layer — the caller never materializes a
    per-layer slice (an O(context) copy per layer per decode step)."""
    cc = jnp.where(c < nu[1], jnp.where(c < a_chunks, c, nu[1]), c)
    cc = jnp.minimum(cc, nu[0] - 1)
    return (nu[2], i, j, cc, 0) if stacked else (i, j, cc, 0)


def _scale_index_map(i, j, c, nu, *, a_chunks=1, stacked=False):
    """Same clamping for the lane-major [B, Hkv, 1, S] scale blocks."""
    cc = jnp.where(c < nu[1], jnp.where(c < a_chunks, c, nu[1]), c)
    cc = jnp.minimum(cc, nu[0] - 1)
    return (nu[2], i, j, 0, cc) if stacked else (i, j, 0, cc)


@functools.partial(jax.jit, static_argnames=("window", "anchors", "chunk",
                                             "interpret", "ring",
                                             "precision"))
def flash_decode(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                 k_hi: jnp.ndarray, q_pos: Optional[jnp.ndarray] = None,
                 window: Optional[int] = None, anchors: int = 0,
                 chunk: int = 2048, interpret: Optional[bool] = None,
                 ring: bool = False, d_len: Optional[jnp.ndarray] = None,
                 layer: Optional[jnp.ndarray] = None,
                 precision=jax.lax.Precision.HIGHEST):
    """Flash attention of T new queries over a KV cache.

    q: [B, T, H, D]; caches: [B, Hkv, S, D]; k_hi: [B] or [B, T] exclusive
    per-query bound; q_pos: [B, T] absolute positions (required iff window).
    Returns (o fp32 [B, T, H, D], lse fp32 [B, T, H]). Matches the dense
    oracle `ops.attention.attend_masked` / `sliced_prefix_attention` exactly
    (tests/test_pallas.py).

    `ring=True`: the cache is an O(window) RING (ops/ring_cache.py) whose
    physical row r holds recovered position p(r, d_len) — masks compare
    POSITIONS (k_hi/window/sinks all positional); `d_len` [B] is the
    written-position count. Matches ring_chunked_prefix_attention
    (tests/test_target_ring.py). `anchors` is the ring's pinned sink-row
    count (must be set when ring=True and the cache has sinks).

    `layer` (traced int32 scalar): STACKED mode — the caches keep their
    [L, B, Hkv, S, D] layer dim and the kernel streams layer `layer` via
    the BlockSpec index map. This is the decode fast path: a dynamic-slice
    feeding a pallas_call must materialize the whole [B, Hkv, S, D] layer
    slice (~134MB at 32k), and doing that per layer per step was measured
    as ~2/3 of the 32k vanilla step time (profile_vanilla_r3e.log: ms/tok
    scaled with s_max although the kernel clamps to n_used chunks).
    Requires S % chunk == 0 (allocate caches chunk-aligned) so no O(S)
    pad copy is needed either.
    """
    from .quantkv import QuantKV
    quant = isinstance(k_cache, QuantKV)
    stacked = layer is not None
    b, t, h, d = q.shape
    hkv = (k_cache.qv if quant else k_cache).shape[1 + stacked]
    g = h // hkv

    # The kernel keeps all R = G*T query rows resident in VMEM (q block +
    # f32 acc scratch + f32 o block ~ R*D*10 bytes). Decode/verify calls
    # (T <= ~85) fit easily; segmented prefill calls (T = 8192 -> R = 32k)
    # blow the ~16MB VMEM budget. Split oversize query batches along T and
    # lax.map the kernel over the slices — queries are independent given
    # their per-row k_hi/q_pos, so this is exact, and HBM KV traffic is the
    # same as a q-blocked grid dimension would cost.
    if t * g > R_MAX and t > 1:
        tc = max(1, R_MAX // g)
        n_t = -(-t // tc)
        t_pad = n_t * tc
        if k_hi.ndim == 1:
            k_hi = jnp.broadcast_to(k_hi[:, None], (b, t))
        if q_pos is None:
            q_pos = jnp.zeros((b, t), jnp.int32)
        if t_pad != t:
            q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
            k_hi = jnp.pad(k_hi, ((0, 0), (0, t_pad - t)))  # k_hi=0: masked
            q_pos = jnp.pad(q_pos, ((0, 0), (0, t_pad - t)))
        qs = jnp.moveaxis(q.reshape(b, n_t, tc, h, d), 1, 0)
        ks = jnp.moveaxis(k_hi.reshape(b, n_t, tc), 1, 0)
        ps = jnp.moveaxis(q_pos.reshape(b, n_t, tc), 1, 0)
        o, lse = jax.lax.map(
            lambda args: flash_decode(args[0], k_cache, v_cache, args[1],
                                      args[2], window, anchors, chunk,
                                      interpret, ring=ring, d_len=d_len,
                                      layer=layer, precision=precision),
            (qs, ks, ps))
        o = jnp.moveaxis(o, 0, 1).reshape(b, t_pad, h, d)[:, :t]
        lse = jnp.moveaxis(lse, 0, 1).reshape(b, t_pad, h)[:, :t]
        return o, lse

    if quant:
        if stacked:                      # [L, B, Hkv, 1, S] lane-major
            k_scale = k_cache.scale[:, :, :, None, :]
            v_scale = v_cache.scale[:, :, :, None, :]
        else:                            # [B, Hkv, 1, S] lane-major
            k_scale = k_cache.scale[:, :, None, :]
            v_scale = v_cache.scale[:, :, None, :]
        k_cache, v_cache = k_cache.qv, v_cache.qv
    s = k_cache.shape[2 + stacked]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if k_hi.ndim == 1:
        k_hi = jnp.broadcast_to(k_hi[:, None], (b, t))
    if q_pos is None:
        q_pos = jnp.zeros((b, t), jnp.int32)

    # group queries by kv head: [B, Hkv, G*T, D]
    qg = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, t, d).reshape(b, hkv, g * t, d)
    r = g * t
    r_pad = max(8, -(-r // 8) * 8)
    if r_pad != r:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
    # per-row bounds: row = i*T + t -> bound k_hi[b, t]
    khi_rows = jnp.tile(k_hi, (1, g))                        # [B, G*T]
    qpos_rows = jnp.tile(q_pos, (1, g))
    if r_pad != r:
        khi_rows = jnp.pad(khi_rows, ((0, 0), (0, r_pad - r)))
        qpos_rows = jnp.pad(qpos_rows, ((0, 0), (0, r_pad - r)))
    khi_rows = khi_rows[..., None].astype(jnp.int32)         # [B, R, 1]
    qpos_rows = qpos_rows[..., None].astype(jnp.int32)

    n_chunks = -(-s // chunk)
    s_pad = n_chunks * chunk
    if s_pad != s:
        if stacked:
            # padding here would copy the WHOLE multi-layer cache every
            # step — the exact O(context) cost stacked mode exists to kill
            raise ValueError(
                f"stacked flash_decode needs a chunk-aligned cache "
                f"(S={s}, chunk={chunk}); allocate s_max rounded up")
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        if quant:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, 0), (0, s_pad - s)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, 0), (0, s_pad - s)))

    # chunks actually needed (max over batch of max k_hi); scalar prefetch
    # layout: [n_used, c_lo, layer, d_len(b)... (ring only)]
    layer_s = (jnp.int32(0) if layer is None
               else jnp.asarray(layer, jnp.int32).reshape(()))
    if ring:
        # physical rows are position-scattered: every ring chunk is needed
        n_used = jnp.int32(n_chunks)
        c_lo = jnp.int32(0)
        if d_len is None:
            raise ValueError("flash_decode(ring=True) requires d_len [B]")
        n_used_arr = jnp.concatenate([jnp.stack([n_used, c_lo, layer_s]),
                                      d_len.astype(jnp.int32)])
    else:
        max_hi = jnp.max(k_hi)
        n_used = jnp.clip((max_hi + chunk - 1) // chunk, 1,
                          n_chunks).astype(jnp.int32)
        # with a window, chunks wholly below EVERY query's window start
        # carry no visible keys (except anchor sinks, which live in chunk
        # 0): at 32k context with a 12k window this skips ~60% of the HBM
        # read per step
        if window is not None:
            lo_col = jnp.maximum(jnp.min(q_pos) - window, 0)
            c_lo = (lo_col // chunk).astype(jnp.int32)
        else:
            c_lo = jnp.int32(0)
        n_used_arr = jnp.stack([n_used, c_lo, layer_s])

    kernel = functools.partial(_decode_kernel, scale=d ** -0.5, chunk=chunk,
                               window=window, anchors=anchors, t=t, g=g,
                               quant=quant, ring=s if ring else None,
                               stacked=stacked, precision=precision)

    a_chunks = -(-anchors // chunk) if anchors > 0 else 0
    kv_map = functools.partial(_kv_index_map, a_chunks=a_chunks,
                               stacked=stacked)
    sc_map = functools.partial(_scale_index_map, a_chunks=a_chunks,
                               stacked=stacked)
    vm = pltpu.VMEM
    kv_block = (1, 1, 1, chunk, d) if stacked else (1, 1, chunk, d)
    sc_block = (1, 1, 1, 1, chunk) if stacked else (1, 1, 1, chunk)
    in_specs = [
        pl.BlockSpec((1, r_pad, 1), lambda i, j, c, nu: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, r_pad, 1), lambda i, j, c, nu: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, 1, r_pad, d), lambda i, j, c, nu: (i, j, 0, 0),
                     memory_space=vm),
        pl.BlockSpec(kv_block, kv_map, memory_space=vm),
        pl.BlockSpec(kv_block, kv_map, memory_space=vm),
    ]
    inputs = [n_used_arr, khi_rows, qpos_rows, qg, k_cache, v_cache]
    if quant:
        in_specs += [
            pl.BlockSpec(sc_block, sc_map, memory_space=vm),
            pl.BlockSpec(sc_block, sc_map, memory_space=vm),
        ]
        inputs += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, hkv, n_chunks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, r_pad, d), lambda i, j, c, nu: (i, j, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, r_pad, 1), lambda i, j, c, nu: (i, j, 0, 0),
                         memory_space=vm),
        ],
        scratch_shapes=[
            pltpu.VMEM((r_pad, 1), jnp.float32),
            pltpu.VMEM((r_pad, 1), jnp.float32),
            pltpu.VMEM((r_pad, d), jnp.float32),
        ],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, r_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, r_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    o = o[:, :, :r].reshape(b, hkv, g, t, d).transpose(0, 3, 1, 2, 4)
    o = o.reshape(b, t, h, d)
    lse = lse[:, :, :r, 0].reshape(b, hkv, g, t).transpose(0, 3, 1, 2).reshape(b, t, h)
    return o, lse
