"""Pallas TPU PAGED flash-decode kernel.

The serving-scale counterpart of `ops.pallas_decode.flash_decode`: the KV
cache lives in a shared PAGE POOL instead of one contiguous [B, Hkv, S, D]
buffer per sequence, and each sequence addresses its pages through a page
table. Memory for many concurrent long-context sequences is then bounded by
*used* tokens (rounded up to a page), not by `n_slots x s_max` — the missing
piece the reference has no equivalent of (its CLIs decode one fixed batch,
`longspec/test/inference_long-bench.py:228-247`; no serving layer at all).

TPU-native design: the page indirection costs nothing inside the kernel —
the page table rides the scalar-prefetch channel
(`pltpu.PrefetchScalarGridSpec`), so the BlockSpec index map resolves
logical chunk c of batch row b to physical page `pt[b, c]` BEFORE the DMA is
issued. The kernel body is the same online-softmax loop as `flash_decode`
(per-query k_hi bound, optional sliding window + anchor sinks, fp32 LSE
output for hybrid-attention merging); pages beyond a sequence's length are
predicated off and their DMA is avoided by clamping the index map to the
row's last used page.

Pool layout: [n_pages, Hkv, page, D] per layer — the page is the second-
minor axis so one (page, D) tile per kv-head is a contiguous DMA, exactly
like the dense cache's head-major layout (`models/llama.py:alloc_kv_cache`).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


class PagedAttn(str):
    """`attn_impl` marker for paged-KV decode (mirrors `parallel.ring.SPAttn`).

    Behaves as the string ``"paged"`` through every existing dispatch while
    carrying the STATIC page size. The page table is dynamic per-batch state
    (`engine.DecodeState.tables`) and flows as a traced argument — never
    inside this marker, which jit treats as a compile-time constant.

    Paged mode covers the DECODE path (forward_append / glide_forward over
    pooled target KV). Prefill runs on a dense batch-1 state and is
    scattered into the pool at admission (`serve.SpecServer(kv="paged")`),
    so prefill dispatch maps "paged" -> "chunked".
    """
    def __new__(cls, page: int):
        self = super().__new__(cls, "paged")
        self.page = int(page)
        return self


def _paged_kernel(npage_ref, pt_ref, khi_ref, qpos_ref, q_ref, k_ref, v_ref,
                  *rest, scale, page, window, anchors, quant=False,
                  precision=None):
    if quant:
        # int8 pools + per-row scales (ops.quantkv), lane-major [1, page]
        # scale tiles applied to the score/probability matrices (see
        # pallas_decode._decode_kernel)
        (ks_ref, vs_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest
    else:
        ks_ref = vs_ref = None
        (o_ref, lse_ref, m_scr, l_scr, acc_scr) = rest
    b = pl.program_id(0)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    n_used = npage_ref[b]

    @pl.when(c < n_used)
    def _():
        # decode/verify matmul-precision law — same options as
        # ops/pallas_decode._decode_kernel: "bf16_pinned" (explicit bf16
        # operands, one MXU pass, deterministic) or a lax.Precision
        # (HIGHEST = exact f32; DEFAULT would let the compiler truncate
        # per-fusion — the drift that flipped a 0.004-margin greedy tie,
        # bitdiff_hard8k_r4.log).
        if precision == "bf16_pinned":
            qb = q_ref[0, 0].astype(jnp.bfloat16)    # [R, D]
            s = jax.lax.dot_general(qb, k_ref[0, 0].astype(jnp.bfloat16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale                             # [R, page]
        else:
            q = q_ref[0, 0].astype(jnp.float32)      # [R, D]
            s = jax.lax.dot_general(q * scale,
                                    k_ref[0, 0].astype(jnp.float32),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=precision)  # [R, page]
        if quant:
            s = s * ks_ref[0, 0]                     # [1, page] K scales
        # logical position of column j in this page: c*page + j (the page
        # table maps logical chunks to physical pages; logical order is
        # contiguous per sequence)
        col = c * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        khi = khi_ref[0]                              # [R, 1]
        mask = col < khi
        if window is not None:
            qpos = qpos_ref[0]                        # [R, 1]
            vis = col >= qpos - window
            if anchors > 0:
                vis = jnp.logical_or(vis, col < anchors)
            mask = jnp.logical_and(mask, vis)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv_in = p * vs_ref[0, 0] if quant else p      # [1, page] V scales
        if precision == "bf16_pinned":
            pv = jax.lax.dot_general(pv_in.astype(jnp.bfloat16),
                                     v_ref[0, 0].astype(jnp.bfloat16),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot_general(pv_in, v_ref[0, 0].astype(jnp.float32),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)
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
        lse_ref[0, 0] = jnp.where(valid,
                                  m_safe + jnp.log(jnp.where(valid, l, 1.0)),
                                  -jnp.inf)


@functools.partial(jax.jit, static_argnames=("window", "anchors", "interpret",
                                             "precision"))
def paged_flash_decode(q: jnp.ndarray, k_pool: jnp.ndarray,
                       v_pool: jnp.ndarray, page_table: jnp.ndarray,
                       k_hi: jnp.ndarray, q_pos: Optional[jnp.ndarray] = None,
                       window: Optional[int] = None, anchors: int = 0,
                       interpret: Optional[bool] = None,
                       precision=jax.lax.Precision.HIGHEST):
    """Flash attention of T new queries over PAGED KV.

    q: [B, T, H, D]; pools: [n_pages, Hkv, page, D]; page_table:
    [B, n_chunks] int32 physical page ids (logical chunk order); k_hi: [B] or
    [B, T] exclusive per-query logical bound; q_pos: [B, T] (iff window).
    Returns (o fp32 [B, T, H, D], lse fp32 [B, T, H]) — same contract as
    `flash_decode` on the equivalent contiguous cache (tests/test_paged.py).
    """
    from .quantkv import QuantKV
    quant = isinstance(k_pool, QuantKV)
    if quant:
        k_scale = k_pool.scale[:, :, None, :]   # [n_pages, Hkv, 1, page]
        v_scale = v_pool.scale[:, :, None, :]
        k_pool, v_pool = k_pool.qv, v_pool.qv
    b, t, h, d = q.shape
    n_pages, hkv, page, _ = k_pool.shape
    n_chunks = page_table.shape[1]
    g = h // hkv
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if k_hi.ndim == 1:
        k_hi = jnp.broadcast_to(k_hi[:, None], (b, t))
    if q_pos is None:
        q_pos = jnp.zeros((b, t), jnp.int32)

    qg = q.transpose(0, 2, 1, 3).reshape(b, hkv, g, t, d).reshape(b, hkv, g * t, d)
    r = g * t
    r_pad = max(8, -(-r // 8) * 8)
    if r_pad != r:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
    khi_rows = jnp.tile(k_hi, (1, g))
    qpos_rows = jnp.tile(q_pos, (1, g))
    if r_pad != r:
        khi_rows = jnp.pad(khi_rows, ((0, 0), (0, r_pad - r)))
        qpos_rows = jnp.pad(qpos_rows, ((0, 0), (0, r_pad - r)))
    khi_rows = khi_rows[..., None].astype(jnp.int32)
    qpos_rows = qpos_rows[..., None].astype(jnp.int32)

    # pages used per row; skipped iterations clamp to the last used page so
    # Pallas re-reads an already-resident block instead of issuing a new DMA
    rows_hi = jnp.max(k_hi, axis=1)                       # [B]
    n_used = jnp.clip((rows_hi + page - 1) // page, 1, n_chunks).astype(jnp.int32)
    pt = page_table.astype(jnp.int32)
    safe_idx = jnp.minimum(jnp.arange(n_chunks)[None, :], n_used[:, None] - 1)
    pt_safe = jnp.take_along_axis(pt, safe_idx, axis=1)   # [B, n_chunks]

    kernel = functools.partial(_paged_kernel, scale=d ** -0.5, page=page,
                               window=window, anchors=anchors, quant=quant,
                               precision=precision)
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, r_pad, 1), lambda i, j, c, nu, pt_: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, r_pad, 1), lambda i, j, c, nu, pt_: (i, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, 1, r_pad, d),
                     lambda i, j, c, nu, pt_: (i, j, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, 1, page, d),
                     lambda i, j, c, nu, pt_: (pt_[i, c], j, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, 1, page, d),
                     lambda i, j, c, nu, pt_: (pt_[i, c], j, 0, 0),
                     memory_space=vm),
    ]
    inputs = [n_used, pt_safe, khi_rows, qpos_rows, qg, k_pool, v_pool]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, 1, page),
                         lambda i, j, c, nu, pt_: (pt_[i, c], j, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, 1, page),
                         lambda i, j, c, nu, pt_: (pt_[i, c], j, 0, 0),
                         memory_space=vm),
        ]
        inputs += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # (n_used, page_table)
        grid=(b, hkv, n_chunks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, r_pad, d),
                         lambda i, j, c, nu, pt_: (i, j, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 1, r_pad, 1),
                         lambda i, j, c, nu, pt_: (i, j, 0, 0),
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
    lse = lse[:, :, :r, 0].reshape(b, hkv, g, t).transpose(0, 3, 1, 2)
    return o, lse.reshape(b, t, h)


@jax.jit
def write_paged_rows(k_pool, new: jnp.ndarray,
                     page_table: jnp.ndarray, starts: jnp.ndarray):
    """Scatter new[b] (T rows) into the pool at logical offsets starts[b]...

    pool: [n_pages, Hkv, page, D] (or a `QuantKV` — rows are quantized on
    write, ops/quantkv.py rule 1); new: [B, T, Hkv, D] (or a `QuantKV` of
    already-quantized rows, scattered verbatim — bit-exact by construction,
    no dequant->requant round-trip); page_table: [B, n_chunks]; starts: [B].
    Returns the updated pool (alias/donate the input under jit for an
    in-place write). Functional counterpart of `models/llama.write_cache_rows`
    for paged layouts.
    """
    from .quantkv import QuantKV, quantize
    qpool = isinstance(k_pool, QuantKV)
    qnew = isinstance(new, QuantKV)
    if qnew and not qpool:
        raise TypeError("quantized rows into an unquantized pool")
    n_pages, hkv, page, d = k_pool.shape
    b, t = new.shape[:2]
    pos = starts[:, None] + jnp.arange(t)[None, :]          # [B, T] logical
    pidx = pos // page
    off = pos % page
    phys = jnp.take_along_axis(page_table, pidx, axis=1)    # [B, T]
    # scatter [B*T] rows: index (phys, :, off, :)
    phys_f = phys.reshape(-1)
    off_f = off.reshape(-1)
    if qpool:
        q8, sc = (new.qv, new.scale) if qnew else quantize(new)
        return QuantKV(
            k_pool.qv.at[phys_f, :, off_f, :].set(q8.reshape(b * t, hkv, d)),
            k_pool.scale.at[phys_f, :, off_f].set(sc.reshape(b * t, hkv)))
    rows = new.reshape(b * t, hkv, d)
    return k_pool.at[phys_f, :, off_f, :].set(rows.astype(k_pool.dtype))
