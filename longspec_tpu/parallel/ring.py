"""Sequence-parallel (SP) long-context attention: ring prefill + SP decode.

The reference has no sequence-parallel story at all — its context ceiling is
one GPU's HBM (SURVEY §5 "Long-context SP: absent"). On TPU the natural
scale-out for 262k-class contexts is to shard the SEQUENCE over a mesh axis
and let the KV cache live distributed:

* `ring_flash_prefill` — causal (window/anchor-aware) flash attention with
  queries AND keys/values sequence-sharded over `sp`. KV blocks rotate
  around the ring via `ppermute` (one hop per device) while each device
  updates its queries' online-softmax state against the resident block —
  the TPU-native form of RingAttention: ICI wire time hides behind the MXU
  attention math of the co-scheduled block, and no device ever materializes
  more than S/n of the KV.

* `sp_flash_decode` — decode/verify attention over a sequence-sharded KV
  cache: each shard attends its cache slice (clamped per-query bounds),
  then the exact global softmax is reconstructed from per-shard (o, lse)
  partials with two tiny collectives (pmax + psum). This is the multi-chip
  form of the hybrid prefix+suffix LSE merge already used on one chip
  (`ops/attention.py:69-81`), so tree verification over a distributed cache
  stays EXACT, not approximate.

Both run under `shard_map` over any mesh with an `sp` axis and compose with
the (dp, tp) shardings in `parallel/shardings.py`.

`SPAttn` + `sp_write_cache_rows` wire these primitives into the engine as a
first-class `attn_impl`: construct `SpecEngine(..., EngineConfig(
attn_impl="sp"), mesh=make_mesh(sp=n))` and the whole decode loop — target
prefill, hybrid append/verify attention, draft SA/CA, KV writes — runs over
a sequence-sharded cache (see `tests/test_sp.py`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import attention as att


class SPAttn(str):
    """`attn_impl` marker for sequence-parallel attention.

    Behaves as the string ``"sp"`` through every existing dispatch
    (``attn_impl == "sp"`` comparisons, error messages, cache keys) while
    carrying the mesh + axis name the shard_map'd SP attention needs — so the
    SP path threads through `models.llama` / `models.glide` without changing
    any signature. Never traced: attn_impl is always a static Python value.
    """

    def __new__(cls, mesh: Mesh, axis_name: str = "sp"):
        self = super().__new__(cls, "sp")
        self.mesh = mesh
        self.axis = axis_name
        return self


def sp_write_cache_rows(mesh: Mesh, cache, new: jnp.ndarray,
                        starts: jnp.ndarray, axis_name: str = "sp"):
    """Write T new rows per batch at dynamic offsets into a SEQUENCE-SHARDED
    KV cache — the SP form of `models.llama.write_cache_rows`.

    cache: [B, Hkv, S, D] (or [L, B, Hkv, S, D]) sharded on S over
    `axis_name` — or a `QuantKV` of the same geometry (int8 rows + per-row
    scales [.., Hkv, S], both sequence-sharded; rows are quantized on write,
    ops/quantkv.py rule 1); new: [B, T, Hkv, D] (resp. [L, B, T, Hkv, D])
    replicated; starts: [B]. Each shard scatters only the rows that land in
    its slice (out-of-slice indices drop), so the write is local — no
    collective, no gather of the cache.
    """
    from ..ops.quantkv import QuantKV, quantize
    quant = isinstance(cache, QuantKV)
    rank5 = (cache.qv if quant else cache).ndim == 5
    t = new.shape[2 if rank5 else 1]

    def local_idx(s_loc, starts):
        off = jax.lax.axis_index(axis_name) * s_loc
        li = starts[:, None] + jnp.arange(t)[None, :] - off       # [B, T]
        # negative local indices would wrap; remap to an always-OOB positive
        return jnp.where(li < 0, s_loc, li)

    def scatter(c_loc, nt, li):
        # nt rows laid out [.., Hkv, T, ...] matching c_loc [.., Hkv, s_loc, ...]
        def one(c_b, n_b, li_b):
            return c_b.at[(slice(None), li_b) + (slice(None),) * (c_b.ndim - 2)
                          ].set(n_b.astype(c_b.dtype), mode="drop")

        if rank5:   # leading layer axis, then batch
            return jax.vmap(jax.vmap(one), in_axes=(0, 0, None))(c_loc, nt, li)
        return jax.vmap(one)(c_loc, nt, li)

    if quant:
        def f(qv_loc, sc_loc, new, starts):
            li = local_idx(qv_loc.shape[-2], starts)
            q8, sc = quantize(new)                    # [.., T, Hkv, D] / [.., T, Hkv]
            q8t = jnp.swapaxes(q8, -3, -2)            # [.., Hkv, T, D]
            sct = jnp.swapaxes(sc, -1, -2)            # [.., Hkv, T]
            return scatter(qv_loc, q8t, li), scatter(sc_loc, sct, li)

        qv_spec = (P(None, None, None, axis_name, None) if rank5
                   else P(None, None, axis_name, None))
        sc_spec = (P(None, None, None, axis_name) if rank5
                   else P(None, None, axis_name))
        qv, sc = shard_map(
            f, mesh=mesh,
            in_specs=(qv_spec, sc_spec, P(None), P(None)),
            out_specs=(qv_spec, sc_spec),
            check_vma=False,
        )(cache.qv, cache.scale, new, starts)
        return QuantKV(qv, sc)

    def f(c_loc, new, starts):
        li = local_idx(c_loc.shape[-2], starts)
        nt = jnp.swapaxes(new, -3, -2)                # [.., Hkv, T, D]
        return scatter(c_loc, nt, li)

    seq_spec = (P(None, None, None, axis_name, None) if rank5
                else P(None, None, axis_name, None))
    return shard_map(
        f, mesh=mesh,
        in_specs=(seq_spec, P(None), P(None)),
        out_specs=seq_spec,
        check_vma=False,
    )(cache, new, starts)


def _block_update(carry, qf, kch, vch, k_offset, q_pos, k_hi, window, anchors,
                  precision=None):
    """One online-softmax update of queries against a KV block at global
    sequence offset `k_offset`. qf: [B,Hkv,G,Tq,D] pre-scaled fp32;
    kch/vch: [B,Hkv,Tk,D]; q_pos/k_hi: [B,Tq] global positions / exclusive
    visibility bounds. Returns the updated (m, l, acc) carry.

    `precision`: QK/PV matmul precision — HIGHEST on the decode/verify path
    (sp_flash_decode; the TPU default truncates fp32 operands to bf16, the
    exact drift that flipped greedy ties on the dense arms — see
    ops/pallas_decode._decode_kernel), default (fast) for the ring prefill,
    which is computed once and shared by both arms."""
    m_run, l_run, acc = carry
    tk = kch.shape[2]
    kj = k_offset + jnp.arange(tk)                      # global key positions
    mask = kj[None, None, :] < k_hi[:, :, None]         # [B, Tq, Tk]
    if window is not None:
        vis = kj[None, None, :] >= q_pos[:, :, None] - window
        if anchors > 0:
            vis = vis | (kj[None, None, :] < anchors)
        mask = mask & vis
    mask = mask[:, None, None]                          # [B, 1, 1, Tq, Tk]
    if precision == "bf16_pinned":
        # pinned-cast bf16 operand law (ops/attention.attend_masked): qf is
        # PRE-SCALED fp32; round it once — the scale multiplication is the
        # same deterministic fp32 op in every program
        qb = jax.lax.optimization_barrier(qf.astype(jnp.bfloat16))
        kb = jax.lax.optimization_barrier(kch.astype(jnp.bfloat16))
        sco = jnp.einsum("bhgqd,bhkd->bhgqk", qb, kb,
                         preferred_element_type=jnp.float32)
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
    return m_new, l_new, acc_new


def _finish(m_f, l_f, acc_f, b, h, tq, d):
    valid = l_f > 0
    o = jnp.where(valid[..., None],
                  acc_f / jnp.maximum(l_f, 1e-30)[..., None], 0.0)
    lse = jnp.where(valid, jnp.where(m_f > att.NEG_INF / 2, m_f, 0.0)
                    + jnp.log(jnp.maximum(l_f, 1e-30)), -jnp.inf)
    o = o.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    lse = lse.reshape(b, h, tq).transpose(0, 2, 1)
    return o, lse


def ring_flash_prefill(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray,
                       v: jnp.ndarray, lengths: jnp.ndarray,
                       window: Optional[int] = None, anchors: int = 0,
                       axis_name: str = "sp"):
    """Causal flash prefill with Q and KV sharded over the sequence axis.

    q: [B, S, H, D] sharded P(None, sp); k, v: [B, S, Hkv, D] same sharding;
    lengths: [B] replicated. Returns (o [B,S,H,D] seq-sharded fp32,
    lse [B,S,H] fp32). Equals `causal_self_attention` over the first
    `lengths[b]` tokens; queries beyond lengths get o=0.

    Ring schedule: device i starts with its own KV block and, at hop j,
    receives the block that originated at shard (i - j) mod n. The ppermute
    send of hop j+1 has no data dependence on hop j's attention math, so
    XLA overlaps wire and compute (same legality argument as
    `overlap.ring_allgather_overlap`).
    """
    n = mesh.shape[axis_name]

    def f(q_loc, k_loc, v_loc, lengths):
        b, s_loc, h, d = q_loc.shape
        hkv = k_loc.shape[2]
        groups = h // hkv
        shard = jax.lax.axis_index(axis_name)
        q_pos = (shard * s_loc + jnp.arange(s_loc))[None, :]
        q_pos = jnp.broadcast_to(q_pos, (b, s_loc))
        # causal bound: query at global position p sees keys [0, p+1),
        # clamped by the row's true length
        k_hi = jnp.minimum(q_pos + 1, lengths[:, None]).astype(jnp.int32)
        qf = (q_loc.astype(jnp.float32) * (d ** -0.5)).transpose(0, 2, 1, 3)
        qf = qf.reshape(b, hkv, groups, s_loc, d)
        kc = k_loc.transpose(0, 2, 1, 3)                # [B, Hkv, S_loc, D]
        vc = v_loc.transpose(0, 2, 1, 3)

        m = jnp.full((b, hkv, groups, s_loc), att.NEG_INF, jnp.float32)
        l = jnp.zeros((b, hkv, groups, s_loc), jnp.float32)
        acc = jnp.zeros((b, hkv, groups, s_loc, d), jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]
        cur_k, cur_v = kc, vc
        for j in range(n):
            origin = (shard - j) % n                    # block's home shard
            m, l, acc = _block_update((m, l, acc), qf, cur_k, cur_v,
                                      origin * s_loc, q_pos, k_hi,
                                      window, anchors)
            if j < n - 1:
                cur_k = jax.lax.ppermute(cur_k, axis_name, perm)
                cur_v = jax.lax.ppermute(cur_v, axis_name, perm)
        return _finish(m, l, acc, b, h, s_loc, d)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name),
                  P(None, axis_name), P(None)),
        out_specs=(P(None, axis_name), P(None, axis_name)),
        check_vma=False,
    )(q, k, v, lengths)


def sp_flash_decode(mesh: Mesh, q: jnp.ndarray, k_cache, v_cache,
                    k_hi: jnp.ndarray,
                    q_pos: jnp.ndarray, window: Optional[int] = None,
                    anchors: int = 0, axis_name: str = "sp",
                    precision=jax.lax.Precision.HIGHEST):
    """Decode/verify attention over a SEQUENCE-SHARDED KV cache, exact.

    q: [B, Tq, H, D] replicated; k_cache/v_cache: [B, Hkv, S, D] sharded
    P(None, None, sp) — or `QuantKV`s of that geometry (int8 rows + scales
    [B, Hkv, S], both sequence-sharded; each shard dequantizes only its own
    slice, so the HBM read stays halved); k_hi: [B] or [B, Tq] global
    exclusive bounds; q_pos: [B, Tq] global query positions (for the
    sliding window). Returns (o [B,Tq,H,D] fp32, lse [B,Tq,H] fp32) —
    identical to `sliced_prefix_attention` over the unsharded cache.

    Each shard computes its slice's (o_i, lse_i); the global softmax is
    o = sum_i o_i * exp(lse_i - LSE) with LSE = logsumexp_i lse_i,
    reconstructed with one pmax + two psums of [B,Tq,H](+D) partials —
    the same exact-merge law as the single-chip prefix+suffix combiner
    (`ops/attention.py:69-81`), applied across the ICI.
    """
    from ..ops.quantkv import QuantKV, dequant
    quant = isinstance(k_cache, QuantKV)
    b, tq, h, d = q.shape
    if k_hi.ndim == 1:
        k_hi = jnp.broadcast_to(k_hi[:, None], (b, tq))

    def f(q, k_loc, v_loc, k_hi, q_pos):
        if quant:
            k_loc, v_loc = dequant(k_loc), dequant(v_loc)
        hkv, s_loc = k_loc.shape[1], k_loc.shape[2]
        groups = h // hkv
        shard = jax.lax.axis_index(axis_name)
        start = shard * s_loc
        qf = (q.astype(jnp.float32) * (d ** -0.5)).transpose(0, 2, 1, 3)
        qf = qf.reshape(b, hkv, groups, tq, d)
        m0 = jnp.full((b, hkv, groups, tq), att.NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, hkv, groups, tq), jnp.float32)
        a0 = jnp.zeros((b, hkv, groups, tq, d), jnp.float32)
        m_f, l_f, acc_f = _block_update(
            (m0, l0, a0), qf, k_loc, v_loc, start, q_pos, k_hi,
            window, anchors, precision=precision)
        # exact cross-shard merge; all in the pre-normalized (m, l, acc)
        # domain so empty shards (l=0, m=NEG_INF) contribute nothing.
        # stop_gradient: m is a log-sum-exp stabilization constant whose
        # gradient cancels identically, and pmax has no VJP rule — this is
        # what makes the SP decode path differentiable (SP draft TRAINING
        # backprops through it via the teacher-KV cross-attention).
        m_glob = jax.lax.pmax(jax.lax.stop_gradient(m_f), axis_name)
        m_safe = jnp.maximum(m_glob, att.NEG_INF)       # all-empty guard
        w = jnp.exp(m_f - m_safe)                       # 0 for empty shards
        l_glob = jax.lax.psum(l_f * w, axis_name)
        acc_glob = jax.lax.psum(acc_f * w[..., None], axis_name)
        return _finish(m_glob, l_glob, acc_glob, b, h, tq, d)

    kv_spec = P(None, None, axis_name)
    if quant:
        # QuantKV-of-specs: int8 rows and [B, Hkv, S] scales both shard on S
        kv_spec = QuantKV(P(None, None, axis_name), P(None, None, axis_name))
    return shard_map(
        f, mesh=mesh,
        in_specs=(P(None), kv_spec, kv_spec, P(None), P(None)),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )(q, k_cache, v_cache, k_hi, q_pos)
