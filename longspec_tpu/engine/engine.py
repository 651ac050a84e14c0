"""Speculative decoding engine: vanilla / chain / tree generation loops.

TPU-native re-design of the reference engines
(`longspec/test/llama_glide.py:552-1245`): every generation loop is a single
jitted `lax.while_loop` over a static-shape carry — the reference's host
Python decode loop, per-batch tree-mask loops (`llama_glide.py:1069-1084`)
and `.item()` bookkeeping all become masked vectorized ops on device.

Design deltas vs the reference (SURVEY.md §7.1):
  * Explicit functional state threaded through the loop (no module-attribute
    KV caches).
  * Tree verification feeds ONLY the token tree to the target; accepted rows
    are committed for ALL layers from the collected per-layer tree KV,
    removing the reference's "re-forward accepted tokens + move last layer
    only" workaround (`llama_glide.py:1078-1090, 1166-1173`).
  * The draft re-encodes the accepted tokens each round (as the reference's
    micro-step 0 does) with a static [B, gamma+1] buffer and per-row valid
    lengths.
  * Beam expansion does per-node top-k then top-k over candidates —
    mathematically identical to the reference's flat (nodes x vocab) top-k
    (`llama_glide.py:1064-1067`) but sharded-vocab friendly.

Metrics match the reference harness: `count` = accepted draft tokens,
`num` = target rounds x batch; mean_accept = (count+num)/num and
tok/s = (count+num)/elapsed (`inference_long-bench.py:257-260`).
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, DraftConfig, EngineConfig
from ..models import llama as M
from ..models import glide as G
from ..ops import attention as att


class DecodeState(NamedTuple):
    """Functional decode state (SURVEY.md §7.1.1).

    Paged mode (`EngineConfig.attn_impl = PagedAttn(page)`): kv_k/kv_v are
    page POOLS [L, n_pages, Hkv, page, D] shared by all rows, addressed per
    row through `tables`; dense mode leaves `tables` None.
    """
    kv_k: jnp.ndarray          # [L, B, Hkv, S, D] target KV cache (roped keys)
    kv_v: jnp.ndarray
    d_kv_k: jnp.ndarray        # [B, Hkv, Sd, D] draft self-attn KV cache
    d_kv_v: jnp.ndarray
    cache_lens: jnp.ndarray    # [B] valid target rows
    d_cache_lens: jnp.ndarray  # [B] valid draft rows
    tables: Optional[jnp.ndarray] = None  # [B, n_chunks] int32 page tables


class GenCarry(NamedTuple):
    state: DecodeState
    acc_tokens: jnp.ndarray   # [B, A] tokens awaiting draft re-encode
    acc_len: jnp.ndarray      # [B] valid count in acc_tokens (>=1)
    output_ids: jnp.ndarray   # [B, out_buf]
    out_len: jnp.ndarray      # [B] emitted count
    done: jnp.ndarray         # [B] bool
    count: jnp.ndarray        # scalar int32: accepted draft tokens
    num: jnp.ndarray          # scalar int32: target rounds x live rows
    rounds: jnp.ndarray       # scalar int32
    rng: jnp.ndarray
    out_cap: jnp.ndarray      # [B] per-row emit budget (rows go done at cap;
                              # serving sets it per request, generate() leaves
                              # it at the buffer bound so behavior is unchanged)
    temps: Optional[jnp.ndarray] = None  # [B] f32 per-row temperature (only
                              # when EngineConfig.per_row_temperature; 0 =
                              # greedy row). Traced — changing it never
                              # recompiles the round.
    # Deferred commit (see _flush_pending): last round's accepted all-layer
    # KV rows [L, B, A, Hkv, D] (raw compute dtype) + their start positions
    # [B]. None on paths whose target-cache writes already happen inside
    # forward_append before its reads (uniform_decode_shape=False chain /
    # magicdec / vanilla).
    pend_k: Optional[jnp.ndarray] = None
    pend_v: Optional[jnp.ndarray] = None
    pend_at: Optional[jnp.ndarray] = None


def _is_eos(cfg, tok):
    """Stop-token test covering multi-eos checkpoints (HF Llama-3.x instruct
    ships eos_token_id=[128001, 128009]); buffer FILLS still use the primary
    cfg.eos_token_id."""
    hit = tok == cfg.eos_token_id
    for e in cfg.extra_eos_token_ids:
        hit = hit | (tok == e)
    return hit


def _truncate_at_stop(cfg, emit, adv):
    """Cut an accepted span at its first stop token (inclusive): tokens
    verified in the same round AFTER an eos must not be emitted, counted,
    or committed to the cache. Returns (adv', has_eos). (The reference
    leaves them in the buffer and relies on eos-fill scanning,
    `llama_glide.py:767-769` — SURVEY §7.4 says make stopping explicit.)"""
    kj = jnp.arange(emit.shape[1])[None, :]
    hits = _is_eos(cfg, emit) & (kj < adv[:, None])
    has = jnp.any(hits, axis=1)
    first = jnp.argmax(hits, axis=1)
    return jnp.where(has, jnp.minimum(adv, first + 1), adv), has


def _sample(logits_f32, rng, temperature: float):
    if temperature == 0.0:
        return jnp.argmax(logits_f32, axis=-1).astype(jnp.int32)
    return jax.random.categorical(rng, logits_f32 / temperature, axis=-1).astype(jnp.int32)


def _sample_rows(logits_f32, rng, temps):
    """Per-row traced-temperature sampling: temps [B] f32, 0 = greedy.

    Both branches run (argmax + one categorical over logits already in
    registers — negligible next to the matmul that produced them) and a
    `where` picks per row, so one compiled program serves any mix of
    greedy/stochastic rows."""
    greedy = jnp.argmax(logits_f32, axis=-1).astype(jnp.int32)
    t = temps.reshape(temps.shape[0], *([1] * (logits_f32.ndim - 1)))
    stoch = jax.random.categorical(rng, logits_f32 / jnp.maximum(t, 1e-6),
                                   axis=-1).astype(jnp.int32)
    is_g = (temps <= 0.0).reshape(temps.shape[0], *([1] * (greedy.ndim - 1)))
    return jnp.where(is_g, greedy, stoch)


def _masked_row_write(buf, new, starts, done):
    """Write new[b] at buf[b, starts[b]:...] unless done[b]."""
    def one(o, t, s, d):
        upd = jax.lax.dynamic_update_slice(o, t.astype(o.dtype), (s,))
        return jnp.where(d, o, upd)
    return jax.vmap(one)(buf, new, starts, done)


def _chain_accept(spec, spec_logits, ver_logits, temperature: float, rng):
    """Shared chain/magicdec acceptance (ref llama_glide.py:715-748).

    T=0: greedy cumulative match. T>0: exact Leviathan — drafts were sampled
    from q, accept with min(1, p/q), and the first rejected position is
    resampled from the RESIDUAL norm(max(p-q, 0)) (falling back to p when the
    residual is empty), which makes the emitted law exactly p. (The reference
    resamples from p itself, which is only approximate; `engine/verify.py`
    already used residuals for the tree path.)

    Returns (emit [B, A], correct_len [B], rng).
    """
    tgt_out = jnp.argmax(ver_logits, -1).astype(jnp.int32)
    if temperature == 0.0:
        ok = (tgt_out[:, :-1] == spec[:, 1:])
        verification = jnp.cumprod(ok.astype(jnp.int32), axis=-1)
        correct_len = jnp.sum(verification, -1) + 1  # [B] in [1, A]
        return tgt_out, correct_len, rng
    q_probs = jax.nn.softmax(spec_logits[:, 1:] / temperature, -1)
    p_probs = jax.nn.softmax(ver_logits[:, :-1] / temperature, -1)
    gidx = spec[:, 1:, None]
    q_tok = jnp.take_along_axis(q_probs, gidx, -1)[..., 0]
    p_tok = jnp.take_along_axis(p_probs, gidx, -1)[..., 0]
    eps = 1e-9
    alpha = jnp.clip((p_tok + eps) / (q_tok + eps), 0.0, 1.0)
    rng, k_acc, k_res, k_b = jax.random.split(rng, 4)
    accept = jax.random.uniform(k_acc, alpha.shape) < alpha
    residual = jnp.maximum(p_probs - q_probs, 0.0)
    denom = jnp.sum(residual, -1, keepdims=True)
    residual = jnp.where(denom > 0, residual / jnp.maximum(denom, 1e-30),
                         p_probs)
    resample = jax.random.categorical(
        k_res, jnp.log(jnp.maximum(residual, 1e-30)), axis=-1).astype(jnp.int32)
    ver_tokens = jnp.where(accept, spec[:, 1:], resample)
    # final bonus: target sample at the last position
    last = _sample(ver_logits[:, -1], k_b, temperature)
    emit = jnp.concatenate([ver_tokens, last[:, None]], axis=1)
    verification = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    correct_len = jnp.sum(verification, -1) + 1
    return emit, correct_len, rng


def _chain_accept_rows(spec, spec_logits, ver_logits, temps, rng):
    """Per-row traced-temperature chain acceptance (see `_chain_accept` for
    the two laws): the greedy cumulative match and the Leviathan residual
    test both run on the SHARED verify logits, and a per-row `where` picks
    the law each row asked for. temps [B] f32, 0 = greedy row."""
    tgt_out = jnp.argmax(ver_logits, -1).astype(jnp.int32)
    ok_g = (tgt_out[:, :-1] == spec[:, 1:])
    len_g = jnp.sum(jnp.cumprod(ok_g.astype(jnp.int32), axis=-1), -1) + 1
    # stochastic law at per-row temperature (temp<=0 rows run it on a safe
    # epsilon temperature and are discarded by the select below)
    t = jnp.maximum(temps, 1e-6)[:, None, None]
    q_probs = jax.nn.softmax(spec_logits[:, 1:] / t, -1)
    p_probs = jax.nn.softmax(ver_logits[:, :-1] / t, -1)
    gidx = spec[:, 1:, None]
    q_tok = jnp.take_along_axis(q_probs, gidx, -1)[..., 0]
    p_tok = jnp.take_along_axis(p_probs, gidx, -1)[..., 0]
    eps = 1e-9
    alpha = jnp.clip((p_tok + eps) / (q_tok + eps), 0.0, 1.0)
    rng, k_acc, k_res, k_b = jax.random.split(rng, 4)
    accept = jax.random.uniform(k_acc, alpha.shape) < alpha
    residual = jnp.maximum(p_probs - q_probs, 0.0)
    denom = jnp.sum(residual, -1, keepdims=True)
    residual = jnp.where(denom > 0, residual / jnp.maximum(denom, 1e-30),
                         p_probs)
    resample = jax.random.categorical(
        k_res, jnp.log(jnp.maximum(residual, 1e-30)), axis=-1).astype(jnp.int32)
    ver_tokens = jnp.where(accept, spec[:, 1:], resample)
    last = _sample_rows(ver_logits[:, -1], k_b, temps)
    emit_s = jnp.concatenate([ver_tokens, last[:, None]], axis=1)
    len_s = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=-1), -1) + 1
    is_g = temps <= 0.0
    emit = jnp.where(is_g[:, None], tgt_out, emit_s)
    correct_len = jnp.where(is_g, len_g, len_s)
    return emit, correct_len, rng


class SpecEngine:
    """Holds parameters + jit-compiled generation loops for one model pair."""

    def __init__(self, params, draft_params, cfg: ModelConfig,
                 dcfg: DraftConfig = DraftConfig(),
                 ecfg: EngineConfig = EngineConfig(), mesh=None):
        self.params = params
        self.draft_params = draft_params
        self.cfg = cfg
        self.dcfg = dcfg
        self.ecfg = ecfg
        self.mesh = mesh  # set to a Mesh to shard DecodeState (parallel/)
        # attn_impl="sp": sequence-parallel attention over a mesh with an
        # `sp` axis — the KV caches live sequence-sharded, prefill runs as a
        # ppermute ring, decode/verify as per-shard partials + exact LSE
        # merge (parallel/ring.py). The marker string carries the mesh.
        if ecfg.attn_impl == "sp":
            from ..parallel.ring import SPAttn
            if not isinstance(ecfg.attn_impl, SPAttn):
                if mesh is None or "sp" not in mesh.shape:
                    raise ValueError("attn_impl='sp' needs mesh= with an "
                                     "'sp' axis (parallel.shardings.make_mesh)")
                import dataclasses
                self.ecfg = ecfg = dataclasses.replace(
                    ecfg, attn_impl=SPAttn(mesh))
        self._jit_cache = {}
        # int8 draft scoring head: per-vocab-column absmax scales; the int8
        # copy is read instead of the bf16 lm_head during draft micro-steps
        # (ROADMAP: ~40% of tree-round time was lm_head re-reads)
        if dcfg.ring_size is not None:
            if dcfg.window is None:
                # the ring presupposes windowed attention: with full
                # attention, eviction would silently amputate draft context
                raise ValueError("ring_size requires a sliding window "
                                 "(DraftConfig.window); a full-attention "
                                 "draft cannot evict rows")
            # overwrite safety: a ring write at position p evicts p - W; the
            # evicted position must already be outside every reachable
            # query's window (see glide.py ring notes)
            need = (dcfg.anchors + (dcfg.window or 0)
                    + 2 * max(ecfg.gamma, ecfg.tree_depth) + 10)
            if dcfg.ring_size < need:
                raise ValueError(f"ring_size {dcfg.ring_size} < safe minimum "
                                 f"{need} for window={dcfg.window}, "
                                 f"anchors={dcfg.anchors}, this engine config")
        # O(window) target ring cache (EngineConfig.kv_ring, ops/ring_cache)
        self._ring = None
        if ecfg.kv_ring is not None:
            if cfg.sliding_window is None:
                raise ValueError("kv_ring requires a sliding window "
                                 "(ModelConfig.sliding_window): a full-"
                                 "attention target cannot evict rows")
            if ecfg.kv_quant != "none":
                raise ValueError("kv_ring + kv_quant do not compose (the "
                                 "ring is already O(window) small — bf16 "
                                 "rows cost less than the int8 machinery)")
            if not (isinstance(ecfg.attn_impl, str)
                    and ecfg.attn_impl in ("dense", "chunked", "pallas")):
                raise ValueError("kv_ring supports dense/chunked/pallas "
                                 "engines (the ring has its own chunked "
                                 "attention path)")
            if not ecfg.prefill_seg:
                raise ValueError("kv_ring requires prefill_seg: the one-shot"
                                 " prefill would need the O(context) cache "
                                 "the ring exists to avoid")
            if dcfg.ca_window is None:
                raise ValueError("kv_ring requires DraftConfig.ca_window: "
                                 "the draft cross-attention over the ring "
                                 "needs a window bound, or evicted/junk "
                                 "slots would be attended as old positions")
            if dcfg.ca_anchors != cfg.attn_sinks:
                raise ValueError(f"kv_ring pins {cfg.attn_sinks} sink rows; "
                                 f"draft ca_anchors={dcfg.ca_anchors} must "
                                 "match (the CA recovers ring positions "
                                 "with the same geometry)")
            reach = max(cfg.sliding_window, dcfg.ca_window or 0)
            writes = max(ecfg.prefill_seg, ecfg.tree_size + 1, ecfg.gamma + 1)
            need = cfg.attn_sinks + reach + writes + 16
            if ecfg.kv_ring < need:
                raise ValueError(f"kv_ring={ecfg.kv_ring} < safe minimum "
                                 f"{need} (sinks {cfg.attn_sinks} + reach "
                                 f"{reach} + max writes/dispatch {writes} "
                                 "+ slack)")
            self._ring = cfg.attn_sinks
        self._qhead = None
        if ecfg.draft_head in ("int8", "int4"):
            w = M.lm_head_weight(params)
            qmax = 127.0 if ecfg.draft_head == "int8" else 7.0
            qdtype = jnp.int8 if ecfg.draft_head == "int8" else jnp.int4

            @jax.jit
            def quantize(w):
                scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / qmax
                w8 = jnp.round(w.astype(jnp.float32) /
                               jnp.maximum(scale, 1e-30)[None, :])
                return w8.astype(qdtype), scale

            self._qhead = quantize(w)
        # int8 draft-layer compute: decode-time proposal micro-steps read a
        # per-channel int8 copy of every 2-D draft kernel (half the weight
        # bytes per tree level). Prefill and training keep the bf16 params;
        # q only shapes proposals so T=0 losslessness is structural and at
        # T>0 sampling and verification share the same quantized q.
        # decode/verify residual-stream precision (config.py decode_dtype):
        # fp32 islands so vanilla-vs-verify reduction-order noise cannot
        # flip greedy argmax ties (the round-2 losslessness postmortem)
        self._cdt = (jnp.float32 if ecfg.decode_dtype == "fp32" else None)
        # deferred-commit scratch dtype: the dtype of the raw KV rows the
        # verify forward collects. decode_dtype="fp32" pins fp32 islands;
        # "native" computes in the params' own dtype — assume nothing
        # (fp32 params + a bf16 scratch would round the rows BEFORE the
        # flush, so the cache would store values the verify's suffix
        # attention never saw, and QuantKV would quantize from rounded rows)
        self._pend_dt = self._cdt or M.lm_head_weight(params).dtype
        # the one decode-loop verify shape (uniform_decode_shape): tree
        # nodes, or the chain block when a degenerate config makes it larger
        self._uniform_n = max(ecfg.tree_size, ecfg.gamma + 1)
        self._decode_draft_params = draft_params
        if ecfg.draft_compute in ("int8", "int4"):
            bits = 8 if ecfg.draft_compute == "int8" else 4
            self._decode_draft_params = jax.jit(
                functools.partial(G.quantize_draft_params, bits=bits))(
                draft_params)

    def _beam_topk(self, params, h, k: int):
        """Per-row top-k (log-softmax value, vocab id) of the draft scoring
        head over the LAST axis of `h` [..., H] -> ([..., k], [..., k]).

        Under a mesh with a vocab-sharded lm_head this runs shard-local
        (parallel.overlap.sharded_topk): each tp shard scores only its vocab
        slice and only the [rows, k] winners plus the logsumexp scalars cross
        the ICI — never full logits (SURVEY §7.1.7; the reference's
        equivalent is a one-GPU flat nodes x vocab top-k,
        `llama_glide.py:1064-1067`). With the int8/int4 draft head the
        shard-local scoring runs the quantized matmul (sharded_topk_quant):
        per-column scales make it bit-identical to the single-device
        quantized head, so tp>1 and draft_head='int8' compose.
        """
        if self.mesh is not None and self.mesh.shape.get("tp", 1) > 1:
            lead = h.shape[:-1]
            rows = int(np.prod(lead)) if lead else 1
            dp = self.mesh.shape.get("dp", 1)
            rows_axis = "dp" if (dp > 1 and rows % dp == 0) else None
            h2 = h.reshape(rows, h.shape[-1])
            if self._qhead is None:
                from ..parallel.overlap import sharded_topk
                vals, ids = sharded_topk(self.mesh, h2,
                                         M.lm_head_weight(params), k,
                                         rows_axis=rows_axis)
            else:
                from ..parallel.overlap import sharded_topk_quant
                vals, ids = sharded_topk_quant(self.mesh, h2, *self._qhead,
                                               k, rows_axis=rows_axis)
            return vals.reshape(*lead, k), ids.reshape(*lead, k)
        logp = jax.nn.log_softmax(self._draft_logits(params, h), axis=-1)
        if self.ecfg.beam_topk == "approx":
            vals, ids = jax.lax.approx_max_k(logp, k, recall_target=0.95)
        else:
            vals, ids = jax.lax.top_k(logp, k)
        return vals, ids.astype(jnp.int32)

    def _logp_topk(self, logp, k: int):
        """Top-k over precomputed draft logp, honoring ecfg.beam_topk — the
        per-row-temperature greedy arm must select the same candidates the
        scalar-T=0 program would (token-exactness across modes)."""
        if self.ecfg.beam_topk == "approx":
            vals, ids = jax.lax.approx_max_k(logp, k, recall_target=0.95)
        else:
            vals, ids = jax.lax.top_k(logp, k)
        return vals, ids.astype(jnp.int32)

    def _draft_logits(self, params, h):
        """Draft-side scoring logits [.., V] fp32 (quantized when enabled)."""
        if self._qhead is None:
            return M.logits_at(params, h)
        w8, scale = self._qhead
        if w8.dtype != jnp.int8:
            w8 = w8.astype(jnp.int8)   # int4 HBM read, int8 MXU compute
        hf = h.astype(jnp.float32)
        hmax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
        h8 = jnp.round(hf * (127.0 / jnp.maximum(hmax, 1e-30))).astype(jnp.int8)
        acc = jax.lax.dot_general(
            h8, w8, (((h8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (hmax / 127.0) * scale

    # ------------------------------------------------------------------
    # State allocation & prefill
    # ------------------------------------------------------------------

    @property
    def _sp_n(self) -> int:
        """Size of the sequence-parallel axis (1 = SP off)."""
        if self.ecfg.attn_impl == "sp":
            return self.ecfg.attn_impl.mesh.shape[self.ecfg.attn_impl.axis]
        return 1

    def init_state(self, batch: int, s_max: int, dtype=jnp.bfloat16) -> DecodeState:
        n_sp = self._sp_n
        s_max = -(-s_max // n_sp) * n_sp  # sp shards need equal slices
        # chunk-align the target cache: the pallas decode kernel streams
        # 2048-row chunks and a ragged tail would force an O(context) pad
        # copy of the whole cache EVERY step (stacked mode refuses it);
        # the extra rows cost only memory and are never inside any k_hi
        if self.ecfg.attn_impl == "pallas" and self.ecfg.kv_ring is None:
            s_max = -(-s_max // 2048) * 2048
        if self.ecfg.kv_quant == "int8":
            from ..ops.quantkv import alloc_quant_kv
            shape = (self.cfg.num_layers, batch, self.cfg.num_kv_heads,
                     s_max, self.cfg.head_dim_)
            kv_k, kv_v = alloc_quant_kv(shape), alloc_quant_kv(shape)
        elif self.ecfg.kv_ring is not None:
            # O(window) ring: physical rows independent of context length
            kv_k, kv_v = M.alloc_kv_cache(self.cfg, batch,
                                          self.ecfg.kv_ring, dtype)
        else:
            kv_k, kv_v = M.alloc_kv_cache(self.cfg, batch, s_max, dtype)
        hd = self.cfg.head_dim_
        d_rows = self.dcfg.ring_size if self.dcfg.ring_size else s_max
        d_shape = (batch, self.cfg.num_kv_heads, d_rows, hd)
        state = DecodeState(
            kv_k=kv_k, kv_v=kv_v,
            d_kv_k=jnp.zeros(d_shape, dtype), d_kv_v=jnp.zeros(d_shape, dtype),
            cache_lens=jnp.zeros((batch,), jnp.int32),
            d_cache_lens=jnp.zeros((batch,), jnp.int32),
        )
        if self.mesh is not None:
            from ..parallel import shardings as sh
            # a ring draft cache is ~window-sized: keep it replicated over sp
            sp = sh.state_pspecs(sp=n_sp > 1,
                                 ring=self.dcfg.ring_size is not None,
                                 kv_quant=self.ecfg.kv_quant == "int8")
            # batch not divisible by dp (e.g. the serving prefill's dense
            # batch-1 state): keep the batch replicated instead
            if batch % dict(self.mesh.shape).get("dp", 1):
                sp = sh.drop_axis(sp, "dp")
            P = jax.sharding.PartitionSpec

            def put(x, spec):
                # spec may be a QuantKV-of-PartitionSpecs matching x
                shard = jax.tree.map(
                    lambda s: jax.sharding.NamedSharding(self.mesh, s),
                    spec, is_leaf=lambda y: isinstance(y, P))
                return jax.device_put(x, shard)

            state = DecodeState(*[
                x if x is None else put(x, sp[f])
                for f, x in zip(DecodeState._fields, state)])
        return state

    def init_paged_state(self, batch: int, n_pages: int, n_chunks: int,
                         dtype=jnp.bfloat16) -> DecodeState:
        """Paged decode state (`ecfg.attn_impl = PagedAttn(page)`): target KV
        as shared page pools [L, n_pages, Hkv, page, D] + per-row page
        tables [batch, n_chunks]; the draft cache stays dense (O(window)).
        Used by `serve.SpecServer(kv="paged")` — a row's logical capacity is
        n_chunks * page tokens, its physical footprint only its USED pages.
        """
        cfg = self.cfg
        page = self.ecfg.attn_impl.page
        hd = cfg.head_dim_
        pool = (cfg.num_layers, n_pages, cfg.num_kv_heads, page, hd)
        d_rows = self.dcfg.ring_size if self.dcfg.ring_size else n_chunks * page
        d_shape = (batch, cfg.num_kv_heads, d_rows, hd)
        if self.ecfg.kv_quant == "int8":
            from ..ops.quantkv import alloc_quant_kv
            kv_k, kv_v = alloc_quant_kv(pool), alloc_quant_kv(pool)
        else:
            kv_k, kv_v = jnp.zeros(pool, dtype), jnp.zeros(pool, dtype)
        state = DecodeState(
            kv_k=kv_k, kv_v=kv_v,
            d_kv_k=jnp.zeros(d_shape, dtype), d_kv_v=jnp.zeros(d_shape, dtype),
            cache_lens=jnp.zeros((batch,), jnp.int32),
            d_cache_lens=jnp.zeros((batch,), jnp.int32),
            tables=jnp.zeros((batch, n_chunks), jnp.int32),
        )
        if self.mesh is not None:
            from ..parallel import shardings as sh
            sp = sh.paged_state_pspecs(kv_quant=self.ecfg.kv_quant == "int8")
            P = jax.sharding.PartitionSpec

            def put(x, spec):
                shard = jax.tree.map(
                    lambda s: jax.sharding.NamedSharding(self.mesh, s),
                    spec, is_leaf=lambda y: isinstance(y, P))
                return jax.device_put(x, shard)

            state = DecodeState(*[
                x if x is None else put(x, sp[f])
                for f, x in zip(DecodeState._fields, state)])
        return state

    def _prefill_impl(self, params, draft_params, tokens, lengths,
                      state: DecodeState, rng):
        """Target + draft prompt prefill; returns (state, first_token, logits0)."""
        cfg, dcfg = self.cfg, self.dcfg
        b, s = tokens.shape
        h, kv_k, kv_v = M.forward_prefill(params, cfg, tokens, lengths,
                                          state.kv_k, state.kv_v,
                                          attn_impl=self.ecfg.attn_impl)
        last_h = jnp.take_along_axis(h, (lengths - 1)[:, None, None], axis=1)[:, 0]
        logits0 = M.logits_at(params, last_h)
        t0 = _sample(logits0, rng, self.ecfg.temperature)

        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        emb = M.embed(params, tokens)
        _, d_kv_k, d_kv_v = G.glide_prefill(
            draft_params, cfg, dcfg, emb, positions, lengths,
            state.d_kv_k, state.d_kv_v, kv_k[-1], kv_v[-1],
            attn_impl=self.ecfg.attn_impl)
        new_state = DecodeState(kv_k, kv_v, d_kv_k, d_kv_v,
                                cache_lens=lengths.astype(jnp.int32),
                                d_cache_lens=lengths.astype(jnp.int32))
        return new_state, t0, logits0

    def _prefill_seg_body(self, params, draft_params, tokens, lengths, *,
                          seg: int):
        """The per-segment scan body shared by the single-dispatch segmented
        prefill and the host-driven grouped dispatches — one definition, so
        every dispatch split computes the bit-identical per-segment math."""
        cfg, dcfg, ecfg = self.cfg, self.dcfg, self.ecfg
        b = tokens.shape[0]

        def body(carry, i):
            kv_k, kv_v, dkk, dkv, last_h = carry
            start = i * seg
            toks = jax.lax.dynamic_slice(tokens, (0, start), (b, seg))
            pos = start + jnp.arange(seg)[None, :]
            pos = jnp.broadcast_to(pos, (b, seg))
            k_hi = jnp.minimum(pos + 1, lengths[:, None])     # [B, seg]
            starts = jnp.full((b,), 1, jnp.int32) * start
            h, kv_k, kv_v = M.forward_append(
                params, cfg, toks, pos, None, k_hi, kv_k, kv_v,
                attn_impl=ecfg.attn_impl, write_at=starts,
                ring_anchors=self._ring)
            # capture the hidden row at lengths-1 when it falls in this seg
            li = jnp.clip(lengths - 1 - start, 0, seg - 1)
            h_at = jnp.take_along_axis(h, li[:, None, None], axis=1)[:, 0]
            in_seg = (lengths - 1 >= start) & (lengths - 1 < start + seg)
            last_h = jnp.where(in_seg[:, None], h_at.astype(last_h.dtype),
                               last_h)
            # draft layer over the same segment (lag-0 causal CA over the
            # target rows just written)
            emb = M.embed(params, toks)
            seg_written = jnp.minimum(start + seg, lengths)
            _, dkk, dkv = G.glide_forward(
                draft_params, cfg, dcfg, emb, pos, dkk, dkv, k_hi,
                kv_k[-1], kv_v[-1], k_hi, attn_impl=ecfg.attn_impl,
                write_at=starts, no_suffix=True,
                write_valid=pos < lengths[:, None],
                d_written=seg_written,
                llm_ring_anchors=self._ring, llm_written=seg_written)
            return (kv_k, kv_v, dkk, dkv, last_h), None

        return body

    def _prefill_seg_group(self, params, draft_params, tokens, lengths,
                           carry, i0, *, seg: int, n_group: int):
        """Scan `n_group` consecutive segments starting at segment index
        `i0` (traced). One host-driven dispatch of the grouped segmented
        prefill (EngineConfig.prefill_dispatch_segs)."""
        body = self._prefill_seg_body(params, draft_params, tokens, lengths,
                                      seg=seg)
        carry, _ = jax.lax.scan(body, carry, i0 + jnp.arange(n_group))
        return carry

    def _prefill_seg_finish(self, params, lengths, carry, rng):
        """Logits + first token + DecodeState from the final scan carry."""
        kv_k, kv_v, dkk, dkv, last_h = carry
        logits0 = M.logits_at(params, last_h)
        t0 = _sample(logits0, rng, self.ecfg.temperature)
        new_state = DecodeState(kv_k, kv_v, dkk, dkv,
                                cache_lens=lengths.astype(jnp.int32),
                                d_cache_lens=lengths.astype(jnp.int32))
        return new_state, t0, logits0

    def _prefill_segmented_impl(self, params, draft_params, tokens, lengths,
                                state: DecodeState, rng, *, seg: int):
        """Segmented prompt prefill (EngineConfig.prefill_seg): scan fixed
        `seg`-token segments; each segment writes its target KV rows, then
        attends the cache under a per-query causal bound (suffix-free
        forward_append), then runs the draft layer the same way — O(seg)
        live activations at ANY context length. Returns
        (state, first_token, logits0) like `_prefill_impl`."""
        b, s = tokens.shape
        assert s % seg == 0, (s, seg)
        n_seg = s // seg
        body = self._prefill_seg_body(params, draft_params, tokens, lengths,
                                      seg=seg)
        last_h0 = jnp.zeros((b, self.cfg.hidden_size), jnp.float32)
        carry, _ = jax.lax.scan(
            body, (state.kv_k, state.kv_v, state.d_kv_k, state.d_kv_v,
                   last_h0), jnp.arange(n_seg))
        return self._prefill_seg_finish(params, lengths, carry, rng)

    def _prefill_segmented_grouped(self, params, draft_params, tokens,
                                   lengths, state: DecodeState, rng,
                                   *, seg: int, group: int):
        """Host-driven grouped segmented prefill: at most `group` segments
        per device dispatch (EngineConfig.prefill_dispatch_segs), carry
        donated between dispatches. Bit-identical to the single-dispatch
        scan (same jitted scan body); exists because the remote-TPU tunnel
        kills the worker under one multi-minute dispatch — the observed
        long_262k 32-segment prefill (~7 min in one program) died at ~6-7
        min while a 24-segment one (~5 min) survived."""
        b, s = tokens.shape
        assert s % seg == 0, (s, seg)
        n_seg = s // seg
        last_h0 = jnp.zeros((b, self.cfg.hidden_size), jnp.float32)
        carry = (state.kv_k, state.kv_v, state.d_kv_k, state.d_kv_v, last_h0)
        del state  # the buffers now live in `carry` and are donated below
        done = 0
        while done < n_seg:
            g = min(group, n_seg - done)
            grp = self._get_jit(
                ("prefill_seg_grp", seg, g),
                functools.partial(self._prefill_seg_group, seg=seg,
                                  n_group=g),
                donate=(4,))
            carry = grp(params, draft_params, tokens, lengths, carry,
                        jnp.int32(done))
            done += g
            # sync the (tiny) last_h leaf: one bounded dispatch at a time
            # through the tunnel, and an error surfaces at the failing
            # group instead of at the final readback
            jax.block_until_ready(carry[4])
        fin = self._get_jit(("prefill_seg_fin",), self._prefill_seg_finish)
        return fin(params, lengths, carry, rng)

    # ------------------------------------------------------------------
    # Vanilla autoregressive generation (ref llama_glide.py:552-585)
    # ------------------------------------------------------------------

    def _vanilla_segment(self, params, carry, limit, max_gen_len: int):
        """Run the vanilla decode while-loop up to `limit` total rounds.

        Bounded dispatches keep single XLA executions short — one giant
        execution (minutes) can trip remote-worker watchdogs.
        """
        cfg = self.cfg

        def cond(c):
            return (~jnp.all(c[4])) & (c[3][0] < limit)

        def body(c):
            st, cur, output_ids, i, done, num, rng, pk, pv, pat = c
            rng, k1 = jax.random.split(rng)
            b = cur.shape[0]
            if self.ecfg.uniform_decode_shape:
                # the vanilla step runs THE tree-sized verify program with
                # one live row (see _verify_forward): losslessness vs the
                # speculative arms holds by construction, and the step is
                # bandwidth-bound so the padded rows cost only FLOPs
                if pk is not None:
                    # deferred commit: flush last step's row BEFORE the read
                    # (see _flush_pending — kills the in-loop cache copies)
                    kv_k, kv_v = self._write_rows_at(st, pk, pv, pat)
                    st = st._replace(kv_k=kv_k, kv_v=kv_v)
                toks, pos_t, vmask = self._uniform_args(st, cur[:, None])
                lg_all, new_k, new_v = self._verify_forward(
                    params, st, toks, pos_t, vmask)
                logits = lg_all[:, 0]
                if pk is not None:
                    pk = new_k[:, :, :1].astype(pk.dtype)
                    pv = new_v[:, :, :1].astype(pv.dtype)
                    pat = st.cache_lens
                    kv_k, kv_v = st.kv_k, st.kv_v
                else:
                    kv_k, kv_v = self._commit_rows(
                        st, new_k, new_v, jnp.zeros((b, 1), jnp.int32))
            else:
                pos = st.cache_lens[:, None]
                smask = jnp.ones((b, 1, 1), bool)
                h, kv_k, kv_v = M.forward_append(
                    params, cfg, cur[:, None], pos, smask, st.cache_lens,
                    st.kv_k, st.kv_v, attn_impl=self.ecfg.attn_impl,
                    tables=st.tables, compute_dtype=self._cdt,
                decode_precision=self.ecfg.decode_precision,
                    ring_anchors=self._ring)
                logits = M.logits_at(params, h[:, 0])
            nxt = _sample(logits, k1, self.ecfg.temperature)
            nxt = jnp.where(done, cfg.eos_token_id, nxt)
            cache_lens = st.cache_lens + jnp.where(done, 0, 1)
            output_ids = output_ids.at[:, i[0] + 1].set(nxt)
            num = num + jnp.sum(~done)
            done = done | _is_eos(cfg, nxt)
            st = st._replace(kv_k=kv_k, kv_v=kv_v, cache_lens=cache_lens)
            return (st, nxt, output_ids, i + 1, done, num, rng, pk, pv, pat)

        c = jax.lax.while_loop(cond, body, carry)
        status = c[3][0] * 2 + jnp.all(c[4]).astype(jnp.int32)
        return c, status

    def _verify_forward(self, params, st, tokens, pos_t, vmask):
        """THE decode-loop target program (EngineConfig.uniform_decode_shape).

        Every method's decode-loop target forward — the vanilla step, the
        chain and magicdec verifies, the tree verify — calls this one
        [B, tree_size]-shaped function. The inputs and outputs are pinned
        with `optimization_barrier` so the subgraph is fusion-isolated:
        XLA compiles the identical kernels inside every surrounding loop,
        and the arms of a T=0 losslessness comparison therefore compute
        the identical function of the shared cache BY CONSTRUCTION — no
        numerical argument needed. (Everything outside this call that
        touches emitted tokens is either bit-exact data movement — commits
        gather/scatter these outputs verbatim — or integer bookkeeping.)

        Returns (logits [B, N, V] fp32, new_k, new_v [L, B, N, Hkv, D]).
        The cache is NOT written; callers commit selected rows."""
        cfg, ecfg = self.cfg, self.ecfg
        tokens, pos_t, vmask = jax.lax.optimization_barrier(
            (tokens, pos_t, vmask))
        hv, _, _, new_k, new_v = M.forward_append(
            params, cfg, tokens, pos_t, vmask, st.cache_lens,
            st.kv_k, st.kv_v, attn_impl=ecfg.attn_impl, collect_kv=True,
            tables=st.tables, compute_dtype=self._cdt,
                decode_precision=self.ecfg.decode_precision,
            ring_anchors=self._ring)
        logits = M.logits_at(params, hv)
        return jax.lax.optimization_barrier((logits, new_k, new_v))

    def _select_rows(self, new_k, new_v, path_idx_c):
        """Gather the selected verify-forward rows (path_idx_c [B, P]) out
        of the per-layer collected KV [L, B, N, Hkv, D] — the gather half
        of the commit. Raw (un-cast) rows: QuantKV caches quantize from
        full precision at write time (quantkv.py rule 2)."""
        sel_k = jnp.take_along_axis(new_k, path_idx_c[None, :, :, None, None],
                                    axis=2)
        sel_v = jnp.take_along_axis(new_v, path_idx_c[None, :, :, None, None],
                                    axis=2)
        return sel_k, sel_v

    def _write_rows_at(self, st, sel_k, sel_v, at):
        """Write raw all-layer KV rows (sel_* [L, B, P, Hkv, D]) into the
        target cache at positions `at` [B] — the write half of the commit,
        shared by the in-round commit and the DEFERRED flush."""
        ecfg = self.ecfg
        if ecfg.attn_impl == "sp":
            from ..parallel.ring import sp_write_cache_rows
            kv_k = sp_write_cache_rows(ecfg.attn_impl.mesh, st.kv_k, sel_k,
                                       at, ecfg.attn_impl.axis)
            kv_v = sp_write_cache_rows(ecfg.attn_impl.mesh, st.kv_v, sel_v,
                                       at, ecfg.attn_impl.axis)
        elif ecfg.attn_impl == "paged":
            from ..ops.pallas_paged import write_paged_rows
            wr = jax.vmap(write_paged_rows, in_axes=(0, 0, None, None))
            kv_k = wr(st.kv_k, sel_k, st.tables, at)
            kv_v = wr(st.kv_v, sel_v, st.tables, at)
        elif self._ring is not None:
            # ring commit: same slots a vanilla step would write (ring_index
            # is a pure function of position). Junk rows past the accepted
            # length land on slots the next round rewrites; capacity slack
            # >= A keeps every windowed position live (ops/ring_cache).
            from ..ops.ring_cache import ring_write
            sinks = self._ring
            wr = jax.vmap(lambda c, n: ring_write(c, n, at, sinks))
            kv_k = wr(st.kv_k, sel_k)
            kv_v = wr(st.kv_v, sel_v)
        else:
            kv_k = M.write_cache_rows_stacked(st.kv_k, sel_k, at)
            kv_v = M.write_cache_rows_stacked(st.kv_v, sel_v, at)
        return kv_k, kv_v

    def _commit_rows(self, st, new_k, new_v, path_idx_c):
        """Write the selected verify-forward rows (path_idx_c [B, P]) into
        the target cache at cache_lens.. — bit-exact data movement shared
        by every method (shape differences here cannot affect emitted
        tokens; only `_verify_forward` does arithmetic)."""
        sel_k, sel_v = self._select_rows(new_k, new_v, path_idx_c)
        return self._write_rows_at(st, sel_k, sel_v, st.cache_lens)

    def _flush_pending(self, carry: GenCarry) -> DecodeState:
        """DEFERRED COMMIT, write half: the previous round's accepted rows
        (stashed in the tiny carry.pend_* scratch) are written into the
        target cache at the TOP of the round, BEFORE any cache read.

        Why not commit right after the verify that produced them: inside
        the decode while-loop the verify's pallas read and a commit write
        of the same carried buffer force XLA to insert defensive
        whole-cache copies (measured: six bf16[16,1,8,34816,128] copies,
        2.96GB peak temps, ~7 ms of the 18 ms 32k step — scripts/
        hlo_commit.py). With every write preceding every read the carry
        aliases in place (the same law forward_append relies on:
        models/llama.py "Write BEFORE the attention read").

        Correctness: pend rows [0, P) land at [pend_at, pend_at + P); the
        accepted prefix (adv rows) is exactly [pend_at, cache_lens) and
        rows past cache_lens are never inside any k_hi until a later
        flush overwrites them — the same junk-beyond-cache_lens argument
        the in-round commit already used. The verify that follows reads
        the post-flush buffer with k_hi = cache_lens, which is exactly
        what it read under the in-round commit."""
        st = carry.state
        kv_k, kv_v = self._write_rows_at(st, carry.pend_k, carry.pend_v,
                                         carry.pend_at)
        return st._replace(kv_k=kv_k, kv_v=kv_v)

    def _llm_ca_args(self, st):
        """(llm_k, llm_v, llm_layer) for the draft cross-attention.

        Pallas + chunk-aligned cache: pass the STACKED [L, ...] target
        cache with the last-layer index — the kernel's BlockSpec picks the
        layer and nothing O(context) is materialized (the old `kv_k[-1]`
        slice fed a pallas_call, forcing a full last-layer copy per draft
        micro-step). Otherwise: the materialized last-layer slice."""
        from ..ops.quantkv import QuantKV
        kv_k, kv_v = st.kv_k, st.kv_v
        s = (kv_k.qv if isinstance(kv_k, QuantKV) else kv_k).shape[3]
        if self.ecfg.attn_impl == "pallas" and s % 2048 == 0:
            return kv_k, kv_v, jnp.int32(self.cfg.num_layers - 1)
        return kv_k[-1], kv_v[-1], None

    def _uniform_args(self, st, tokens_a):
        """Pad a [B, A] chain-shaped token block to the uniform [B, N]
        verify call: eos padding, causal visibility, positions
        cache_lens + arange (pad rows are deterministic and never read —
        commits take only the first A rows, logits reads row bounds)."""
        cfg, ecfg = self.cfg, self.ecfg
        b, a = tokens_a.shape
        # ONE shape for every method of this engine (chain gamma can exceed
        # the tree size on degenerate configs — take the max so vanilla,
        # chain, magicdec and tree always produce the same-shaped call)
        n = self._uniform_n
        assert a <= n, (a, n)
        tokens = jnp.full((b, n), cfg.eos_token_id, jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, tokens_a, (0, 0))
        pos_t = st.cache_lens[:, None] + jnp.arange(n)[None, :]
        vmask = jnp.broadcast_to(att.causal_mask(n, n)[None], (b, n, n))
        return tokens, pos_t, vmask

    def _vanilla_carry(self, state, t0, max_gen_len: int, rng):
        cfg = self.cfg
        b = t0.shape[0]
        output_ids = jnp.full((b, max_gen_len + 1), cfg.eos_token_id, jnp.int32)
        output_ids = output_ids.at[:, 0].set(t0)
        done0 = _is_eos(cfg, t0)
        pend_k = pend_v = pend_at = None
        if self.ecfg.uniform_decode_shape:
            # deferred-commit scratch (see _flush_pending): one row/step
            pdt = self._pend_dt
            pshape = (cfg.num_layers, b, 1, cfg.num_kv_heads, cfg.head_dim_)
            pend_k = jnp.zeros(pshape, pdt)
            pend_v = pend_k.copy()   # distinct buffer (see _spec_carry)
            pend_at = state.cache_lens.copy()
        return (state, t0, output_ids, jnp.zeros((1,), jnp.int32), done0,
                jnp.zeros((), jnp.int32), rng, pend_k, pend_v, pend_at)

    # ------------------------------------------------------------------
    # Chain speculation (ref spec_generate, llama_glide.py:621-774)
    # ------------------------------------------------------------------

    def _chain_round(self, params, draft_params, carry: GenCarry):
        cfg, dcfg, ecfg = self.cfg, self.dcfg, self.ecfg
        gamma = ecfg.gamma
        A = gamma + 1
        b = carry.acc_tokens.shape[0]
        st = carry.state
        if carry.pend_k is not None:   # deferred commit: write-before-read
            st = self._flush_pending(carry)
        rng, k_draft = jax.random.split(carry.rng)

        # ---- 1. draft re-encode of accepted tokens (micro-step 0) ----
        pos = st.d_cache_lens[:, None] + jnp.arange(A)[None, :]
        emb = M.embed(params, carry.acc_tokens)
        ca_hi = st.d_cache_lens[:, None] + jnp.arange(A)[None, :]
        llm_k, llm_v, llm_layer = self._llm_ca_args(st)
        h, d_kv_k, d_kv_v = G.glide_forward(
            draft_params, cfg, dcfg, emb, pos,
            st.d_kv_k, st.d_kv_v, st.d_cache_lens,
            llm_k, llm_v, ca_hi,
            attn_impl=ecfg.attn_impl, write_at=st.d_cache_lens,
            tables=st.tables,
            llm_ring_anchors=self._ring, llm_written=st.cache_lens,
            llm_layer=llm_layer)
        d_cache_lens = st.d_cache_lens + jnp.where(carry.done, 0, carry.acc_len)
        bonus_h = jnp.take_along_axis(h, (carry.acc_len - 1)[:, None, None], axis=1)[:, 0]
        logits = self._draft_logits(params, bonus_h)  # [B, V] fp32

        # ---- 2. gamma-1 more single-token draft steps ----
        spec = jnp.zeros((b, A), jnp.int32)
        bonus = jnp.take_along_axis(carry.acc_tokens, (carry.acc_len - 1)[:, None], 1)[:, 0]
        spec = spec.at[:, 0].set(bonus)
        spec_logits = jnp.zeros((b, A, cfg.vocab_size), jnp.float32)
        # T>0: SAMPLE draft tokens from q (exact Leviathan losslessness
        # requires proposals ~ q; the reference drafts greedily even at T>0,
        # which only approximates the target law)
        per_row = ecfg.per_row_temperature

        def draft_sample(lg, key):
            if per_row:
                return _sample_rows(lg, key, carry.temps)
            return _sample(lg, key, ecfg.temperature)

        d1 = draft_sample(logits, jax.random.fold_in(k_draft, 0))
        spec = spec.at[:, 1].set(d1)
        spec_logits = spec_logits.at[:, 1].set(logits)
        smask1 = jnp.ones((b, 1, 1), bool)
        cur = d1
        dkk, dkv = d_kv_k, d_kv_v
        dcl = d_cache_lens
        for s_i in range(1, gamma):
            posi = dcl[:, None]
            embi = M.embed(params, cur[:, None])
            hi, dkk, dkv = G.glide_forward(
                draft_params, cfg, dcfg, embi, posi, dkk, dkv, dcl,
                llm_k, llm_v, st.cache_lens[:, None],
                suffix_mask=smask1, attn_impl=ecfg.attn_impl, write_at=dcl,
                tables=st.tables,
                llm_ring_anchors=self._ring, llm_written=st.cache_lens,
                llm_layer=llm_layer)
            dcl = dcl + jnp.where(carry.done, 0, 1)
            li = self._draft_logits(params, hi[:, 0])
            cur = draft_sample(li, jax.random.fold_in(k_draft, s_i))
            spec = spec.at[:, s_i + 1].set(cur)
            spec_logits = spec_logits.at[:, s_i + 1].set(li)
        # NOTE: draft cache rows for spec tokens 1..gamma-1 were written at
        # dcl..; they are junk for the next round and get overwritten by the
        # next re-encode (reference behaves identically).
        d_cache_lens_out = d_cache_lens  # only accepted re-encode advances

        # ---- 3. target verify of [bonus, d1..dgamma] ----
        if ecfg.uniform_decode_shape:
            toks_u, pos_u, mask_u = self._uniform_args(st, spec)
            lg_all, new_k, new_v = self._verify_forward(
                params, st, toks_u, pos_u, mask_u)
            ver_logits = lg_all[:, :A]            # [B, A, V] fp32
            if carry.pend_k is not None:
                # deferred commit (see _flush_pending): stash all A rows
                pend_k = new_k[:, :, :A].astype(carry.pend_k.dtype)
                pend_v = new_v[:, :, :A].astype(carry.pend_v.dtype)
                pend_at = st.cache_lens
                kv_k, kv_v = st.kv_k, st.kv_v
            else:
                pend_k = pend_v = pend_at = None
                kv_k, kv_v = self._commit_rows(
                    st, new_k, new_v,
                    jnp.broadcast_to(jnp.arange(A)[None], (b, A)))
        else:
            pend_k = pend_v = pend_at = None
            pos_t = st.cache_lens[:, None] + jnp.arange(A)[None, :]
            cmask = jnp.broadcast_to(att.causal_mask(A, A)[None], (b, A, A))
            hv, kv_k, kv_v = M.forward_append(
                params, cfg, spec, pos_t, cmask, st.cache_lens,
                st.kv_k, st.kv_v, attn_impl=ecfg.attn_impl, tables=st.tables,
                compute_dtype=self._cdt,
                decode_precision=self.ecfg.decode_precision, ring_anchors=self._ring)
            ver_logits = M.logits_at(params, hv)  # [B, A, V] fp32
        if per_row:
            emit, correct_len, rng = _chain_accept_rows(
                spec, spec_logits, ver_logits, carry.temps, rng)
        else:
            emit, correct_len, rng = _chain_accept(
                spec, spec_logits, ver_logits, ecfg.temperature, rng)

        adv = jnp.where(carry.done, 0, correct_len)
        adv, has_eos = _truncate_at_stop(cfg, emit, adv)
        # emitted tokens = emit[:, :correct_len] (target outputs incl. bonus)
        acc_tokens_new = emit  # [B, A]; valid prefix = correct_len
        cache_lens = st.cache_lens + adv

        output_ids = _masked_row_write(carry.output_ids, emit, carry.out_len,
                                       carry.done)
        out_len = carry.out_len + adv
        out_buf = carry.output_ids.shape[1]
        done = (carry.done | has_eos | (out_len + A >= out_buf)
                | (out_len >= carry.out_cap))
        count = carry.count + jnp.sum(jnp.where(carry.done, 0, adv - 1))
        num = carry.num + jnp.sum(~carry.done)
        acc_len = jnp.where(done, 1, correct_len)

        st = DecodeState(kv_k, kv_v, dkk, dkv, cache_lens, d_cache_lens_out,
                         st.tables)
        return GenCarry(st, acc_tokens_new, acc_len, output_ids, out_len, done,
                        count, num, carry.rounds + 1, rng, carry.out_cap,
                        carry.temps, pend_k, pend_v, pend_at)

    # ------------------------------------------------------------------
    # MagicDec / StreamingLLM self-speculation baseline
    # (ref magicdec_generate, llama_glide.py:776-913; stream cache build
    #  llama.py:228-264; draft step fix_stream_spec llama.py:331-355)
    # ------------------------------------------------------------------

    def _magicdec_prefill(self, params, tokens, lengths, state: DecodeState,
                          rng):
        """Target prefill + sink/recent stream-cache construction.

        The stream cache (the target's own "draft" view) holds
        `magicdec_sink` anchor rows + the `magicdec_window` most recent rows
        of every layer's KV; it lives in DecodeState.d_kv_k/d_kv_v with
        shape [L, B, Hkv, S_stream, D].
        """
        cfg, ecfg = self.cfg, self.ecfg
        sink, win = ecfg.magicdec_sink, ecfg.magicdec_window
        b, s = tokens.shape
        h, kv_k, kv_v = M.forward_prefill(params, cfg, tokens, lengths,
                                          state.kv_k, state.kv_v,
                                          attn_impl=ecfg.attn_impl)
        last_h = jnp.take_along_axis(h, (lengths - 1)[:, None, None], axis=1)[:, 0]
        logits0 = M.logits_at(params, last_h)
        t0 = _sample(logits0, rng, ecfg.temperature)

        # stream row j sources full-cache row: identity when len <= sink+win,
        # else [0..sink) ++ [len-win, len)
        j = jnp.arange(sink + win)
        src = jnp.where(lengths[:, None] <= sink + win, j[None, :],
                        jnp.where(j[None, :] < sink, j[None, :],
                                  lengths[:, None] - win + (j[None, :] - sink)))
        src = jnp.clip(src, 0, kv_k.shape[3] - 1)             # [B, sink+win]

        def gather_stream(cache):
            # cache [L, B, Hkv, S, D] -> [L, B, Hkv, sink+win, D]
            from ..ops.quantkv import QuantKV, dequant
            if isinstance(cache, QuantKV):
                # the bf16 stream cache holds DEQUANTIZED rows — the same
                # values every read of the quantized main cache sees
                return dequant(QuantKV(
                    jnp.take_along_axis(cache.qv,
                                        src[None, :, None, :, None], axis=3),
                    jnp.take_along_axis(cache.scale,
                                        src[None, :, None, :], axis=3)))
            return jnp.take_along_axis(
                cache, src[None, :, None, :, None], axis=3)

        s_stream = state.d_kv_k.shape[3]
        pad = s_stream - (sink + win)
        d_kv_k = jnp.pad(gather_stream(kv_k), ((0, 0),) * 3 + ((0, pad), (0, 0)))
        d_kv_v = jnp.pad(gather_stream(kv_v), ((0, 0),) * 3 + ((0, pad), (0, 0)))
        d_lens = jnp.minimum(lengths, sink + win).astype(jnp.int32)
        new_state = DecodeState(kv_k, kv_v, d_kv_k.astype(state.d_kv_k.dtype),
                                d_kv_v.astype(state.d_kv_v.dtype),
                                cache_lens=lengths.astype(jnp.int32),
                                d_cache_lens=d_lens)
        return new_state, t0, logits0

    def _magicdec_round(self, params, draft_params, carry: GenCarry):
        """One MagicDec round: identical skeleton to `_chain_round`, with
        the target-over-stream-cache standing in for the GLIDE draft
        (`draft_params` is ignored — self-speculation)."""
        cfg, ecfg = self.cfg, self.ecfg
        gamma = ecfg.gamma
        A = gamma + 1
        b = carry.acc_tokens.shape[0]
        st = carry.state
        if carry.pend_k is not None:   # deferred commit: write-before-read
            st = self._flush_pending(carry)
        rng, k_draft = jax.random.split(carry.rng)
        # The stream cache is COMPACTED (row index != position), so the
        # position-derived sliding-window cut would mask the wrong rows.
        # Draft steps therefore attend the full stream cache (it is itself
        # a sink+recent window view); only VERIFICATION (full cache, row ==
        # position) must match the target exactly, and it keeps `cfg`.
        cfg_s = (dataclasses.replace(cfg, sliding_window=None, attn_sinks=0)
                 if cfg.sliding_window is not None else cfg)

        # ---- 1. stream-cache re-encode of accepted tokens ----
        # acc_tokens[j] sits at sequence position cache_lens - acc_len + 1 + j
        # (the last accepted token is the new bonus at position cache_lens).
        pos = (st.cache_lens - carry.acc_len + 1)[:, None] + jnp.arange(A)[None, :]
        cmaskA = jnp.broadcast_to(att.causal_mask(A, A)[None], (b, A, A))
        h, d_kv_k, d_kv_v = M.forward_append(
            params, cfg_s, carry.acc_tokens, pos, cmaskA, st.d_cache_lens,
            st.d_kv_k, st.d_kv_v, attn_impl=ecfg.attn_impl,
            write_at=st.d_cache_lens, compute_dtype=self._cdt,
                decode_precision=self.ecfg.decode_precision)
        d_cache_lens = st.d_cache_lens + jnp.where(carry.done, 0, carry.acc_len)
        bonus_h = jnp.take_along_axis(h, (carry.acc_len - 1)[:, None, None], axis=1)[:, 0]
        logits = M.logits_at(params, bonus_h)

        # ---- 2. gamma-1 more single-token stream draft steps ----
        spec = jnp.zeros((b, A), jnp.int32)
        bonus = jnp.take_along_axis(carry.acc_tokens, (carry.acc_len - 1)[:, None], 1)[:, 0]
        spec = spec.at[:, 0].set(bonus)
        spec_logits = jnp.zeros((b, A, cfg.vocab_size), jnp.float32)
        per_row = ecfg.per_row_temperature

        def draft_sample(lg, key):
            if per_row:
                return _sample_rows(lg, key, carry.temps)
            return _sample(lg, key, ecfg.temperature)

        # T>0: sample draft tokens from q (see _chain_round)
        d1 = draft_sample(logits, jax.random.fold_in(k_draft, 0))
        spec = spec.at[:, 1].set(d1)
        spec_logits = spec_logits.at[:, 1].set(logits)
        smask1 = jnp.ones((b, 1, 1), bool)
        cur = d1
        dkk, dkv, dcl = d_kv_k, d_kv_v, d_cache_lens
        pos_cur = st.cache_lens + 1  # true position of `cur` (d1 follows bonus)
        for s_i in range(1, gamma):
            hi, dkk, dkv = M.forward_append(
                params, cfg_s, cur[:, None], pos_cur[:, None], smask1, dcl,
                dkk, dkv, attn_impl=ecfg.attn_impl, write_at=dcl,
                compute_dtype=self._cdt,
                decode_precision=self.ecfg.decode_precision)
            dcl = dcl + jnp.where(carry.done, 0, 1)
            pos_cur = pos_cur + 1
            li = M.logits_at(params, hi[:, 0])
            cur = draft_sample(li, jax.random.fold_in(k_draft, s_i))
            spec = spec.at[:, s_i + 1].set(cur)
            spec_logits = spec_logits.at[:, s_i + 1].set(li)

        # ---- 3. full-cache target verify + accept (chain semantics) ----
        if ecfg.uniform_decode_shape:
            toks_u, pos_u, mask_u = self._uniform_args(st, spec)
            lg_all, new_k, new_v = self._verify_forward(
                params, st, toks_u, pos_u, mask_u)
            ver_logits = lg_all[:, :A]
            if carry.pend_k is not None:
                # deferred commit (see _flush_pending): stash all A rows
                pend_k = new_k[:, :, :A].astype(carry.pend_k.dtype)
                pend_v = new_v[:, :, :A].astype(carry.pend_v.dtype)
                pend_at = st.cache_lens
                kv_k, kv_v = st.kv_k, st.kv_v
            else:
                pend_k = pend_v = pend_at = None
                kv_k, kv_v = self._commit_rows(
                    st, new_k, new_v,
                    jnp.broadcast_to(jnp.arange(A)[None], (b, A)))
        else:
            pend_k = pend_v = pend_at = None
            pos_t = st.cache_lens[:, None] + jnp.arange(A)[None, :]
            cmask = jnp.broadcast_to(att.causal_mask(A, A)[None], (b, A, A))
            hv, kv_k, kv_v = M.forward_append(
                params, cfg, spec, pos_t, cmask, st.cache_lens,
                st.kv_k, st.kv_v, attn_impl=ecfg.attn_impl, tables=st.tables,
                compute_dtype=self._cdt,
                decode_precision=self.ecfg.decode_precision, ring_anchors=self._ring)
            ver_logits = M.logits_at(params, hv)
        if per_row:
            emit, correct_len, rng = _chain_accept_rows(
                spec, spec_logits, ver_logits, carry.temps, rng)
        else:
            emit, correct_len, rng = _chain_accept(
                spec, spec_logits, ver_logits, ecfg.temperature, rng)

        adv = jnp.where(carry.done, 0, correct_len)
        adv, has_eos = _truncate_at_stop(cfg, emit, adv)
        cache_lens = st.cache_lens + adv
        output_ids = _masked_row_write(carry.output_ids, emit, carry.out_len,
                                       carry.done)
        out_len = carry.out_len + adv
        out_buf = carry.output_ids.shape[1]
        done = (carry.done | has_eos | (out_len + A >= out_buf)
                | (out_len >= carry.out_cap))
        count = carry.count + jnp.sum(jnp.where(carry.done, 0, adv - 1))
        num = carry.num + jnp.sum(~carry.done)
        acc_len = jnp.where(done, 1, correct_len)

        st = DecodeState(kv_k, kv_v, dkk, dkv, cache_lens, d_cache_lens,
                         st.tables)
        return GenCarry(st, emit, acc_len, output_ids, out_len, done,
                        count, num, carry.rounds + 1, rng, carry.out_cap,
                        carry.temps, pend_k, pend_v, pend_at)

    # ------------------------------------------------------------------
    # Tree speculation (ref tree_spec_generate, llama_glide.py:915-1126)
    # ------------------------------------------------------------------

    def _tree_round(self, params, draft_params, carry: GenCarry):
        cfg, dcfg, ecfg = self.cfg, self.dcfg, self.ecfg
        shape = ecfg.tree_shape
        offs = ecfg.level_offsets      # e.g. (0, 1, 5, 21, 37, 53, 69+... )
        N = ecfg.tree_size             # nodes incl. root
        gamma = ecfg.tree_depth
        A = gamma + 1                  # max accepted path length
        b = carry.acc_tokens.shape[0]
        st = carry.state
        if carry.pend_k is not None:   # deferred commit: write-before-read
            st = self._flush_pending(carry)
        hd = cfg.head_dim_
        rng = carry.rng

        # ---- 1. draft re-encode of accepted tokens ----
        pos = st.d_cache_lens[:, None] + jnp.arange(A)[None, :]
        emb = M.embed(params, carry.acc_tokens)
        ca_hi = st.d_cache_lens[:, None] + jnp.arange(A)[None, :]
        llm_k, llm_v, llm_layer = self._llm_ca_args(st)
        h, d_kv_k, d_kv_v = G.glide_forward(
            draft_params, cfg, dcfg, emb, pos,
            st.d_kv_k, st.d_kv_v, st.d_cache_lens,
            llm_k, llm_v, ca_hi,
            attn_impl=ecfg.attn_impl, write_at=st.d_cache_lens,
            tables=st.tables,
            llm_ring_anchors=self._ring, llm_written=st.cache_lens,
            llm_layer=llm_layer)
        d_cache_lens = st.d_cache_lens + jnp.where(carry.done, 0, carry.acc_len)
        root_h = jnp.take_along_axis(h, (carry.acc_len - 1)[:, None, None], axis=1)[:, 0]

        # ---- 2. tree expansion (beam rule) ----
        root_tok = jnp.take_along_axis(carry.acc_tokens, (carry.acc_len - 1)[:, None], 1)[:, 0]
        tree_tokens = jnp.zeros((b, N), jnp.int32).at[:, 0].set(root_tok)
        father = jnp.zeros((b, N), jnp.int32)
        tmask = jnp.zeros((b, N, N), bool).at[:, :, 0].set(True)
        hist_logp = jnp.zeros((b, N), jnp.float32)
        # per-row traced temperature: BOTH the greedy-beam and the
        # i.i.d.-sampled expansion run on the shared draft logp (the heavy
        # matmuls are shared; the extra cost is a top-k per level) and a
        # per-row `where` picks; temp<=0 rows use a safe epsilon divisor and
        # are discarded by the select.
        per_row = ecfg.per_row_temperature
        need_q = per_row or ecfg.temperature > 0.0
        if per_row:
            t_row = jnp.maximum(carry.temps, 1e-6)[:, None]       # [B, 1]
            t_lvl = t_row[:, :, None]                             # [B, 1, 1]
            row_g = carry.temps <= 0.0                            # [B]
        spec_logp = (jnp.zeros((b, N, cfg.vocab_size), jnp.float32)
                     if need_q else None)
        if need_q:
            root_logp = jax.nn.log_softmax(self._draft_logits(params, root_h),
                                           axis=-1)
            spec_logp = spec_logp.at[:, 0].set(root_logp)

        # level 1: T=0 -> top-k of the root distribution (greedy beam);
        # T>0 default ("iid") -> c1 i.i.d. samples from the PROPOSAL
        # distribution q' = softmax(logp / (T * proposal_sharpness)).
        # i.i.d.-from-q' proposals are what makes the residual verification
        # walk (engine/verify.py) EXACTLY target-law — rejection sampling is
        # exact for ANY proposal distribution as long as the verifier's
        # accept ratios use the same q' (verify.py applies the same
        # sharpness). t_proposals="topk" instead takes the top-k of q' —
        # the reference's T>0 behavior (`llama_glide.py:1177-1245`):
        # distinct children (no duplicate-sample waste) but only an
        # approximation of the target law.
        c1 = shape[0]
        ref_topk = ecfg.t_proposals == "topk" and not per_row
        if need_q:
            sharp = ecfg.proposal_sharpness
            logq_root = jax.nn.log_softmax(
                root_logp / ((t_row if per_row else ecfg.temperature)
                             * sharp), -1)
            if ref_topk:
                logp1, ids1 = self._logp_topk(logq_root, c1)
            else:
                rng, k1 = jax.random.split(rng)
                ids1 = jax.random.categorical(
                    k1, jnp.broadcast_to(logq_root[:, None, :],
                                         (b, c1, cfg.vocab_size)),
                    axis=-1).astype(jnp.int32)
                logp1 = jnp.take_along_axis(logq_root, ids1, axis=1)
            if per_row:
                lg_g, id_g = self._logp_topk(root_logp, c1)
                ids1 = jnp.where(row_g[:, None], id_g, ids1)
                logp1 = jnp.where(row_g[:, None], lg_g, logp1)
        else:
            logp1, ids1 = self._beam_topk(params, root_h, c1)
        tree_tokens = jax.lax.dynamic_update_slice(tree_tokens, ids1, (0, 1))
        hist_logp = jax.lax.dynamic_update_slice(hist_logp, logp1, (0, 1))
        diag_idx = jnp.arange(1, 1 + c1)
        tmask = tmask.at[:, diag_idx, diag_idx].set(True)

        # draft-side tree KV buffer: root + all nodes
        root_row = d_cache_lens - 1  # draft POSITION of the root token
        if dcfg.ring_size is not None:
            root_phys = G.ring_index(root_row, dcfg.anchors, dcfg.ring_size)
        else:
            root_phys = root_row

        def gather_row(cache, r):
            # cache [B, Hkv, S, D] -> [B, 1, Hkv, D]
            g = jnp.take_along_axis(cache, r[:, None, None, None], axis=2)
            return g.transpose(0, 2, 1, 3)
        tk = jnp.zeros((b, N, cfg.num_kv_heads, hd), d_kv_k.dtype)
        tv = jnp.zeros_like(tk)
        tk = tk.at[:, :1].set(gather_row(d_kv_k, root_phys))
        tv = tv.at[:, :1].set(gather_row(d_kv_v, root_phys))

        for lvl in range(1, gamma):
            lo, hi = offs[lvl], offs[lvl + 1]
            c_l, c_next = hi - lo, shape[lvl]
            toks_l = jax.lax.dynamic_slice(tree_tokens, (0, lo), (b, c_l))
            pos_l = jnp.broadcast_to((root_row + lvl)[:, None], (b, c_l))
            emb_l = M.embed(params, toks_l)
            sfx_mask = jax.lax.dynamic_slice(tmask, (0, lo, 0), (b, c_l, N))
            h_l, tk, tv = G.glide_forward(
                draft_params, cfg, dcfg, emb_l, pos_l,
                d_kv_k, d_kv_v, root_row,  # prefix excludes root (it's in tk)
                llm_k, llm_v,
                jnp.broadcast_to(st.cache_lens[:, None], (b, c_l)),
                suffix_mask=sfx_mask, attn_impl=ecfg.attn_impl,
                suffix_kv=(tk, tv), suffix_write_offset=lo,
                d_written=d_cache_lens, tables=st.tables,
                llm_ring_anchors=self._ring, llm_written=st.cache_lens,
                llm_layer=llm_layer)
            if need_q:
                logp_l = jax.nn.log_softmax(self._draft_logits(params, h_l),
                                            axis=-1)
                spec_logp = jax.lax.dynamic_update_slice(spec_logp, logp_l, (0, lo, 0))
                logq_l = jax.nn.log_softmax(
                    logp_l / ((t_lvl if per_row else ecfg.temperature)
                              * ecfg.proposal_sharpness), -1)
                hist_lvl = hist_logp[:, lo:hi]                   # [B, c_l]
            if need_q and ref_topk:
                # reference-style T>0 expansion: flat beam top-k over the
                # proposal distribution — same select as the greedy beam,
                # scored on logq' (`llama_glide.py:1064-1067` semantics)
                vals_l, ids_l = self._logp_topk(logq_l, c_next)
                v_flat = (hist_lvl[:, :, None] + vals_l).reshape(
                    b, c_l * c_next)
                i_flat = ids_l.reshape(b, c_l * c_next)
                sel_v, sel = jax.lax.top_k(v_flat, c_next)
                father_l = (sel // c_next).astype(jnp.int32) + lo
                pred = jnp.take_along_axis(i_flat, sel,
                                           axis=1).astype(jnp.int32)
            elif need_q:
                # ---- exact T>0 expansion ----
                # Child counts per node are allocated from PATH weights only
                # (largest-remainder on softmax(hist)), never from the new
                # samples, so conditional on the tree-so-far each node's
                # children are i.i.d. draws from its q' — the premise under
                # which verify_stochastic's residual walk preserves the
                # target law exactly.
                rng, k_tok = jax.random.split(rng)
                t_alloc = jax.nn.softmax(hist_lvl, axis=-1) * c_next
                k_base = jnp.floor(t_alloc)
                rem = (c_next - jnp.sum(k_base, -1)).astype(jnp.int32)  # [B]
                frac = t_alloc - k_base
                rank = jnp.argsort(jnp.argsort(-frac, -1), -1)   # 0 = biggest
                k_j = k_base.astype(jnp.int32) + (rank < rem[:, None])
                cumk = jnp.cumsum(k_j, axis=-1)                  # [B, c_l]
                s_idx = jnp.arange(c_next)[None, None, :]
                father_rel = jnp.sum(cumk[:, :, None] <= s_idx, axis=1)
                father_rel = jnp.minimum(father_rel, c_l - 1).astype(jnp.int32)
                logq_f = jnp.take_along_axis(
                    logq_l, father_rel[:, :, None], axis=1)      # [B, c_next, V]
                pred = jax.random.categorical(k_tok, logq_f,
                                              axis=-1).astype(jnp.int32)
                sel_v = (jnp.take_along_axis(hist_lvl, father_rel, 1) +
                         jnp.take_along_axis(logq_f, pred[:, :, None], -1)[..., 0])
                father_l = father_rel + lo
                if per_row:
                    # greedy-beam expansion on the same logp for temp=0 rows
                    vals_g, ids_g = self._logp_topk(logp_l, c_next)
                    v_flat = (hist_lvl[:, :, None] + vals_g).reshape(
                        b, c_l * c_next)
                    i_flat = ids_g.reshape(b, c_l * c_next)
                    sel_vg, sel = jax.lax.top_k(v_flat, c_next)
                    father_g = (sel // c_next).astype(jnp.int32) + lo
                    pred_g = jnp.take_along_axis(i_flat, sel,
                                                 axis=1).astype(jnp.int32)
                    pred = jnp.where(row_g[:, None], pred_g, pred)
                    father_l = jnp.where(row_g[:, None], father_g, father_l)
                    sel_v = jnp.where(row_g[:, None], sel_vg, sel_v)
            else:
                # greedy beam: per-node top-k then flat top-k (== flat
                # nodes x vocab top-k, `llama_glide.py:1064-1067`; the
                # per-node stage is shard-local under a vocab-sharded head
                # since hist is constant per node: top_k(hist + logp) =
                # hist + top_k(logp))
                vals_l, ids_l = self._beam_topk(params, h_l, c_next)
                v_top = hist_logp[:, lo:hi, None] + vals_l       # [B, c_l, c_next]
                i_top = ids_l
                v_flat = v_top.reshape(b, c_l * c_next)
                i_flat = i_top.reshape(b, c_l * c_next)
                sel_v, sel = jax.lax.top_k(v_flat, c_next)        # [B, c_next]
                father_l = (sel // c_next).astype(jnp.int32) + lo
                pred = jnp.take_along_axis(i_flat, sel, axis=1).astype(jnp.int32)
            nlo = hi
            tree_tokens = jax.lax.dynamic_update_slice(tree_tokens, pred, (0, nlo))
            father = jax.lax.dynamic_update_slice(father, father_l, (0, nlo))
            hist_logp = jax.lax.dynamic_update_slice(hist_logp, sel_v, (0, nlo))
            # new rows = father row + own diagonal
            frows = jnp.take_along_axis(tmask, father_l[:, :, None], axis=1)
            didx = jnp.arange(nlo, nlo + c_next)
            frows = frows.at[:, jnp.arange(c_next), didx].set(True)
            tmask = jax.lax.dynamic_update_slice(tmask, frows, (0, nlo, 0))

        depth = jnp.sum(tmask, axis=-1).astype(jnp.int32) - 1  # [B, N]

        # ---- 3. target verification forward over the tree ----
        # THE shared decode-loop program (_verify_forward): same shape and
        # jaxpr as the vanilla step / chain verify of this engine
        pos_t = st.cache_lens[:, None] + depth
        nu = self._uniform_n
        if nu > N:  # degenerate configs where the chain block exceeds N
            pad = nu - N
            tree_tokens_u = jnp.pad(tree_tokens, ((0, 0), (0, pad)),
                                    constant_values=cfg.eos_token_id)
            pos_u = jnp.pad(pos_t, ((0, 0), (0, pad)),
                            mode="edge")
            tmask_u = jnp.pad(tmask, ((0, 0), (0, pad), (0, pad)))
            tmask_u = tmask_u.at[:, N:, 0].set(True)
        else:
            tree_tokens_u, pos_u, tmask_u = tree_tokens, pos_t, tmask
        lg_all, new_k, new_v = self._verify_forward(
            params, st, tree_tokens_u, pos_u, tmask_u)
        tgt_logits = lg_all[:, :N]          # [B, N, V] fp32
        new_k, new_v = new_k[:, :, :N], new_v[:, :, :N]

        # ---- 4. accept ----
        def greedy_verify():
            tgt_pred = jnp.argmax(tgt_logits, -1).astype(jnp.int32)
            ok = jnp.take_along_axis(tgt_pred, father, axis=1) == tree_tokens
            ok = ok.at[:, 0].set(True)
            n_ok = jnp.sum(tmask & ok[:, None, :], axis=-1)
            valid = n_ok == (depth + 1)
            best = jnp.argmax(valid * jnp.arange(N)[None, :], axis=-1)  # [B]
            acc_num = jnp.take_along_axis(depth, best[:, None], 1)[:, 0] + 1
            path_mask = jnp.take_along_axis(tmask, best[:, None, None], axis=1)[:, 0]
            order_key = jnp.where(path_mask, jnp.arange(N)[None, :], N + 1)
            path_idx = jnp.argsort(order_key, axis=-1)[:, :A]  # [B, A]
            path_idx_c = jnp.minimum(path_idx, N - 1)
            emit = jnp.take_along_axis(tgt_pred, path_idx_c, axis=1)  # [B, A]
            return emit, acc_num, path_idx_c

        if per_row:
            from .verify import verify_stochastic
            emit_g, acc_g, path_g = greedy_verify()
            rng, k_v = jax.random.split(rng)
            emit_s, acc_s, path_s = verify_stochastic(
                tree_tokens, tmask, father, depth, tgt_logits, spec_logp,
                carry.temps, k_v, ecfg)
            emit = jnp.where(row_g[:, None], emit_g, emit_s)
            acc_num = jnp.where(row_g, acc_g, acc_s)
            path_idx_c = jnp.where(row_g[:, None], path_g, path_s)
        elif ecfg.temperature == 0.0:
            emit, acc_num, path_idx_c = greedy_verify()
        else:
            from .verify import verify_stochastic
            rng, k_v = jax.random.split(rng)
            emit, acc_num, path_idx_c = verify_stochastic(
                tree_tokens, tmask, father, depth, tgt_logits, spec_logp,
                ecfg.temperature, k_v, ecfg)

        # ---- 5. commit accepted KV rows for ALL layers ----
        if carry.pend_k is not None:
            # deferred: stash the selected rows; the NEXT round's top flush
            # writes them (see _flush_pending — avoids in-loop cache copies)
            sel_k, sel_v = self._select_rows(new_k, new_v, path_idx_c)
            pend_k = sel_k.astype(carry.pend_k.dtype)
            pend_v = sel_v.astype(carry.pend_v.dtype)
            pend_at = st.cache_lens
            kv_k, kv_v = st.kv_k, st.kv_v
        else:
            pend_k = pend_v = pend_at = None
            kv_k, kv_v = self._commit_rows(st, new_k, new_v, path_idx_c)

        adv = jnp.where(carry.done, 0, acc_num)
        adv, has_eos = _truncate_at_stop(cfg, emit, adv)
        cache_lens = st.cache_lens + adv
        output_ids = _masked_row_write(carry.output_ids, emit, carry.out_len,
                                       carry.done)
        out_len = carry.out_len + adv
        out_buf = carry.output_ids.shape[1]
        done = (carry.done | has_eos | (out_len + A >= out_buf)
                | (out_len >= carry.out_cap))
        count = carry.count + jnp.sum(jnp.where(carry.done, 0, adv - 1))
        num = carry.num + jnp.sum(~carry.done)
        acc_len = jnp.where(done, 1, acc_num)

        st = DecodeState(kv_k, kv_v, d_kv_k, d_kv_v, cache_lens, d_cache_lens,
                         st.tables)
        return GenCarry(st, emit, acc_len, output_ids, out_len, done,
                        count, num, carry.rounds + 1, rng, carry.out_cap,
                        carry.temps, pend_k, pend_v, pend_at)

    # ------------------------------------------------------------------
    # Public generation APIs (timing excludes prefill, like the reference)
    # ------------------------------------------------------------------

    def _get_jit(self, name, fn, donate=()):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn, donate_argnums=donate,
                                            static_argnums=())
        return self._jit_cache[name]

    def _spec_carry(self, state, t0, max_gen_len: int, rng, a_max: int,
                    defer: bool = False):
        cfg = self.cfg
        b = t0.shape[0]
        out_buf = max_gen_len + a_max + 1
        output_ids = jnp.full((b, out_buf), cfg.eos_token_id, jnp.int32)
        output_ids = output_ids.at[:, 0].set(t0)
        acc_tokens = jnp.zeros((b, a_max), jnp.int32).at[:, 0].set(t0)
        pend_k = pend_v = pend_at = None
        if defer:
            # deferred-commit scratch (see _flush_pending): zero rows at
            # cache_lens — the first flush writes junk strictly beyond
            # every k_hi, exactly like unaccepted committed rows
            pdt = self._pend_dt
            pshape = (cfg.num_layers, b, a_max, cfg.num_kv_heads,
                      cfg.head_dim_)
            pend_k = jnp.zeros(pshape, pdt)
            # distinct buffer: jax dedupes identical zeros constants, and a
            # shared buffer donated as both pend_k and pend_v trips
            # "donate the same buffer twice"
            pend_v = pend_k.copy()
            pend_at = state.cache_lens.copy()   # distinct buffer, donated
        return GenCarry(
            state=state, acc_tokens=acc_tokens,
            acc_len=jnp.ones((b,), jnp.int32),
            output_ids=output_ids, out_len=jnp.ones((b,), jnp.int32),
            done=_is_eos(cfg, t0),
            # num counts target rounds x live rows, starting at 0 so the
            # prefill-sampled t0 is excluded — matching the reference metric
            # (`inference_long-bench.py:257-260`) and the vanilla path, whose
            # `num` also excludes t0.
            count=jnp.zeros((), jnp.int32), num=jnp.zeros((), jnp.int32),
            rounds=jnp.zeros((), jnp.int32), rng=rng,
            out_cap=jnp.full((b,), out_buf, jnp.int32),
            temps=(jnp.full((b,), self.ecfg.temperature, jnp.float32)
                   if self.ecfg.per_row_temperature else None),
            pend_k=pend_k, pend_v=pend_v, pend_at=pend_at)

    def _spec_segment(self, round_fn, params, draft_params, carry, limit):
        def cond(c):
            return (~jnp.all(c.done)) & (c.rounds < limit)

        c = jax.lax.while_loop(
            cond, lambda c: round_fn(params, draft_params, c), carry)
        status = c.rounds * 2 + jnp.all(c.done).astype(jnp.int32)
        return c, status

    # max while-loop rounds executed per device dispatch: keeps individual
    # XLA executions to seconds (a single multi-minute execution can trip
    # remote-worker watchdogs and stalls nothing else can preempt).
    segment_rounds: int = 512

    def _run(self, method: str, input_ids, prompt_lens, max_gen_len: int,
             seed: int = 0, state_dtype=jnp.bfloat16,
             s_max: Optional[int] = None, return_state: bool = False):
        """Shared driver. Returns dict with output_ids, count, num, elapsed.

        `return_state=True` adds the final `DecodeState` (key "state") with
        every deferred-commit row FLUSHED — the cache then holds exactly the
        rows `cache_lens` counts (the cross-arm committed-KV law tested by
        tests/test_deferred_commit.py and scripts/bitdiff_arms.py)."""
        cfg, ecfg = self.cfg, self.ecfg
        if ecfg.attn_impl == "paged":
            raise NotImplementedError(
                "paged KV is a SERVING memory model: page tables are per-"
                "admission state owned by serve.SpecServer(kv='paged'); "
                "standalone generate() uses a dense per-row cache — build "
                "the engine with attn_impl='chunked'/'pallas' instead")
        input_ids = jnp.asarray(input_ids, jnp.int32)
        b, s = input_ids.shape
        prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
        n_sp = self._sp_n
        if n_sp > 1:
            if method == "magicdec":
                raise NotImplementedError(
                    "magicdec's sink+recent stream cache is tiny; it is not "
                    "sequence-sharded — run it without attn_impl='sp'")
            # ring prefill needs equal per-shard query slices; pad the prompt
            # buffer (lengths bound what is attended, so pad rows are inert
            # and later cache appends overwrite them)
            pad = (-s) % n_sp
            if pad:
                input_ids = jnp.pad(input_ids, ((0, 0), (0, pad)),
                                    constant_values=cfg.eos_token_id)
                s += pad
        if ecfg.kv_ring is not None and method == "magicdec":
            raise NotImplementedError(
                "magicdec's sink+recent stream cache is already O(window); "
                "run it without kv_ring")
        use_seg_prefill = (ecfg.prefill_seg
                           and (s > ecfg.prefill_seg
                                or ecfg.kv_ring is not None)
                           and method != "magicdec"
                           and isinstance(ecfg.attn_impl, str)
                           and ecfg.attn_impl in ("dense", "chunked",
                                                  "pallas"))
        if use_seg_prefill:
            # pad BEFORE s_max is fixed: padded rows are written into the
            # cache (inert beyond `lengths`, overwritten by decode appends)
            pad = (-s) % ecfg.prefill_seg
            if pad:
                input_ids = jnp.pad(input_ids, ((0, 0), (0, pad)),
                                    constant_values=cfg.eos_token_id)
                s += pad
        if s_max is None:
            s_max = s + max_gen_len + ecfg.tree_size + 8
        if s_max < s + max_gen_len:
            raise ValueError(
                f"s_max={s_max} cannot hold prompt ({s} incl. padding) + "
                f"max_gen_len={max_gen_len}")
        if method == "magicdec":
            # stream cache replaces the draft cache: [L, B, Hkv, S_stream, D]
            sink, win = ecfg.magicdec_sink, ecfg.magicdec_window
            s_stream = sink + win + max_gen_len + ecfg.gamma + 8
            if ecfg.kv_quant == "int8":
                from ..ops.quantkv import alloc_quant_kv
                qshape = (cfg.num_layers, b, cfg.num_kv_heads, s_max,
                          cfg.head_dim_)
                kv_k, kv_v = alloc_quant_kv(qshape), alloc_quant_kv(qshape)
            else:
                kv_k, kv_v = M.alloc_kv_cache(cfg, b, s_max, state_dtype)
            d_shape = (cfg.num_layers, b, cfg.num_kv_heads, s_stream,
                       cfg.head_dim_)
            state = DecodeState(kv_k, kv_v,
                                jnp.zeros(d_shape, state_dtype),
                                jnp.zeros(d_shape, state_dtype),
                                jnp.zeros((b,), jnp.int32),
                                jnp.zeros((b,), jnp.int32))
        else:
            state = self.init_state(b, s_max, state_dtype)
        rng = jax.random.PRNGKey(seed)
        rng, k_pre, k_gen = jax.random.split(rng, 3)

        # donate the freshly-allocated state into prefill: at 32k+ context the
        # target KV cache is GBs and an undonated prefill holds input+output
        # copies live simultaneously (observed RESOURCE_EXHAUSTED on a 16GB
        # chip at ctx 32768 with a 5GB model)
        if method == "magicdec":
            # magicdec's stream-cache build reads the full prefill hidden; it
            # keeps the one-shot path (prefill_seg covers the GLIDE methods)
            prefill = self._get_jit("magicdec_prefill", self._magicdec_prefill,
                                    donate=(3,))
            state, t0, _ = prefill(self.params, input_ids, prompt_lens, state,
                                   k_pre)
        elif use_seg_prefill:
            seg = ecfg.prefill_seg
            group = ecfg.prefill_dispatch_segs or 0
            if group and s // seg > group:
                state, t0, _ = self._prefill_segmented_grouped(
                    self.params, self.draft_params, input_ids, prompt_lens,
                    state, k_pre, seg=seg, group=group)
            else:
                prefill = self._get_jit(
                    ("prefill_seg", seg),
                    functools.partial(self._prefill_segmented_impl, seg=seg),
                    donate=(4,))
                state, t0, _ = prefill(self.params, self.draft_params,
                                       input_ids, prompt_lens, state, k_pre)
        else:
            prefill = self._get_jit("prefill", self._prefill_impl,
                                    donate=(4,))
            state, t0, _ = prefill(self.params, self.draft_params, input_ids,
                                   prompt_lens, state, k_pre)
        np.asarray(t0)  # force full sync (block_until_ready can be a no-op
        # through remote-TPU relays; a host readback is the only hard barrier)

        if method == "vanilla":
            carry = self._vanilla_carry(state, t0, max_gen_len, k_gen)
            # donate the carry: the KV cache inside it updates in place
            # across segment dispatches instead of double-buffering
            seg = self._get_jit(
                ("vanilla_seg", max_gen_len),
                functools.partial(self._vanilla_segment, max_gen_len=max_gen_len),
                donate=(1,))

            def run_seg(carry, limit):
                return seg(self.params, carry, limit)

            carry, elapsed = self._drive(run_seg, carry, max_gen_len)
            st_f, _, output_ids = carry[0], carry[1], carry[2]
            num = carry[5]
            pk, pv, pat = carry[7], carry[8], carry[9]
            if pk is not None:
                # flush the last step's deferred row (see the spec-path
                # flush below) so the final cache is self-consistent
                kv_k, kv_v = self._write_rows_at(st_f, pk, pv, pat)
                st_f = st_f._replace(kv_k=kv_k, kv_v=kv_v)
            n = int(num)
            out = dict(output_ids=np.asarray(output_ids), count=0,
                       num=max(n, 1), elapsed=elapsed, new_tokens=n + b)
            if return_state:
                out["state"] = st_f
            return out

        if method == "chain":
            round_fn, a_max = self._chain_round, ecfg.gamma + 1
        elif method == "magicdec":
            round_fn, a_max = self._magicdec_round, ecfg.gamma + 1
        elif method == "tree":
            round_fn, a_max = self._tree_round, ecfg.tree_depth + 1
        else:
            raise ValueError(f"unknown method {method}")
        # deferred commit (see _flush_pending): tree always verifies via
        # _verify_forward; chain/magicdec only on the uniform-shape path
        # (their non-uniform forward_append already writes before reading)
        defer = method == "tree" or self.ecfg.uniform_decode_shape
        carry = self._spec_carry(state, t0, max_gen_len, k_gen, a_max,
                                 defer=defer)
        seg = self._get_jit((method, "seg"),
                            functools.partial(self._spec_segment, round_fn),
                            donate=(2,))

        def run_seg(carry, limit):
            return seg(self.params, self._decode_draft_params, carry, limit)

        carry, elapsed = self._drive(run_seg, carry, max_gen_len)
        if carry.pend_k is not None:
            # the last round's accepted rows are still in the deferred
            # scratch — flush so the final state's cache actually holds
            # every row cache_lens counts (outside the timed loop; one
            # tiny A-row write). Without this, any future reuse of the
            # post-generate state would read a cache missing its newest
            # rows.
            carry = carry._replace(state=self._flush_pending(carry),
                                   pend_at=carry.state.cache_lens)
        count, num = int(carry.count), int(carry.num)
        # mask junk beyond each row's emitted length with eos
        out_buf = carry.output_ids.shape[1]
        output_ids = jnp.where(jnp.arange(out_buf)[None] < carry.out_len[:, None],
                               carry.output_ids, cfg.eos_token_id)
        out = dict(output_ids=np.asarray(output_ids), count=count,
                   num=num, elapsed=elapsed,
                   new_tokens=int(jnp.sum(carry.out_len)))
        if return_state:
            out["state"] = carry.state
        return out

    def _drive(self, run_seg, carry, max_rounds: int):
        """Dispatch bounded while-loop segments until done; returns
        (final_carry, decode_elapsed_seconds)."""
        t_start = time.perf_counter()
        done_rounds = 0
        while done_rounds < max_rounds:
            limit = min(done_rounds + self.segment_rounds, max_rounds)
            carry, status = run_seg(carry, jnp.int32(limit))
            st = int(status)  # readback barrier per segment
            done_rounds, all_done = st // 2, bool(st % 2)
            if all_done:
                break
        return carry, time.perf_counter() - t_start

    def vanilla_generate(self, input_ids, prompt_lens, max_gen_len=64, seed=0,
                         **kw):
        return self._run("vanilla", input_ids, prompt_lens, max_gen_len, seed, **kw)

    def spec_generate(self, input_ids, prompt_lens, max_gen_len=64, seed=0, **kw):
        return self._run("chain", input_ids, prompt_lens, max_gen_len, seed, **kw)

    def tree_spec_generate(self, input_ids, prompt_lens, max_gen_len=64, seed=0,
                           **kw):
        return self._run("tree", input_ids, prompt_lens, max_gen_len, seed, **kw)

    def magicdec_generate(self, input_ids, prompt_lens, max_gen_len=64, seed=0,
                          **kw):
        """StreamingLLM self-speculation baseline (ref llama_glide.py:776)."""
        return self._run("magicdec", input_ids, prompt_lens, max_gen_len, seed,
                         **kw)
