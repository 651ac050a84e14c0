"""Continuous-batching speculative-decoding server.

TPU-native serving loop over the SpecEngine: a fixed batch of decode SLOTS
(static shapes — XLA compiles the decode segment once), a pluggable
admission queue (fifo / priority / shortest-job-first / bucket-packed —
see `SpecServer._pop_next`), and prefill-and-insert admission: a newly admitted request is
prefetched through the target+draft prefill as a batch-1 call, then its KV
rows, cache lengths, and carry rows are scattered into the live batch at the
free slot index inside one jitted insert. Finished rows (eos / token budget)
are harvested between decode segments and their slots immediately rehost the
next queued request, so the batch stays full under load — the reference has
no serving layer at all (its CLIs decode one fixed batch end-to-end,
`longspec/test/inference_long-bench.py:228-247`); this is the production
counterpart built the way TPU serving stacks structure it (decoupled
prefill/insert/generate on static-shape slot state).

Design notes
  * Slot = KV page. Each slot owns `s_max` rows of target KV + the draft
    ring; admission reuses the slot's buffers in place (no allocation after
    server construction). Per-row `cache_lens` makes the batch ragged.
  * Prefill lengths are bucketed (`prefill_buckets`) so only a handful of
    prefill programs ever compile; prompts pad up to the bucket.
  * The decode segment is the engine's own jitted tree/chain round while-loop
    (`SpecEngine._spec_segment`) — serving adds zero per-round host work.
  * Batched serving wants a SMALLER tree than single-stream decoding: the
    verify forward runs B x tree_size token-rows through the full model, so
    past batch ~2 it turns MXU-compute-bound and tree FLOPs stop being free
    (measured, hard_8k b4 on one v5e: 85-node depth-6 tree 392 tok/s vs
    37-node `tree_shape=(4,8,8,8,8)` 538 tok/s, both lossless — build the
    serving engine with the smaller shape; single-stream rows keep depth 6/7
    where verify is bandwidth-bound and deeper acceptance is free).
  * T=0 output streams are token-exact vs a standalone
    `tree_spec_generate` call for the same prompt (test_serve.py): continuous
    batching changes scheduling, never the emitted law.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..engine.engine import SpecEngine, GenCarry, DecodeState
from ..models import llama as M
from ..models import glide as G


@dataclass
class Request:
    uid: int
    tokens: np.ndarray          # [l] int32 prompt
    max_new_tokens: int
    priority: int = 0           # higher = admitted first (policy="priority")
    # per-request sampling temperature; needs an engine built with
    # per_row_temperature=True (temps is then a traced [B] carry vector, so
    # mixing greedy and stochastic rows never recompiles). None = the
    # engine's ecfg.temperature.
    temperature: Optional[float] = None
    enqueued_s: float = field(default_factory=time.perf_counter)


@dataclass
class Completion:
    uid: int
    tokens: List[int]           # generated tokens (incl. first sampled)
    prompt_len: int
    latency_s: float            # enqueue -> harvest
    finish_reason: str = "stop"  # "stop" (eos) | "length" (token budget)


class SpecServer:
    """Continuous batching over `n_slots` concurrent sequences.

    Usage:
        srv = SpecServer(engine, n_slots=4, s_max=2048)
        srv.submit(prompt_tokens, max_new_tokens=128)
        completions = srv.run()       # drain queue + slots
    or incrementally: `srv.step()` inside a service loop.
    """

    def __init__(self, engine: SpecEngine, n_slots: int, s_max: int,
                 max_new_cap: int = 512, method: str = "tree",
                 prefill_buckets=(128, 512, 2048, 8192),
                 state_dtype=jnp.bfloat16, seed: int = 0,
                 policy: str = "fifo", kv: str = "slots",
                 pool_pages: Optional[int] = None,
                 paging: str = "reserved",
                 profile_phases: bool = False):
        if method == "tree":
            self._round_fn = engine._tree_round
            a_max = engine.ecfg.tree_depth + 1
        elif method == "chain":
            self._round_fn = engine._chain_round
            a_max = engine.ecfg.gamma + 1
        else:
            raise ValueError(f"unknown method {method}")
        self.engine = engine
        self.cfg: ModelConfig = engine.cfg
        self.n_slots = n_slots
        self.s_max = s_max
        self.max_new_cap = max_new_cap
        self.method = method
        self.a_max = a_max
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self.state_dtype = state_dtype
        if policy not in ("fifo", "priority", "sjf", "packed"):
            raise ValueError(f"unknown admission policy {policy!r}")
        self.policy = policy
        # per-phase wall-clock breakdown (stats()["phase_s"]): where does a
        # serve run's time go — admission prefills, decode segments, or
        # host-side harvest? `profile_phases` adds a device sync after
        # admission so its dispatches are charged to "admit" instead of
        # riding into the decode segment timing (slightly perturbs perf;
        # leave off for headline numbers).
        self.profile_phases = profile_phases
        self.phase_s = {"admit": 0.0, "decode": 0.0, "harvest": 0.0}

        # kv="paged": target KV lives in shared page pools; each request's
        # footprint is its USED pages (prompt + generation budget), not a
        # full s_max slot. Needs the engine built with
        # `attn_impl=PagedAttn(page)`; `pool_pages` sizes total physical KV
        # (default: full slot capacity + 1 scratch page, i.e. no
        # overcommit — pass fewer pages to overcommit and let admission
        # queue requests while the pool is full).
        if kv not in ("slots", "paged"):
            raise ValueError(f"unknown kv mode {kv!r}")
        # paging="elastic" (kv="paged" only): admission reserves just the
        # PROMPT pages plus one round's headroom instead of the request's
        # whole token budget; before each decode segment every active row
        # tops up (PagePool.extend) to cover that segment's worst case. On
        # pool exhaustion the MOST RECENTLY admitted active request is
        # PREEMPTED by hibernation: its used pages, draft-cache rows, and
        # carry row are gathered to the host, its pages freed, and the
        # request requeued at the front; restoration scatters the saved
        # state into a free slot later — token-exact by construction (the
        # KV bytes come back identical; nothing is recomputed). Progress is
        # guaranteed: the oldest active request is never the victim, so it
        # can eventually take the whole pool (submit() caps any single
        # request to pool capacity).
        if paging not in ("reserved", "elastic"):
            raise ValueError(f"unknown paging mode {paging!r}")
        if paging == "elastic" and kv != "paged":
            raise ValueError("paging='elastic' requires kv='paged'")
        self.paging = paging
        self.preemptions = 0
        self._hibernated: Dict[int, dict] = {}
        self.kv = kv
        self._pool = None
        if kv == "paged":
            if engine.ecfg.attn_impl != "paged":
                raise ValueError("kv='paged' needs an engine built with "
                                 "attn_impl=ops.pallas_paged.PagedAttn(page)")
            from .paging import PagePool
            page = engine.ecfg.attn_impl.page
            self.page = page
            self.n_chunks = -(-s_max // page)
            self.s_max = s_max = self.n_chunks * page
            if pool_pages is None:
                pool_pages = n_slots * self.n_chunks + 1
            self._pool = PagePool(pool_pages, page)
            # prefix-cache compute reuse is FULL-attention only: the
            # suffix-extend prefill path (paged_prefill_extend /
            # paged_causal_attention) has no window plumbing. Windowed
            # models take the plain admission path instead — paged DECODE
            # supports sliding_window/ca_window fine; only the shared-prefix
            # prefill shortcut is skipped.
            # prefix-cache compute reuse is OFF under int8 KV: a cached
            # prefix is read DEQUANTIZED by the suffix prefill, while an
            # uncached admission attends the fresh full-precision prompt —
            # the two t0 laws would differ, breaking served-vs-standalone
            # token exactness (quantkv.py's contract covers decode reads,
            # where both sides see the same cache)
            self._prefix_ok = (engine.cfg.sliding_window is None
                               and engine.dcfg.ca_window is None
                               and engine.ecfg.kv_quant == "none")
            # reserved scratch page: table rows are padded with it so
            # fixed-width prefill scatters past a request's allocation land
            # in scratch instead of another sequence's page
            self._trash_page = self._pool.alloc(-1, 1)[0]
            state = engine.init_paged_state(n_slots, pool_pages,
                                            self.n_chunks, state_dtype)
            # never-admitted (and harvested) slots still scatter through
            # their table rows each round — point every row at scratch, not
            # at whatever page id 0 belongs to
            state = state._replace(tables=jnp.full(
                (n_slots, self.n_chunks), self._trash_page, jnp.int32))
        else:
            state = engine.init_state(n_slots, s_max, state_dtype)
        eos = jnp.full((n_slots,), self.cfg.eos_token_id, jnp.int32)
        # defer=True: rounds stash accepted KV rows and flush them at the
        # next round's top (engine._flush_pending) — the write-before-read
        # law that keeps the slot caches free of per-step whole-cache
        # copies. Host-side slot surgery compensates: admissions reset the
        # slot's pend_at (stale pend rows then land beyond k_hi), and
        # hibernation flushes before gathering page contents.
        # generate()'s rule: chain's non-uniform forward_append already
        # writes before reading and its round returns pend_*=None — passing
        # defer=True there would change the while_loop carry structure
        # mid-trace (arrays in, None out) and crash
        defer = method == "tree" or engine.ecfg.uniform_decode_shape
        self._carry: GenCarry = engine._spec_carry(
            state, eos, max_new_cap, jax.random.PRNGKey(seed), a_max,
            defer=defer)
        # donate the carry (same cache key as generate()'s segment): the KV
        # slabs update in place across decode segments instead of
        # double-buffering — at serving scale the state is most of HBM
        self._seg = engine._get_jit((method, "seg"), self._segment_fn(),
                                    donate=(2,))

        # host-side slot table: uid or None per slot
        self._slot_uid: List[Optional[int]] = [None] * n_slots
        self._slot_max_new = np.zeros((n_slots,), np.int64)
        self._slot_admit_seq = [0] * n_slots   # admission recency (elastic
        self._admit_seq = 0                    # victim selection)
        self._requests: Dict[int, Request] = {}
        self._queue: List[int] = []
        self._next_uid = 0
        self._t_serve_start: Optional[float] = None
        self.tokens_served = 0
        self.completions_served = 0
        self.prefix_hits = 0            # admissions that reused a prefix
        self.prefix_tokens_reused = 0   # prompt tokens whose prefill was
                                        # skipped via the prefix cache
        self._cancelled: set = set()    # uids cancelled while active

    # -- jitted helpers -------------------------------------------------

    def _segment_fn(self):
        import functools
        return functools.partial(self.engine._spec_segment, self._round_fn)

    def _insert_body(self):
        """Pure insert logic (slots mode), shared by the fused admission."""
        eos = self.cfg.eos_token_id
        per_row = self.engine.ecfg.per_row_temperature
        from ..engine.engine import _sample_rows

        def impl(carry, pst, t0, slot, max_new, temp, logits0, rng):
                st = carry.state
                upd = jax.lax.dynamic_update_index_in_dim

                def upd_kv(c, p):
                    # target caches may be QuantKV (kv_quant="int8"): the
                    # batch axis (1) indexes both the int8 rows and their
                    # scales, so the slot scatter applies to each leaf
                    from ..ops.quantkv import QuantKV
                    if isinstance(c, QuantKV):
                        return QuantKV(upd(c.qv, p.qv[:, 0], slot, 1),
                                       upd(c.scale, p.scale[:, 0], slot, 1))
                    return upd(c, p[:, 0], slot, 1)

                state = DecodeState(
                    kv_k=upd_kv(st.kv_k, pst.kv_k),
                    kv_v=upd_kv(st.kv_v, pst.kv_v),
                    d_kv_k=upd(st.d_kv_k, pst.d_kv_k[0], slot, 0),
                    d_kv_v=upd(st.d_kv_v, pst.d_kv_v[0], slot, 0),
                    cache_lens=st.cache_lens.at[slot].set(pst.cache_lens[0]),
                    d_cache_lens=st.d_cache_lens.at[slot].set(
                        pst.d_cache_lens[0]),
                )
                if per_row:
                    # the shared prefill sampled t0 at the ENGINE temperature;
                    # resample this request's first token at ITS temperature
                    t = _sample_rows(logits0, rng, temp[None])[0]
                else:
                    t = t0[0]
                acc_row = jnp.zeros((carry.acc_tokens.shape[1],),
                                    jnp.int32).at[0].set(t)
                out_row = jnp.full((carry.output_ids.shape[1],), eos,
                                   jnp.int32).at[0].set(t)
                kw = {}
                if per_row:
                    kw["temps"] = carry.temps.at[slot].set(temp)
                if carry.pend_k is not None:
                    # stale pend rows of whoever held this slot must land
                    # beyond the new request's k_hi, never inside its prompt
                    kw["pend_at"] = carry.pend_at.at[slot].set(
                        pst.cache_lens[0])
                return carry._replace(
                    state=state,
                    acc_tokens=carry.acc_tokens.at[slot].set(acc_row),
                    acc_len=carry.acc_len.at[slot].set(1),
                    output_ids=carry.output_ids.at[slot].set(out_row),
                    out_len=carry.out_len.at[slot].set(1),
                    done=carry.done.at[slot].set(t == eos),
                    # per-row budget: the decode loop parks this row as done
                    # the moment it has emitted max_new tokens, so cache
                    # writes never outrun submit()'s capacity reservation
                    out_cap=carry.out_cap.at[slot].set(max_new),
                    **kw,
                )

        return impl

    def _insert_paged_body(self, bucket: int):
        """Pure insert logic (paged mode): scatter the dense batch-1
        prefill's first `bucket` KV rows into the pools through this
        request's page table. Rows past the allocation land in the scratch
        page (trow padding)."""
        eos = self.cfg.eos_token_id
        per_row = self.engine.ecfg.per_row_temperature
        from ..ops.pallas_paged import write_paged_rows
        from ..engine.engine import _sample_rows

        def impl(carry, pst, t0, slot, max_new, trow, temp, logits0, rng):
                st = carry.state
                upd = jax.lax.dynamic_update_index_in_dim
                from ..ops.quantkv import QuantKV
                kk, vv = pst.kv_k, pst.kv_v

                def rows(c):
                    # [L, 1, Hkv, bucket, D] -> [L, 1, bucket, Hkv, D];
                    # QuantKV rows pass through VERBATIM (already-quantized
                    # ints + scales scatter bit-exact into the pool — no
                    # dequant->requant round-trip, which is NOT a fixed
                    # point for scales at the 1-ulp level)
                    if isinstance(c, QuantKV):
                        return QuantKV(
                            c.qv[:, :, :, :bucket].transpose(0, 1, 3, 2, 4),
                            c.scale[:, :, :, :bucket].transpose(0, 1, 3, 2))
                    return c[:, :, :, :bucket].transpose(0, 1, 3, 2, 4)

                rk, rv = rows(kk), rows(vv)
                tables = st.tables.at[slot].set(trow)
                t1 = tables[slot][None]              # [1, n_chunks]
                z = jnp.zeros((1,), jnp.int32)
                wr = jax.vmap(write_paged_rows, in_axes=(0, 0, None, None))
                state = DecodeState(
                    kv_k=wr(st.kv_k, rk, t1, z),
                    kv_v=wr(st.kv_v, rv, t1, z),
                    d_kv_k=upd(st.d_kv_k, pst.d_kv_k[0], slot, 0),
                    d_kv_v=upd(st.d_kv_v, pst.d_kv_v[0], slot, 0),
                    cache_lens=st.cache_lens.at[slot].set(pst.cache_lens[0]),
                    d_cache_lens=st.d_cache_lens.at[slot].set(
                        pst.d_cache_lens[0]),
                    tables=tables,
                )
                if per_row:
                    t = _sample_rows(logits0, rng, temp[None])[0]
                else:
                    t = t0[0]
                acc_row = jnp.zeros((carry.acc_tokens.shape[1],),
                                    jnp.int32).at[0].set(t)
                out_row = jnp.full((carry.output_ids.shape[1],), eos,
                                   jnp.int32).at[0].set(t)
                kw = {}
                if per_row:
                    kw["temps"] = carry.temps.at[slot].set(temp)
                if carry.pend_k is not None:
                    kw["pend_at"] = carry.pend_at.at[slot].set(
                        pst.cache_lens[0])
                return carry._replace(
                    state=state,
                    acc_tokens=carry.acc_tokens.at[slot].set(acc_row),
                    acc_len=carry.acc_len.at[slot].set(1),
                    output_ids=carry.output_ids.at[slot].set(out_row),
                    out_len=carry.out_len.at[slot].set(1),
                    done=carry.done.at[slot].set(t == eos),
                    out_cap=carry.out_cap.at[slot].set(max_new),
                    **kw,
                )

        return impl

    def _admit_fused(self, carry: GenCarry, padded: np.ndarray, l: int,
                     slot: int, max_new: int, temp: float, uid: int,
                     trow=None):
        """One-dispatch admission: zero the persistent batch-1 prefill
        buffers, run the target+draft prefill, and scatter the result into
        `slot` — all inside a single jitted call (per prefill bucket). The
        unfused path was 3 dispatches (zero / prefill / insert); each
        dispatch costs real wall time on a remote-TPU tunnel, and admission
        happens on the serving latency path."""
        eng = self.engine
        if not hasattr(self, "_pstate"):
            self._pstate = eng.init_state(1, self.s_max, self.state_dtype)
            self._admit_jit = {}
        bucket = padded.shape[1]
        paged = trow is not None
        key = (bucket, paged)
        if key not in self._admit_jit:
            ins = (self._insert_paged_body(bucket) if paged
                   else self._insert_body())

            def impl(params, dparams, carry, pstate, tokens, length, slot,
                     max_new, temp, rng, *t_args):
                pstate = jax.tree_util.tree_map(jnp.zeros_like, pstate)
                pst, t0, logits0 = eng._prefill_impl(
                    params, dparams, tokens, length, pstate, rng)
                k_ins = jax.random.fold_in(rng, 1)
                if paged:
                    carry = ins(carry, pst, t0, slot, max_new, t_args[0],
                                temp, logits0, k_ins)
                else:
                    carry = ins(carry, pst, t0, slot, max_new, temp,
                                logits0, k_ins)
                return carry, pst

            self._admit_jit[key] = jax.jit(impl, donate_argnums=(2, 3))
        rng = jax.random.fold_in(jax.random.PRNGKey(17), uid)
        t_args = (jnp.asarray(trow, jnp.int32),) if paged else ()
        carry, self._pstate = self._admit_jit[key](
            eng.params, eng.draft_params, carry, self._pstate,
            jnp.asarray(padded), jnp.asarray([l], jnp.int32),
            jnp.int32(slot), jnp.int32(max_new), jnp.float32(temp),
            rng, *t_args)
        return carry

    def _req_temp(self, req: Request) -> float:
        t = req.temperature
        return float(self.engine.ecfg.temperature if t is None else t)

    def _bucketize(self, n: int) -> int:
        b = next((b for b in self.prefill_buckets if b >= n),
                 self.prefill_buckets[-1])
        return min(max(b, n), self.s_max)

    def _admit_prefix(self, slot: int, uid: int, req: Request, s0: int):
        """Prefix-cache admission: the first s0 prompt tokens' KV already
        sits in shared pages, so only the SUFFIX runs the L-layer target
        prefill (`paged_prefill_extend`, writing straight into the pool);
        the single-layer draft re-prefills the full prompt (its cache is
        per-request) with cross-attention reading the pooled target KV."""
        eng = self.engine
        cfg, dcfg, ecfg = eng.cfg, eng.dcfg, eng.ecfg
        l = len(req.tokens)
        fbucket = self._bucketize(l)
        sbucket = self._bucketize(l - s0)
        full = np.zeros((1, fbucket), np.int32)
        full[0, :l] = req.tokens
        sfx = np.zeros((1, sbucket), np.int32)
        sfx[0, :l - s0] = req.tokens[s0:]
        trow = self._pool.table(uid, self.n_chunks, pad=self._trash_page)

        if not hasattr(self, "_admit_prefix_jit"):
            self._admit_prefix_jit = {}
        key = (fbucket, sbucket)
        if key not in self._admit_prefix_jit:
            from ..engine.engine import _sample, _sample_rows
            per_row = ecfg.per_row_temperature

            def impl(carry, full, sfx, l, s0, trow, slot, max_new, rng, temp):
                st = carry.state
                tables = st.tables.at[slot].set(trow)
                t1 = trow[None]
                h_sfx, kv_k, kv_v = M.paged_prefill_extend(
                    eng.params, cfg, sfx, s0[None], t1, st.kv_k, st.kv_v)
                last_h = jax.lax.dynamic_index_in_dim(
                    h_sfx[0], l - s0 - 1, axis=0, keepdims=False)
                logits0 = M.logits_at(eng.params, last_h[None])
                if per_row:
                    t = _sample_rows(logits0, rng, temp[None])[0]
                else:
                    t = _sample(logits0, rng, ecfg.temperature)[0]
                # draft: full-prompt prefill (1 layer), CA over pooled KV
                emb = M.embed(eng.params, full)
                positions = jnp.broadcast_to(
                    jnp.arange(fbucket)[None], (1, fbucket))
                dz = jnp.zeros((1,) + st.d_kv_k.shape[1:], st.d_kv_k.dtype)
                _, d_k, d_v = G.glide_prefill(
                    eng.draft_params, cfg, dcfg, emb, positions, l[None],
                    dz, dz, kv_k[-1], kv_v[-1], attn_impl=ecfg.attn_impl,
                    tables=t1)
                upd = jax.lax.dynamic_update_index_in_dim
                state = DecodeState(
                    kv_k=kv_k, kv_v=kv_v,
                    d_kv_k=upd(st.d_kv_k, d_k[0], slot, 0),
                    d_kv_v=upd(st.d_kv_v, d_v[0], slot, 0),
                    cache_lens=st.cache_lens.at[slot].set(l),
                    d_cache_lens=st.d_cache_lens.at[slot].set(l),
                    tables=tables,
                )
                eos = cfg.eos_token_id
                acc_row = jnp.zeros((carry.acc_tokens.shape[1],),
                                    jnp.int32).at[0].set(t)
                out_row = jnp.full((carry.output_ids.shape[1],), eos,
                                   jnp.int32).at[0].set(t)
                kw = {}
                if per_row:
                    kw["temps"] = carry.temps.at[slot].set(temp)
                if carry.pend_k is not None:
                    kw["pend_at"] = carry.pend_at.at[slot].set(l)
                return carry._replace(
                    state=state,
                    acc_tokens=carry.acc_tokens.at[slot].set(acc_row),
                    acc_len=carry.acc_len.at[slot].set(1),
                    output_ids=carry.output_ids.at[slot].set(out_row),
                    out_len=carry.out_len.at[slot].set(1),
                    done=carry.done.at[slot].set(t == eos),
                    out_cap=carry.out_cap.at[slot].set(max_new),
                    **kw,
                )

            self._admit_prefix_jit[key] = jax.jit(impl, donate_argnums=(0,))

        rng = jax.random.fold_in(jax.random.PRNGKey(17), uid)
        self._carry = self._admit_prefix_jit[key](
            self._carry, jnp.asarray(full), jnp.asarray(sfx),
            jnp.int32(l), jnp.int32(s0), jnp.asarray(trow, jnp.int32),
            jnp.int32(slot), jnp.int32(req.max_new_tokens), rng,
            jnp.float32(self._req_temp(req)))

    def _flush_pend(self):
        """Write every slot's pending (deferred-commit) KV rows into the
        cache NOW. Idempotent: re-flushing writes the same rows at the same
        positions. Needed before host-side reads of cache contents
        (hibernation); admissions instead neutralize the slot's pend_at."""
        if self._carry.pend_k is None:
            return
        if not hasattr(self, "_flush_jit"):
            def impl(carry):
                return carry._replace(
                    state=self.engine._flush_pending(carry))
            self._flush_jit = jax.jit(impl, donate_argnums=(0,))
        self._carry = self._flush_jit(self._carry)

    def _finish_slot(self, carry: GenCarry, slot):
        if not hasattr(self, "_finish_jit"):
            self._finish_jit = jax.jit(
                lambda c, s: c._replace(done=c.done.at[s].set(True)),
                donate_argnums=(0,))
        return self._finish_jit(carry, jnp.int32(slot))

    def _retable(self, slot, row_or_page):
        """Point slot's table row at `row_or_page` ([n_chunks] row or a
        scalar page id broadcast across the row)."""
        if not hasattr(self, "_retable_jit"):
            self._retable_jit = jax.jit(
                lambda c, s, p: c._replace(state=c.state._replace(
                    tables=c.state.tables.at[s].set(p))),
                donate_argnums=(0,))
        return self._retable_jit(self._carry, jnp.int32(slot),
                                 jnp.asarray(row_or_page, jnp.int32))

    # -- elastic paging: hibernate / restore / per-segment top-up --------

    def _gather_slot(self, slot, trow_k: np.ndarray) -> dict:
        """Pull one slot's decode state to the host: the CONTENTS of its
        USED pages only (`trow_k`: host-side page ids, power-of-two
        bucketed so jit specializations stay bounded — a preemption's
        device->host traffic scales with the request's usage, not s_max),
        draft-cache rows, and carry row — everything needed to resume the
        request bit-exact in any slot later."""
        if not hasattr(self, "_gather_jit"):
            def impl(carry, slot, trow):
                st = carry.state
                from ..ops.quantkv import QuantKV

                def take_pages(c):
                    # QuantKV pools hibernate as (int8 rows, scales) — the
                    # restore is bit-exact either way
                    if isinstance(c, QuantKV):
                        return {"qv": jnp.take(c.qv, trow, axis=1),
                                "scale": jnp.take(c.scale, trow, axis=1)}
                    return jnp.take(c, trow, axis=1)

                out = dict(
                    pages_k=take_pages(st.kv_k),
                    pages_v=take_pages(st.kv_v),
                    d_k=st.d_kv_k[slot], d_v=st.d_kv_v[slot],
                    cache_len=st.cache_lens[slot],
                    d_cache_len=st.d_cache_lens[slot],
                    acc_tokens=carry.acc_tokens[slot],
                    acc_len=carry.acc_len[slot],
                    output_ids=carry.output_ids[slot],
                    out_len=carry.out_len[slot],
                    out_cap=carry.out_cap[slot],
                    done=carry.done[slot],
                )
                if carry.temps is not None:
                    out["temp"] = carry.temps[slot]
                return out

            self._gather_jit = jax.jit(impl)
        sv = self._gather_jit(self._carry, jnp.int32(slot),
                              jnp.asarray(trow_k, jnp.int32))
        return jax.tree.map(np.asarray, sv)

    def _restore_slot(self, sv: dict, slot: int, trow: np.ndarray,
                      ids: np.ndarray):
        """Scatter a hibernated request back: saved page contents into the
        freshly allocated pages (`ids`, trash-padded to the saved bucket
        width so surplus saved buckets land in scratch), slot rows into the
        carry, and the FULL table row onto the slot."""
        if not hasattr(self, "_restore_jit"):
            def impl(carry, sv, slot, trow, ids):
                st = carry.state
                upd = jax.lax.dynamic_update_index_in_dim
                from ..ops.quantkv import QuantKV

                def put_pages(c, saved):
                    if isinstance(c, QuantKV):
                        return QuantKV(c.qv.at[:, ids].set(saved["qv"]),
                                       c.scale.at[:, ids].set(saved["scale"]))
                    return c.at[:, ids].set(saved)

                state = DecodeState(
                    kv_k=put_pages(st.kv_k, sv["pages_k"]),
                    kv_v=put_pages(st.kv_v, sv["pages_v"]),
                    d_kv_k=upd(st.d_kv_k, sv["d_k"], slot, 0),
                    d_kv_v=upd(st.d_kv_v, sv["d_v"], slot, 0),
                    cache_lens=st.cache_lens.at[slot].set(sv["cache_len"]),
                    d_cache_lens=st.d_cache_lens.at[slot].set(
                        sv["d_cache_len"]),
                    tables=st.tables.at[slot].set(trow),
                )
                kw = {}
                if carry.temps is not None:
                    kw["temps"] = carry.temps.at[slot].set(sv["temp"])
                if carry.pend_k is not None:
                    kw["pend_at"] = carry.pend_at.at[slot].set(
                        sv["cache_len"])
                return carry._replace(
                    state=state,
                    acc_tokens=carry.acc_tokens.at[slot].set(sv["acc_tokens"]),
                    acc_len=carry.acc_len.at[slot].set(sv["acc_len"]),
                    output_ids=carry.output_ids.at[slot].set(sv["output_ids"]),
                    out_len=carry.out_len.at[slot].set(sv["out_len"]),
                    done=carry.done.at[slot].set(sv["done"]),
                    out_cap=carry.out_cap.at[slot].set(sv["out_cap"]),
                    **kw)

            self._restore_jit = jax.jit(impl, donate_argnums=(0,))
        self._carry = self._restore_jit(
            self._carry, jax.tree.map(jnp.asarray, sv),
            jnp.int32(slot), jnp.asarray(trow, jnp.int32),
            jnp.asarray(ids, jnp.int32))

    def _hibernate(self, slot: int):
        """Preempt the request in `slot`: save its state to the host, free
        its pages, park the slot on scratch, requeue the uid at the FRONT."""
        uid = self._slot_uid[slot]
        self._flush_pend()   # the slot's last accepted rows are still
                             # pending; its saved pages must be complete
        pages = self._pool.pages_of(uid)
        k = 1
        while k < len(pages):
            k *= 2
        k = min(k, self.n_chunks)
        trow_k = (pages + [self._trash_page] * k)[:k]
        self._hibernated[uid] = self._gather_slot(slot, trow_k)
        self._slot_uid[slot] = None
        self._carry = self._finish_slot(self._carry, slot)
        self._carry = self._retable(slot, self._trash_page)
        self._pool.free(uid)
        self._queue.insert(0, uid)
        self.preemptions += 1

    def _preempt_youngest(self, protect_slot: int) -> bool:
        """Hibernate the most recently ADMITTED active request that is
        younger than `protect_slot`'s (never an older one — the oldest
        request must always be able to finish). Returns False if no such
        victim exists."""
        mine = self._slot_admit_seq[protect_slot]
        victims = [s for s in range(self.n_slots)
                   if self._slot_uid[s] is not None and s != protect_slot
                   and self._slot_admit_seq[s] > mine]
        if not victims:
            return False
        self._hibernate(max(victims, key=lambda s: self._slot_admit_seq[s]))
        return True

    def _topup(self, rounds: int):
        """Elastic paging: before a decode segment, grow every active row's
        allocation to cover the segment's worst-case token writes (rounds x
        a_max per row, capped at the request's remaining budget). On pool
        exhaustion, preempt younger rows; a row that cannot be satisfied
        even then hibernates ITSELF (resumes when pages free up)."""
        lens = np.asarray(self._carry.state.cache_lens)
        for slot in range(self.n_slots):
            uid = self._slot_uid[slot]
            if uid is None:
                continue
            req = self._requests[uid]
            full = (len(req.tokens) + req.max_new_tokens + self.a_max + 8)
            want = min(int(lens[slot]) + rounds * self.a_max + 8, full)
            cur = self._pool.len_of(uid)
            if want <= cur:
                continue
            while True:
                try:
                    fresh = self._pool.extend(uid, want - cur)
                    break
                except MemoryError:
                    if not self._preempt_youngest(slot):
                        self._hibernate(slot)
                        fresh = None
                        break
            if fresh:
                self._carry = self._retable(
                    slot, self._pool.table(uid, self.n_chunks,
                                           pad=self._trash_page))

    # -- public API -----------------------------------------------------

    def submit(self, tokens, max_new_tokens: int = 128,
               priority: int = 0,
               temperature: Optional[float] = None) -> int:
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        ecfg = self.engine.ecfg
        if temperature is not None:
            if float(temperature) < 0.0:
                raise ValueError("temperature must be >= 0")
            if not ecfg.per_row_temperature \
                    and float(temperature) != ecfg.temperature:
                raise ValueError(
                    f"this server decodes at temperature {ecfg.temperature} "
                    f"(compiled in); build the engine with "
                    f"per_row_temperature=True for per-request sampling")
        if len(tokens) + max_new_tokens + self.a_max + 8 > self.s_max:
            raise ValueError(f"prompt {len(tokens)} + max_new {max_new_tokens}"
                             f" exceeds slot capacity {self.s_max}")
        if self._pool is not None:
            # a request that can never fit the pool would requeue forever
            need = -(-(len(tokens) + max_new_tokens + self.a_max + 8)
                     // self.page)
            usable = self._pool.n_pages - 1  # minus the scratch page
            if need > usable:
                raise ValueError(f"request needs {need} pages but the pool "
                                 f"holds only {usable} usable pages")
        uid = self._next_uid
        self._next_uid += 1
        req = Request(uid=uid, tokens=tokens, priority=priority,
                      max_new_tokens=min(max_new_tokens, self.max_new_cap),
                      temperature=temperature)
        self._requests[uid] = req
        self._queue.append(uid)
        return uid

    def _pop_next(self) -> int:
        """Pick the next queued uid under the admission policy.

        * ``fifo``     — arrival order (default).
        * ``priority`` — highest `priority=` first; FIFO within a level.
        * ``sjf``      — shortest prompt first (minimizes head-of-line
          blocking and mean latency under mixed lengths).
        * ``packed``   — context-length-aware packing: prefer the LONGEST
          queued prompt that still fits the smallest already-compiled
          prefill bucket among queued prompts, so admissions reuse compiled
          programs and pad the least (falls back to sjf ordering when all
          candidates share a bucket).
        """
        q = self._queue
        if self.policy == "fifo":
            return q.pop(0)
        reqs = self._requests
        if self.policy == "priority":
            # max priority; earliest submit breaks ties (uid is monotone)
            uid = max(q, key=lambda u: (reqs[u].priority, -u))
        elif self.policy == "sjf":
            uid = min(q, key=lambda u: (len(reqs[u].tokens), u))
        else:  # packed
            def bucket_of(l):
                return next((b for b in self.prefill_buckets if b >= l), l)
            uid = min(q, key=lambda u: (bucket_of(len(reqs[u].tokens)),
                                        -len(reqs[u].tokens), u))
        q.remove(uid)
        return uid

    @property
    def active_slots(self) -> int:
        return sum(u is not None for u in self._slot_uid)

    @property
    def pending(self) -> int:
        return len(self._queue)

    def _admit(self):
        """Fill free slots from the queue (one fused prefill+insert
        dispatch per admitted request)."""
        for slot in range(self.n_slots):
            if self._slot_uid[slot] is not None or not self._queue:
                continue
            uid = self._pop_next()
            req = self._requests[uid]
            l = len(req.tokens)
            if uid in self._hibernated:
                # preempted request: restore its saved pages/state verbatim
                sv = self._hibernated[uid]
                need = int(sv["cache_len"]) + self.a_max + 8
                if not self._pool.can_alloc(need):
                    self._queue.insert(0, uid)
                    break
                self._hibernated.pop(uid)
                pages_new = self._pool.alloc(uid, need)
                trow = self._pool.table(uid, self.n_chunks,
                                        pad=self._trash_page)
                # saved bucket i holds logical chunk i; scatter into the new
                # page ids (surplus saved buckets -> scratch; new pages past
                # the saved data are written by decode before any read)
                pk = sv["pages_k"]  # ndarray, or {qv, scale} under QuantKV
                k_s = int((pk["qv"] if isinstance(pk, dict) else pk).shape[1])
                ids = (list(pages_new) + [self._trash_page] * k_s)[:k_s]
                self._restore_slot(sv, slot, trow, np.asarray(ids, np.int32))
                self._slot_uid[slot] = uid
                self._slot_max_new[slot] = req.max_new_tokens
                self._admit_seq += 1
                self._slot_admit_seq[slot] = self._admit_seq
                continue
            shared_s0 = 0
            if self._pool is not None:
                # paged: reserve this request's capacity — the WHOLE token
                # budget under paging="reserved" (cannot deadlock; holds the
                # budget for the request's lifetime), or just the prompt +
                # one round's headroom under "elastic" (top-up per segment,
                # preemption under pressure). If the pool is full, requeue
                # and wait for a harvest to free pages.
                # Prefix cache: page-aligned prompt prefixes already resident
                # (live or LRU-retained) are SHARED — refcount instead of
                # fresh pages, and their L-layer prefill is skipped below.
                need = l + req.max_new_tokens + self.a_max + 8
                if self.paging == "elastic":
                    need = l + self.a_max + 8
                m_pages, shared = (self._pool.match_prefix(req.tokens)
                                   if self._prefix_ok else (0, []))
                if not self._pool.can_alloc_shared(shared, need):
                    self._queue.insert(0, uid)
                    break
                self._pool.alloc_shared(uid, shared, need)
                shared_s0 = m_pages * self.page
                self.prefix_hits += m_pages > 0
                self.prefix_tokens_reused += shared_s0
            if shared_s0 > 0:
                self._admit_prefix(slot, uid, req, shared_s0)
                self._pool.register(uid, req.tokens)
                self._slot_uid[slot] = uid
                self._slot_max_new[slot] = req.max_new_tokens
                self._admit_seq += 1
                self._slot_admit_seq[slot] = self._admit_seq
                continue
            bucket = next((b for b in self.prefill_buckets if b >= l),
                          self.prefill_buckets[-1])
            if bucket < l:
                bucket = l  # oversize prompt: dedicated compile
            # the persistent prefill state has s_max rows; a bucket past it
            # would shape-mismatch the KV write (submit() already guarantees
            # l + budget fits, so min() keeps bucket >= l)
            bucket = min(bucket, self.s_max)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, :l] = req.tokens
            tval = self._req_temp(req)
            if self._pool is not None:
                trow = self._pool.table(uid, self.n_chunks,
                                        pad=self._trash_page)
                self._carry = self._admit_fused(self._carry, padded, l, slot,
                                                req.max_new_tokens, tval, uid,
                                                trow=trow)
                if self._prefix_ok:
                    self._pool.register(uid, req.tokens)
            else:
                self._carry = self._admit_fused(self._carry, padded, l, slot,
                                                req.max_new_tokens, tval, uid)
            self._slot_uid[slot] = uid
            self._slot_max_new[slot] = req.max_new_tokens
            self._admit_seq += 1
            self._slot_admit_seq[slot] = self._admit_seq

    def _finalize_slots(self, finish_mask: np.ndarray,
                        retable_mask: np.ndarray):
        """One dispatch finishing + (paged) scratch-retabling a set of
        slots, instead of two dispatches per harvested slot."""
        if not hasattr(self, "_finalize_jit"):
            paged = self._pool is not None
            trash = self._trash_page if paged else 0

            def impl(c, fmask, rmask):
                c = c._replace(done=c.done | fmask)
                if paged:
                    tables = jnp.where(rmask[:, None], jnp.int32(trash),
                                       c.state.tables)
                    c = c._replace(state=c.state._replace(tables=tables))
                return c

            self._finalize_jit = jax.jit(impl, donate_argnums=(0,))
        return self._finalize_jit(self._carry, jnp.asarray(finish_mask),
                                  jnp.asarray(retable_mask))

    def _harvest(self) -> List[Completion]:
        """Collect finished rows; free their slots."""
        # small vectors first; the [n_slots, max_new_cap] output buffer only
        # crosses the tunnel when at least one slot is actually harvestable
        # (the common no-op tick stays one small transfer — ADVICE r2)
        done, out_len = jax.device_get(
            (self._carry.done, self._carry.out_len))
        harvestable = any(
            self._slot_uid[s] is not None
            and (done[s] or int(out_len[s]) >= self._slot_max_new[s])
            for s in range(self.n_slots))
        if not harvestable:
            return []
        outs = jax.device_get(self._carry.output_ids)
        finished = []
        finish_mask = np.zeros((self.n_slots,), bool)
        retable_mask = np.zeros((self.n_slots,), bool)
        freed_uids = []
        for slot in range(self.n_slots):
            uid = self._slot_uid[slot]
            if uid is None:
                continue
            n_emit = int(out_len[slot])
            hit_budget = n_emit >= self._slot_max_new[slot]
            if not (done[slot] or hit_budget):
                continue
            if not done[slot]:
                finish_mask[slot] = True
            row = outs[slot][:n_emit]
            stop_ids = (self.cfg.eos_token_id,
                        *self.cfg.extra_eos_token_ids)
            eos_pos = np.nonzero(np.isin(row, stop_ids))[0]
            stop = eos_pos[0] if len(eos_pos) else n_emit
            # "stop" only if the eos landed WITHIN the budget; an eos past
            # max_new is cut by the budget and the client should continue
            stopped = len(eos_pos) > 0 and stop < self._slot_max_new[slot]
            # budget bound: max_new generated tokens total (t0 counts)
            row = row[:min(stop, self._slot_max_new[slot])].tolist()
            req = self._requests.pop(uid)
            if uid in self._cancelled:
                self._cancelled.discard(uid)
                reason = "cancelled"
            else:
                reason = "stop" if stopped else "length"
            finished.append(Completion(
                uid=uid, tokens=row, prompt_len=len(req.tokens),
                latency_s=time.perf_counter() - req.enqueued_s,
                finish_reason=reason))
            self._slot_uid[slot] = None
            if self._pool is not None:
                # retarget the slot's table at the scratch page BEFORE the
                # pages are freed: done rows still scatter KV through their
                # table every round (the jitted commit has no done mask), and
                # a stale row would corrupt pages reallocated to another slot
                retable_mask[slot] = True
                freed_uids.append(uid)
            self.tokens_served += len(row)
            self.completions_served += 1
        if finish_mask.any() or retable_mask.any():
            self._carry = self._finalize_slots(finish_mask, retable_mask)
        for uid in freed_uids:
            self._pool.free(uid)
        return finished

    def cancel(self, uid: int) -> bool:
        """Stop a request early. Queued: dropped outright (no pages were
        reserved yet). Active: its row is marked done, so the next harvest
        emits the tokens generated so far with finish_reason="cancelled" —
        the remaining decode budget is returned to the batch immediately.
        Returns False for unknown/finished uids."""
        if uid in self._queue:
            self._queue.remove(uid)
            self._requests.pop(uid, None)
            self._hibernated.pop(uid, None)
            return True
        for slot in range(self.n_slots):
            if self._slot_uid[slot] == uid:
                self._carry = self._finish_slot(self._carry, slot)
                self._cancelled.add(uid)
                return True
        return False

    def partials(self) -> Dict[int, List[int]]:
        """Tokens emitted so far for every ACTIVE request (one device
        readback of the output rows) — streaming front-ends poll this
        between `step()` calls. Trimming (stop tokens, budget) matches the
        final `_harvest` result, so a stream's concatenation equals the
        completion."""
        out_len = np.asarray(self._carry.out_len)
        outs = np.asarray(self._carry.output_ids)
        stop_ids = (self.cfg.eos_token_id, *self.cfg.extra_eos_token_ids)
        res: Dict[int, List[int]] = {}
        for slot in range(self.n_slots):
            uid = self._slot_uid[slot]
            if uid is None:
                continue
            row = outs[slot][:int(out_len[slot])]
            hits = np.nonzero(np.isin(row, stop_ids))[0]
            stop = hits[0] if len(hits) else len(row)
            res[uid] = row[:min(stop, self._slot_max_new[slot])].tolist()
        return res

    def step(self, rounds: int = 16) -> List[Completion]:
        """One scheduler tick: admit, decode up to `rounds` spec rounds,
        harvest. Returns completions that finished this tick."""
        if self._t_serve_start is None:
            self._t_serve_start = time.perf_counter()
        t0 = time.perf_counter()
        self._admit()
        if self.paging == "elastic" and self.active_slots:
            self._topup(rounds)
        if self.profile_phases:
            jax.device_get(self._carry.rounds)   # charge admit's dispatches
        t1 = time.perf_counter()
        self.phase_s["admit"] += t1 - t0
        if self.active_slots:
            limit = self._carry.rounds + rounds
            self._carry, status = self._seg(
                self.engine.params, self.engine._decode_draft_params,
                self._carry, limit)
            int(status)  # host readback barrier
        t2 = time.perf_counter()
        self.phase_s["decode"] += t2 - t1
        out = self._harvest()
        self.phase_s["harvest"] += time.perf_counter() - t2
        return out

    def run(self, rounds_per_step: int = 16) -> List[Completion]:
        """Drain the queue and all active slots; returns all completions."""
        out = []
        while self._queue or self.active_slots:
            out.extend(self.step(rounds_per_step))
        return out

    def stats(self) -> dict:
        elapsed = (time.perf_counter() - self._t_serve_start
                   if self._t_serve_start else 0.0)
        out = {
            "tokens_served": self.tokens_served,
            "completions": self.completions_served,
            "elapsed_s": round(elapsed, 3),
            "tok_s": round(self.tokens_served / elapsed, 2) if elapsed else 0.0,
            "pending": self.pending,
            "active_slots": self.active_slots,
        }
        out["phase_s"] = {k: round(v, 3) for k, v in self.phase_s.items()}
        if self._pool is not None:
            out["pool"] = self._pool.stats()
            out["prefix_hits"] = self.prefix_hits
            out["prefix_tokens_reused"] = self.prefix_tokens_reused
            out["paging"] = self.paging
            out["preemptions"] = self.preemptions
            out["hibernated"] = len(self._hibernated)
        return out
