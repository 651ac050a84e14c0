"""Paged KV: the paged flash-decode kernel must match the contiguous-cache
kernel/oracle exactly for any page placement, and the allocator must account
pages correctly across alloc/extend/free cycles."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.ops.pallas_decode import flash_decode
from longspec_tpu.ops.pallas_paged import paged_flash_decode, write_paged_rows
from longspec_tpu.serve.paging import PagePool


def scatter_to_pool(dense_k, pool_shape, tables, lens, page):
    """Place dense [B, Hkv, S, D] rows into a randomized page pool."""
    b, hkv, s, d = dense_k.shape
    pool = np.zeros(pool_shape, dense_k.dtype)
    for i in range(b):
        for chunk in range(-(-int(lens[i]) // page)):
            lo = chunk * page
            hi = min(lo + page, int(lens[i]))
            pool[tables[i, chunk], :, :hi - lo] = dense_k[i, :, lo:hi]
    return pool


@pytest.mark.parametrize("window,anchors", [(None, 0), (12, 2)])
def test_paged_matches_contiguous(window, anchors):
    rng = np.random.default_rng(0)
    B, T, H, Hkv, D, page = 3, 2, 4, 2, 32, 16
    lens = np.array([40, 17, 64], np.int32)
    S = 64
    n_chunks = S // page
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    q_pos = np.stack([lens + t for t in range(T)], 1).astype(np.int32)

    # randomized page placement
    n_pages = 16
    pool = PagePool(n_pages, page)
    order = rng.permutation(B)
    for uid in order:          # allocation order shuffled across sequences
        pool.alloc(int(uid), int(lens[uid]))
    tables = pool.batch_table(range(B), n_chunks)
    k_pool = scatter_to_pool(k, (n_pages, Hkv, page, D), tables, lens, page)
    v_pool = scatter_to_pool(v, (n_pages, Hkv, page, D), tables, lens, page)

    o_ref, lse_ref = flash_decode(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(lens),
                                  jnp.asarray(q_pos), window=window,
                                  anchors=anchors, chunk=page)
    o_p, lse_p = paged_flash_decode(jnp.asarray(q), jnp.asarray(k_pool),
                                    jnp.asarray(v_pool), jnp.asarray(tables),
                                    jnp.asarray(lens), jnp.asarray(q_pos),
                                    window=window, anchors=anchors)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_ref),
                               rtol=1e-5, atol=1e-5)


def test_write_paged_rows_roundtrip():
    rng = np.random.default_rng(1)
    B, T, Hkv, D, page = 2, 5, 2, 16, 8
    n_pages, n_chunks = 8, 4
    pool = PagePool(n_pages, page)
    starts = np.array([6, 13], np.int32)
    for uid in range(B):
        pool.alloc(uid, int(starts[uid]) + T)
    tables = jnp.asarray(pool.batch_table(range(B), n_chunks))
    new = rng.normal(size=(B, T, Hkv, D)).astype(np.float32)
    k_pool = jnp.zeros((n_pages, Hkv, page, D), jnp.float32)
    k_pool = write_paged_rows(k_pool, jnp.asarray(new), tables,
                              jnp.asarray(starts))
    # read back through the logical mapping
    kp = np.asarray(k_pool)
    tb = np.asarray(tables)
    for b in range(B):
        for t in range(T):
            pos = int(starts[b]) + t
            got = kp[tb[b, pos // page], :, pos % page]
            np.testing.assert_array_equal(got, new[b, t])


def test_paged_decode_after_write():
    """End-to-end: prefill rows written page-wise, then decode reads them."""
    rng = np.random.default_rng(2)
    B, Hkv, H, D, page = 2, 2, 4, 32, 16
    lens = np.array([23, 37], np.int32)
    n_chunks, n_pages = 4, 10
    pool = PagePool(n_pages, page)
    for uid in range(B):
        pool.alloc(uid, int(lens[uid]))
    tables = jnp.asarray(pool.batch_table(range(B), n_chunks))

    S = int(lens.max())
    k = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    k_pool = jnp.zeros((n_pages, Hkv, page, D), jnp.float32)
    v_pool = jnp.zeros((n_pages, Hkv, page, D), jnp.float32)
    # write per-sequence (ragged) as prefill would: all rows at offset 0
    for b in range(B):
        rows_k = k[b, :, :lens[b]].transpose(1, 0, 2)[None]   # [1, T, Hkv, D]
        rows_v = v[b, :, :lens[b]].transpose(1, 0, 2)[None]
        k_pool = write_paged_rows(k_pool, jnp.asarray(rows_k),
                                  tables[b:b + 1], jnp.zeros((1,), jnp.int32))
        v_pool = write_paged_rows(v_pool, jnp.asarray(rows_v),
                                  tables[b:b + 1], jnp.zeros((1,), jnp.int32))

    q = rng.normal(size=(B, 1, H, D)).astype(np.float32)
    # mask dense cache beyond each row's len (flash_decode bounds by lens)
    o_ref, _ = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(lens), chunk=page)
    o_p, _ = paged_flash_decode(jnp.asarray(q), k_pool, v_pool, tables,
                                jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)


def test_page_pool_accounting():
    pool = PagePool(6, 8)
    a = pool.alloc(0, 17)           # 3 pages
    assert len(a) == 3 and pool.free_pages == 3
    b = pool.alloc(1, 1)            # 1 page
    assert pool.free_pages == 2
    fresh = pool.extend(0, 7)       # 17 -> 24: still 3 pages
    assert fresh == [] and pool.free_pages == 2
    fresh = pool.extend(0, 1)       # 25 tokens -> 4 pages
    assert len(fresh) == 1 and pool.free_pages == 1
    assert not pool.can_alloc(9)    # needs 2 pages, 1 free
    with pytest.raises(MemoryError):
        pool.alloc(2, 9)
    pool.free(0)
    assert pool.free_pages == 5
    assert pool.can_alloc(33)
    tab = pool.table(1, 4)
    assert tab.shape == (4,) and tab.dtype == np.int32
    assert (tab == tab[0]).all()    # 1 page + clamp padding
    pool.free(1)
    assert pool.free_pages == 6
    with pytest.raises(KeyError):
        pool.alloc(5, 8), pool.alloc(5, 8)


def test_pool_stats_lifecycle():
    from longspec_tpu.serve.paging import PagePool
    pool = PagePool(n_pages=8, page=4)
    pool.alloc(1, 10)          # 3 pages
    pool.alloc(2, 4)           # 1 page
    s = pool.stats()
    assert s["used_pages"] == 4 and s["live_seqs"] == 2
    assert s["peak_used_pages"] == 4 and s["allocs"] == 2
    assert s["waste_tokens"] == (12 - 10) + 0
    pool.extend(1, 3)          # 13 tokens -> 4 pages (one fresh)
    assert pool.stats()["extends"] == 1
    pool.free(1)
    s = pool.stats()
    assert s["used_pages"] == 1 and s["frees"] == 1
    assert s["pages_cycled"] == 5 and s["reuse_factor"] == round(5 / 8, 4)
    # pages are recycled: a new alloc reuses the freed ids
    pool.alloc(3, 28)          # 7 pages == everything free
    s = pool.stats()
    assert s["used_pages"] == 8 and s["utilization"] == 1.0
    assert s["pages_cycled"] == 12 and s["peak_used_pages"] == 8


# ---------------------------------------------------------------------------
# Paged SERVING: the engine decode loop over pooled KV (attn_impl=PagedAttn)
# ---------------------------------------------------------------------------

def _paged_fixture(page=16):
    from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.ops.pallas_paged import PagedAttn
    cfg = tiny_test(vocab_size=151, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    dcfg = DraftConfig(window=8)
    dense = SpecEngine(params, dparams, cfg, dcfg,
                       EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                    attn_impl="dense"))
    paged = SpecEngine(params, dparams, cfg, dcfg,
                       EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                    attn_impl=PagedAttn(page)))
    return cfg, dense, paged


def _standalone(eng, toks, max_new):
    out = eng.tree_spec_generate(np.asarray([toks]),
                                 np.asarray([len(toks)], np.int32),
                                 max_gen_len=max_new, state_dtype=jnp.float32)
    keep = []
    for t in out["output_ids"][0][:max_new]:
        if int(t) == eng.cfg.eos_token_id:
            break
        keep.append(int(t))
    return keep


def test_paged_server_token_exact():
    """Continuous batching over POOLED KV emits exactly the dense engine's
    tokens — page indirection changes memory layout, never the law."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture()
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, cfg.vocab_size, (l,)).tolist()
               for l in (11, 7, 19, 13)]
    uids = [srv.submit(p, 12) for p in prompts]
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    for uid, p in zip(uids, prompts):
        assert comps[uid].tokens == _standalone(dense, p, 12), uid
    st = srv.stats()["pool"]
    assert st["reuse_factor"] > 0 and st["frees"] == len(prompts)


def test_paged_pool_overcommit_queues():
    """A pool SMALLER than n_slots x slot capacity: admission waits for
    pages instead of crashing, every request still completes exactly."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture()
    # each request needs ceil((l + 12 + 4 + 8)/16) <= 3 pages; 4 pages total
    # (+1 scratch) => only one request resident at a time despite 2 slots
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     pool_pages=5, prefill_buckets=(32,),
                     state_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(2, cfg.vocab_size, (l,)).tolist()
               for l in (9, 14, 12)]
    uids = [srv.submit(p, 12) for p in prompts]
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    assert sorted(comps) == sorted(uids)
    for uid, p in zip(uids, prompts):
        assert comps[uid].tokens == _standalone(dense, p, 12), uid
    assert srv.stats()["pool"]["peak_used_pages"] <= 4


def test_paged_engine_standalone_generate_rejected():
    """Standalone generate() has no page tables — must fail loudly, not
    silently decode garbage."""
    _, _, paged = _paged_fixture()
    with pytest.raises(NotImplementedError, match="paged"):
        paged.tree_spec_generate(np.zeros((1, 8), np.int32),
                                 np.asarray([8], np.int32), max_gen_len=4)


def test_paged_freed_slot_table_cannot_corrupt_reused_pages():
    """Two requests finish in the same harvest; their pages are immediately
    reallocated to a third admitted into the OTHER slot. The idle slot's
    jitted rounds still scatter KV through its table every round — harvest
    must retarget it at the scratch page or the third request's KV gets
    silently corrupted (regression)."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture(page=8)
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    rng = np.random.default_rng(13)
    # r1/r2: short, finish together; r3: long prompt spanning many pages so
    # a stale write at r2's old offsets would land inside r3's prompt KV
    short = [rng.integers(2, cfg.vocab_size, (6,)).tolist() for _ in range(2)]
    long_p = rng.integers(2, cfg.vocab_size, (60,)).tolist()
    uids = [srv.submit(p, 4) for p in short] + [srv.submit(long_p, 16)]
    comps = {c.uid: c for c in srv.run(rounds_per_step=2)}
    assert sorted(comps) == sorted(uids)
    assert comps[uids[2]].tokens == _standalone(dense, long_p, 16)
    for uid, p in zip(uids[:2], short):
        assert comps[uid].tokens == _standalone(dense, p, 4), uid


def test_paged_submit_rejects_over_pool():
    """A request that could never fit the pool must be rejected at submit
    instead of spinning in the admission queue forever (regression)."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture()
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     pool_pages=5, prefill_buckets=(32,),
                     state_dtype=jnp.float32)
    with pytest.raises(ValueError, match="pool"):
        srv.submit(list(range(2, 62)), 12)   # needs 6 pages, 4 usable


# ---------------------------------------------------------------------------
# Prefix caching: page-aligned prompt-prefix KV shared across requests
# ---------------------------------------------------------------------------

def _run_one(srv, prompt, max_new):
    uid = srv.submit(prompt, max_new)
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    return comps[uid].tokens


def test_prefix_cache_exact_and_counted():
    """Requests sharing a system prompt: later ones skip the shared pages'
    target prefill (compute reuse) and still emit exactly the dense
    engine's tokens; divergent branches only share the common pages."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture(page=8)
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     prefill_buckets=(16, 32, 64), state_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    sys_p = rng.integers(2, cfg.vocab_size, (26,)).tolist()   # 3 full pages
    tails = [rng.integers(2, cfg.vocab_size, (k,)).tolist() for k in (7, 11)]
    for tail in tails:
        p = sys_p + tail
        assert _run_one(srv, p, 10) == _standalone(dense, p, 10)
    st = srv.stats()
    assert st["prefix_hits"] == 1 and st["prefix_tokens_reused"] == 24
    # divergence in page 2: only the first 2 pages (16 tokens) shareable
    div = sys_p[:17] + rng.integers(2, cfg.vocab_size, (14,)).tolist()
    assert _run_one(srv, div, 10) == _standalone(dense, div, 10)
    assert srv.stats()["prefix_tokens_reused"] == 24 + 16


def test_prefix_cache_concurrent_refcount():
    """Two LIVE requests share prefix pages (refcount 2); the first
    finishing must not free pages the second still reads."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture(page=8)
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     prefill_buckets=(16, 32, 64), state_dtype=jnp.float32)
    rng = np.random.default_rng(9)
    sys_p = rng.integers(2, cfg.vocab_size, (20,)).tolist()   # 2 full pages
    warm = sys_p + rng.integers(2, cfg.vocab_size, (5,)).tolist()
    _run_one(srv, warm, 4)  # registers the prefix
    p1 = sys_p + rng.integers(2, cfg.vocab_size, (6,)).tolist()
    p2 = sys_p + rng.integers(2, cfg.vocab_size, (9,)).tolist()
    u1 = srv.submit(p1, 4)      # short: finishes first
    u2 = srv.submit(p2, 20)     # long: keeps reading the shared pages
    comps = {c.uid: c for c in srv.run(rounds_per_step=2)}
    assert comps[u1].tokens == _standalone(dense, p1, 4)
    assert comps[u2].tokens == _standalone(dense, p2, 20)
    assert srv.stats()["prefix_hits"] == 2


def test_prefix_cache_eviction_under_pressure():
    """An undersized pool evicts LRU cached prefixes for fresh requests;
    matching degrades gracefully and output stays exact."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_fixture(page=8)
    srv = SpecServer(paged, n_slots=1, s_max=96, max_new_cap=32, kv="paged",
                     pool_pages=8, prefill_buckets=(16, 32, 64),
                     state_dtype=jnp.float32)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(2, cfg.vocab_size, (24,)).tolist()
               for _ in range(3)]            # distinct prompts, 3 pages each
    for p in prompts:                        # churn forces evictions
        assert _run_one(srv, p, 8) == _standalone(dense, p, 8)
    st = srv.stats()["pool"]
    assert st["evictions"] > 0
    # the LAST prompt's pages may still be cached: rerunning it hits
    p = prompts[-1]
    assert _run_one(srv, p, 8) == _standalone(dense, p, 8)
    assert srv.stats()["prefix_hits"] >= 1
