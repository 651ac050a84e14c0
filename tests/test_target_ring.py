"""O(window) TARGET ring cache (EngineConfig.kv_ring, ops/ring_cache.py).

Gates: (1) the ring-chunked attention law equals the dense recovered-
position oracle; (2) a kv_ring engine's vanilla decode emits the SAME
tokens as the full-length-cache engine (the window makes evicted rows
unreachable, so the ring is semantically invisible); (3) T=0 losslessness
within the ring engine (tree == chain == vanilla); (4) capacity/compose
validation errors. The reference has no equivalent — its 262k-context
registry entries assume a full-length fp16 cache on an 80GB GPU.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine
from longspec_tpu.ops import ring_cache as rc


def test_ring_chunked_matches_dense_oracle():
    rng = np.random.default_rng(0)
    b, tq, h, hkv, d, ring, anchors = 2, 5, 4, 2, 16, 48, 3
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    d_len = jnp.asarray([90, 31], jnp.int32)         # one row wrapped, one not
    q_pos = jnp.asarray([[90 + i for i in range(tq)],
                         [31 + i for i in range(tq)]], jnp.int32)
    k_hi = jnp.minimum(q_pos + 1, d_len[:, None])
    for window in (16, 40):
        o1, l1 = rc.ring_prefix_attention(q, ck, cv, k_hi, q_pos, d_len,
                                          window, anchors)
        o2, l2 = rc.ring_chunked_prefix_attention(q, ck, cv, k_hi, q_pos,
                                                  d_len, window, anchors,
                                                  chunk=16)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=1e-5, rtol=1e-5)
        lf = np.nan_to_num(np.asarray(l2 - l1), posinf=0, neginf=0)
        assert np.max(np.abs(lf)) < 1e-5


def test_ring_chunked_qblock_split_exact(monkeypatch):
    """Large query batches (prefill segments) split into TQ_BLOCK q-blocks
    inside ring_chunked_prefix_attention; the split must be exact incl.
    uneven tails."""
    monkeypatch.setattr(rc, "TQ_BLOCK", 8)
    rng = np.random.default_rng(2)
    b, tq, h, hkv, d, ring, anchors = 2, 21, 4, 2, 16, 48, 3
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    d_len = jnp.asarray([77, 30], jnp.int32)
    q_pos = jnp.asarray([[56 + i for i in range(tq)],
                         [9 + i for i in range(tq)]], jnp.int32)
    k_hi = jnp.minimum(q_pos + 1, d_len[:, None])
    o1, l1 = rc.ring_prefix_attention(q, ck, cv, k_hi, q_pos, d_len, 20, anchors)
    o2, l2 = rc.ring_chunked_prefix_attention(q, ck, cv, k_hi, q_pos, d_len,
                                              20, anchors, chunk=16)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=1e-5, rtol=1e-5)


def _engines(kv_ring, seed=0, attn="chunked"):
    cfg = dataclasses.replace(tiny_test(vocab_size=211, num_layers=2),
                              sliding_window=24, attn_sinks=2)
    dcfg = DraftConfig(window=8, ca_window=24, ca_anchors=2)
    params = M.init_params(jax.random.PRNGKey(seed), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(seed + 1), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3), gamma=2, attn_impl=attn,
                        prefill_seg=16, kv_ring=kv_ring)
    return SpecEngine(params, dparams, cfg, dcfg, ecfg)


@pytest.mark.parametrize("method", ["vanilla_generate", "tree_spec_generate",
                                    "spec_generate"])
def test_ring_engine_matches_full_cache(method):
    lin = _engines(None)
    ring = _engines(80)
    rng = np.random.default_rng(3)
    B, S = 2, 50                        # pads to 64 = 4 segments
    toks = rng.integers(2, 211, (B, S))
    lens = np.array([S, S - 13], np.int32)
    a = getattr(lin, method)(toks, lens, max_gen_len=16,
                             state_dtype=jnp.float32)
    b = getattr(ring, method)(toks, lens, max_gen_len=16,
                              state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(a["output_ids"][:, :n], b["output_ids"][:, :n]), \
        (a["output_ids"][:, :n], b["output_ids"][:, :n])


def test_ring_engine_lossless_t0():
    ring = _engines(80, seed=7)
    rng = np.random.default_rng(5)
    B, S = 2, 70                        # wraps the 80-row ring mid-prompt
    toks = rng.integers(2, 211, (B, S))
    lens = np.array([S, S - 9], np.int32)
    v = ring.vanilla_generate(toks, lens, max_gen_len=16,
                              state_dtype=jnp.float32)
    t = ring.tree_spec_generate(toks, lens, max_gen_len=16,
                                state_dtype=jnp.float32)
    c = ring.spec_generate(toks, lens, max_gen_len=16,
                           state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(v["output_ids"][:, :n], t["output_ids"][:, :n])
    assert np.array_equal(v["output_ids"][:, :n], c["output_ids"][:, :n])


def test_ring_validation():
    with pytest.raises(ValueError, match="sliding window"):
        cfg = tiny_test(vocab_size=101, num_layers=2)
        SpecEngine(M.init_params(jax.random.PRNGKey(0), cfg),
                   G.init_draft_params(jax.random.PRNGKey(1), cfg), cfg,
                   DraftConfig(window=8),
                   EngineConfig(tree_shape=(2, 2), prefill_seg=16,
                                kv_ring=64))
    with pytest.raises(ValueError, match="safe minimum"):
        _engines(40)                    # too small for window 24 + seg 16
    with pytest.raises(ValueError, match="prefill_seg"):
        cfg = dataclasses.replace(tiny_test(vocab_size=101, num_layers=2),
                                  sliding_window=24, attn_sinks=2)
        SpecEngine(M.init_params(jax.random.PRNGKey(0), cfg),
                   G.init_draft_params(jax.random.PRNGKey(1), cfg), cfg,
                   DraftConfig(window=8, ca_window=24, ca_anchors=2),
                   EngineConfig(tree_shape=(2, 2), kv_ring=128))


def test_ring_flash_kernel_matches_oracle():
    """pallas_decode.flash_decode(ring=True) — in-kernel position recovery —
    must match the dense recovered-position oracle, wrapped and unwrapped,
    with and without a window, batch-ragged d_len."""
    rng = np.random.default_rng(5)
    b, tq, h, hkv, d, ring, anchors = 2, 5, 4, 2, 128, 48, 3
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    d_len = jnp.asarray([90, 31], jnp.int32)         # wrapped / not wrapped
    q_pos = jnp.asarray([[90 + i for i in range(tq)],
                         [31 + i for i in range(tq)]], jnp.int32)
    k_hi = jnp.minimum(q_pos + 1, d_len[:, None])
    for window in (16, 40, None):
        o1, l1 = rc.ring_prefix_attention(q, ck, cv, k_hi, q_pos, d_len,
                                          window, anchors)
        o2, l2 = rc.ring_attention(q, ck, cv, k_hi, q_pos, d_len, window,
                                   anchors, impl="pallas")
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=2e-5, rtol=2e-5, err_msg=str(window))
        lf = np.nan_to_num(np.asarray(l2 - l1), posinf=0, neginf=0)
        assert np.max(np.abs(lf)) < 2e-5, window


def test_ring_flash_kernel_qsplit_exact():
    """The flash ring path must stay exact through flash_decode's R_MAX
    query-split (the segmented-prefill shape: T >> R_MAX/G)."""
    from longspec_tpu.ops import pallas_decode as PD
    rng = np.random.default_rng(6)
    b, tq, h, hkv, d, ring, anchors = 1, 24, 4, 2, 128, 64, 2
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.float32)
    ck = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, hkv, ring, d)), jnp.float32)
    d_len = jnp.asarray([150], jnp.int32)
    q_pos = jnp.asarray([[126 + i for i in range(tq)]], jnp.int32)
    k_hi = jnp.minimum(q_pos + 1, d_len[:, None])
    o1, l1 = rc.ring_prefix_attention(q, ck, cv, k_hi, q_pos, d_len,
                                      40, anchors)
    old = PD.R_MAX
    try:
        PD.R_MAX = 16                       # force the lax.map split path
        o2, l2 = PD.flash_decode(q, ck, cv, k_hi, q_pos, 40, anchors,
                                 ring=True, d_len=d_len)
    finally:
        PD.R_MAX = old
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("method", ["vanilla_generate", "tree_spec_generate"])
def test_ring_engine_pallas_matches_chunked(method):
    """A kv_ring engine under attn_impl=pallas (interpret on CPU) must emit
    the same tokens as under chunked — the whole-engine gate that the
    kernel's recovery law composes with segmented prefill + decode."""
    eng_c = _engines(160, attn="chunked")
    eng_p = _engines(160, attn="pallas")
    rng = np.random.default_rng(11)
    B, S = 2, 40
    toks = rng.integers(2, 211, (B, S))
    lens = np.array([S, S - 9], np.int32)
    a = getattr(eng_c, method)(toks, lens, max_gen_len=16,
                               state_dtype=jnp.float32)
    b = getattr(eng_p, method)(toks, lens, max_gen_len=16,
                               state_dtype=jnp.float32)
    assert np.array_equal(a["output_ids"][:, :16], b["output_ids"][:, :16])


def test_ring_write_gather_matches_scatter():
    """_ring_write_gather (large-T fast path) must leave the ring in the
    bit-identical state the scatter form produces: unwrapped, wrapped,
    T > capacity (self-eviction within one call), ragged valid prefixes."""
    rng = np.random.default_rng(13)
    b, hkv, ring, d, a = 2, 2, 48, 16, 3
    for t, w_at, use_valid in [(16, [0, 0], False), (16, [40, 7], False),
                               (60, [5, 90], False), (24, [30, 61], True)]:
        cache = jnp.asarray(rng.standard_normal((b, hkv, ring, d)),
                            jnp.float32)
        new = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
        wa = jnp.asarray(w_at, jnp.int32)
        valid = None
        if use_valid:
            lens = wa + jnp.asarray([t, t - 9], jnp.int32)
            valid = (wa[:, None] + jnp.arange(t)[None, :]) < lens[:, None]
        sc = rc.ring_write(cache, new, wa, a, valid=valid)
        ga = rc._ring_write_gather(cache, new, wa, a, valid=valid)
        np.testing.assert_array_equal(np.asarray(sc), np.asarray(ga),
                                      err_msg=f"t={t} w_at={w_at}")
