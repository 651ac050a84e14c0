"""Constant-memory draft KV ring buffer (DraftConfig.ring_size).

The draft only attends `window` recent rows + `anchors`, so its cache can be
O(window) instead of O(context) — the design SURVEY §7.1.4 calls for (the
reference allocates a full-length draft buffer it never reads outside the
window, `llama_glide.py:223-224`). Emitted tokens at T=0 are structurally
identical to the full-buffer layout: the draft only shapes PROPOSALS, and the
ring holds exactly the window-visible rows.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine


def test_ring_position_recovery():
    """ring_positions inverts ring_index for every reachable position."""
    anchors, ring = 2, 12
    w = ring - anchors
    for d_len in (0, 1, 2, 3, ring, ring + 1, 37, 100):
        pos, valid = G.ring_positions(jnp.asarray(d_len), anchors, ring)
        pos, valid = np.asarray(pos), np.asarray(valid)
        # every position in the live window maps to a row that reports it
        live = [p for p in range(d_len) if p < anchors or p >= d_len - w]
        for p in live:
            r = int(G.ring_index(jnp.asarray(p), anchors, ring))
            # p is only recoverable if no LATER position claimed its row
            later = [q for q in live if q > p
                     and int(G.ring_index(jnp.asarray(q), anchors, ring)) == r]
            if not later:
                assert valid[r] and pos[r] == p, (d_len, p, r, pos[r])
        # rows never written are invalid
        for r in range(ring):
            if not valid[r]:
                assert pos[r] >= d_len


def test_ring_write_then_recover():
    """ring_write lands rows where ring_positions says they live."""
    anchors, ring = 1, 16
    B, Hkv, D, T = 2, 2, 4, 3
    cache = jnp.zeros((B, Hkv, ring, D))
    rng = np.random.default_rng(0)
    vals = {}
    write_at = np.zeros((B,), np.int64)
    for step in range(9):
        new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
        cache = G.ring_write(cache, new, jnp.asarray(write_at, jnp.int32),
                             anchors)
        for b in range(B):
            for j in range(T):
                vals[(b, int(write_at[b]) + j)] = np.asarray(new[b, j])
        write_at += T
    pos, valid = G.ring_positions(jnp.asarray(write_at, jnp.int32), anchors,
                                  ring)
    pos, valid = np.asarray(pos), np.asarray(valid)
    for b in range(B):
        for r in range(ring):
            if valid[b, r]:
                want = vals[(b, pos[b, r])]
                got = np.asarray(cache[b, :, r, :]).transpose(0, 1)
                np.testing.assert_allclose(got, want.transpose(0, 1))


@pytest.mark.parametrize("method", ["vanilla_generate", "spec_generate",
                                    "tree_spec_generate"])
def test_ring_emits_identical_tokens(method):
    """Ring-buffer vs full-length draft cache: emitted T=0 stream identical
    (long enough generation to wrap the ring several times)."""
    cfg = tiny_test(vocab_size=211, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="dense")
    eng_full = SpecEngine(params, dparams, cfg, DraftConfig(window=8,
                                                            anchors=2), ecfg)
    eng_ring = SpecEngine(params, dparams, cfg,
                          DraftConfig(window=8, anchors=2, ring_size=28), ecfg)
    rng = np.random.default_rng(5)
    B, S = 2, 21
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 6], np.int32)
    out_f = getattr(eng_full, method)(toks, lens, max_gen_len=40,
                                      state_dtype=jnp.float32)
    out_r = getattr(eng_ring, method)(toks, lens, max_gen_len=40,
                                      state_dtype=jnp.float32)
    assert np.array_equal(out_f["output_ids"][:, :38],
                          out_r["output_ids"][:, :38]), method
    # draft cache is ring-sized, not context-sized
    st = eng_ring.init_state(B, 256)
    assert st.d_kv_k.shape[2] == 28
    assert eng_ring.init_state(B, 256).kv_k.shape[3] >= 256


def test_ring_size_validation():
    cfg = tiny_test()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    with pytest.raises(ValueError, match="ring_size"):
        SpecEngine(params, dparams, cfg,
                   DraftConfig(window=64, ring_size=16), EngineConfig())


def test_ring_requires_window():
    """ring_size with a full-attention draft (window=None) must be rejected:
    eviction would silently amputate context the draft is supposed to see."""
    cfg = tiny_test(vocab_size=97, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    with pytest.raises(ValueError, match="window"):
        SpecEngine(params, dparams, cfg,
                   dcfg=DraftConfig(window=None, ring_size=64),
                   ecfg=EngineConfig(attn_impl="dense"))
