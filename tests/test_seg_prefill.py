"""Segmented prompt prefill (EngineConfig.prefill_seg): O(segment) memory
prefill for contexts whose one-shot activations exceed HBM (the 131k/262k
bench rows). Each segment writes its KV rows first, then attends the cache
under a per-query causal bound — no O(T^2) suffix term.

Gates: segment-vs-one-shot equivalence (same tokens out, same cache
contents) on ragged batches, across dense draft cache / ring draft cache /
int8 target KV; and the T=0 losslessness invariant with segmentation on.
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


def _pair(seed=0, vocab=211):
    cfg = tiny_test(vocab_size=vocab, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(seed), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(seed + 1), cfg)
    return cfg, params, dparams


def _engines(cfg, params, dparams, seg, dcfg=None, **ekw):
    dcfg = dcfg or DraftConfig(window=8)
    base = SpecEngine(params, dparams, cfg, dcfg,
                      EngineConfig(tree_shape=(2, 3), gamma=2,
                                   attn_impl="dense", **ekw))
    segd = SpecEngine(params, dparams, cfg, dcfg,
                      EngineConfig(tree_shape=(2, 3), gamma=2,
                                   attn_impl="dense", prefill_seg=seg, **ekw))
    return base, segd


@pytest.mark.parametrize("method", ["vanilla_generate", "tree_spec_generate",
                                    "spec_generate"])
def test_segmented_prefill_matches_one_shot(method):
    cfg, params, dparams = _pair()
    base, segd = _engines(cfg, params, dparams, seg=16)
    rng = np.random.default_rng(1)
    B, S = 2, 50                    # not a multiple of seg: exercises padding
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 13], np.int32)   # ragged
    a = getattr(base, method)(toks, lens, max_gen_len=16,
                              state_dtype=jnp.float32)
    b = getattr(segd, method)(toks, lens, max_gen_len=16,
                              state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(a["output_ids"][:, :n], b["output_ids"][:, :n]), \
        (a["output_ids"][:, :n], b["output_ids"][:, :n])


def test_segmented_prefill_cache_matches_one_shot():
    """The written target KV rows (within each row's length) must equal the
    one-shot prefill's — the cache is the decode-time ground truth."""
    cfg, params, dparams = _pair(seed=2)
    base, segd = _engines(cfg, params, dparams, seg=16)
    rng = np.random.default_rng(3)
    B, S = 2, 48
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    lens = jnp.asarray([S, S - 7], jnp.int32)
    st_a = base.init_state(B, 64, jnp.float32)
    st_b = segd.init_state(B, 64, jnp.float32)
    sa, t0a, _ = base._prefill_impl(params, dparams, toks, lens, st_a,
                                    jax.random.PRNGKey(0))
    sb, t0b, _ = segd._prefill_segmented_impl(params, dparams, toks, lens,
                                              st_b, jax.random.PRNGKey(0),
                                              seg=16)
    assert np.array_equal(np.asarray(t0a), np.asarray(t0b))
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_allclose(
            np.asarray(sa.kv_k[:, b, :, :L], np.float32),
            np.asarray(sb.kv_k[:, b, :, :L], np.float32), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sa.d_kv_v[b, :, :L], np.float32),
            np.asarray(sb.d_kv_v[b, :, :L], np.float32), atol=1e-5)


@pytest.mark.parametrize("seg,S", [
    (16, 45),
    # segment >> ring capacity: one ring_write's positions wrap the ring
    # multiple times; only the per-row last window may be scattered
    # (duplicate-index .at[].set ordering is undefined) — and a short row's
    # window ends at ITS length, not the segment end
    (64, 130),
])
def test_segmented_prefill_ring_draft(seg, S):
    """Ring draft cache under segmentation: padded-row junk positions must
    not wrap the ring (masked writes), and generation matches the one-shot
    ring engine."""
    cfg, params, dparams = _pair(seed=4)
    dcfg = DraftConfig(window=8, ring_size=40)
    base, segd = _engines(cfg, params, dparams, seg=seg, dcfg=dcfg)
    rng = np.random.default_rng(5)
    B = 2
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 11 - seg // 2], np.int32)
    a = base.tree_spec_generate(toks, lens, max_gen_len=16,
                                state_dtype=jnp.float32)
    b = segd.tree_spec_generate(toks, lens, max_gen_len=16,
                                state_dtype=jnp.float32)
    assert np.array_equal(a["output_ids"][:, :14], b["output_ids"][:, :14])
    assert a["count"] == b["count"], (a["count"], b["count"])


def test_segmented_prefill_int8_kv_lossless():
    """131k-row configuration at tiny scale: int8 KV + sliding window +
    sinks + segmentation; tree output must be token-exact vs the SAME
    engine's vanilla loop."""
    cfg, params, dparams = _pair(seed=6)
    cfg = dataclasses.replace(cfg, sliding_window=24, attn_sinks=4)
    dcfg = DraftConfig(window=8, ca_window=24, ca_anchors=4)
    eng = SpecEngine(params, dparams, cfg, dcfg,
                     EngineConfig(tree_shape=(2, 3), gamma=2,
                                  attn_impl="chunked", kv_quant="int8",
                                  prefill_seg=16))
    rng = np.random.default_rng(7)
    toks = rng.integers(2, cfg.vocab_size, (1, 64))
    lens = np.array([64], np.int32)
    van = eng.vanilla_generate(toks, lens, max_gen_len=16,
                               state_dtype=jnp.float32)
    tree = eng.tree_spec_generate(toks, lens, max_gen_len=16,
                                  state_dtype=jnp.float32)
    assert np.array_equal(van["output_ids"][:, :14], tree["output_ids"][:, :14])


def test_segmented_prefill_int8_weights_kv_lossless():
    """262k-row configuration at tiny scale: int8 frozen target weights +
    int8 KV + window/sinks + ring draft + segmentation, T=0 lossless."""
    from longspec_tpu.ops.quantparams import quantize_target_params
    cfg, params, dparams = _pair(seed=8)
    cfg = dataclasses.replace(cfg, sliding_window=24, attn_sinks=4)
    dcfg = DraftConfig(window=8, ca_window=24, ca_anchors=4, ring_size=40)
    qparams = quantize_target_params(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))
    eng = SpecEngine(qparams, dparams, cfg, dcfg,
                     EngineConfig(tree_shape=(2, 3), gamma=2,
                                  attn_impl="chunked", kv_quant="int8",
                                  prefill_seg=16, draft_head="int8"))
    rng = np.random.default_rng(9)
    toks = rng.integers(2, cfg.vocab_size, (1, 64))
    lens = np.array([64], np.int32)
    van = eng.vanilla_generate(toks, lens, max_gen_len=16)
    tree = eng.tree_spec_generate(toks, lens, max_gen_len=16)
    assert np.array_equal(van["output_ids"][:, :14], tree["output_ids"][:, :14])


@pytest.mark.parametrize("group", [1, 2, 3])
def test_grouped_dispatch_matches_single_dispatch(group):
    """prefill_dispatch_segs: the host-driven grouped prefill (N segments
    per device dispatch, carry donated between dispatches) must emit the
    same tokens as the single-dispatch scan — including a ragged tail
    group (5 segments at group 2/3)."""
    cfg, params, dparams = _pair(seed=4)
    dcfg = DraftConfig(window=8)
    one = SpecEngine(params, dparams, cfg, dcfg,
                     EngineConfig(tree_shape=(2, 3), gamma=2,
                                  attn_impl="dense", prefill_seg=16,
                                  prefill_dispatch_segs=None))
    grp = SpecEngine(params, dparams, cfg, dcfg,
                     EngineConfig(tree_shape=(2, 3), gamma=2,
                                  attn_impl="dense", prefill_seg=16,
                                  prefill_dispatch_segs=group))
    rng = np.random.default_rng(9)
    B, S = 2, 80                                    # 5 segments of 16
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 13], np.int32)
    a = one.vanilla_generate(toks, lens, max_gen_len=12,
                             state_dtype=jnp.float32)
    b = grp.vanilla_generate(toks, lens, max_gen_len=12,
                             state_dtype=jnp.float32)
    assert np.array_equal(a["output_ids"][:, :12], b["output_ids"][:, :12])
    t = grp.tree_spec_generate(toks, lens, max_gen_len=12,
                               state_dtype=jnp.float32)
    assert np.array_equal(t["output_ids"][:, :12], a["output_ids"][:, :12])
