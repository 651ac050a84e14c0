"""Int8 KV-cache quantization (`EngineConfig.kv_quant="int8"`,
`ops/quantkv.py`) — beyond the reference (bf16/fp16 cache, `llama.py:219`).

Two properties gate the feature:
  1. EXACTNESS: with the quantized cache, T=0 spec output must still be
     token-exact vs vanilla on the same quantized cache (the quantize-on-
     write / dequant-on-read / suffix-qd construction, quantkv.py rules 1-3).
  2. FIDELITY: the quantized decode must stay CLOSE to the bf16 decode —
     scales actually applied, not zeroing/garbling the cache.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.ops import quantkv as qk
from longspec_tpu.engine.engine import SpecEngine
from tests.test_lossless import first_eos_trim


def test_quantize_roundtrip_props():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 3, 32))
    q8, s = qk.quantize(x)
    assert q8.dtype == jnp.int8
    xd = q8.astype(jnp.float32) * s[..., None]
    # absmax scaling: error bounded by scale/2 per element
    assert float(jnp.max(jnp.abs(xd - x) - s[..., None] / 2)) <= 1e-6
    # re-quantizing dequantized values reproduces the ints bit-identically;
    # scales only to 1 ulp (fl(fl(127*s)/127) != s for ~0.8% of f32 values —
    # which is why pre-quantized rows must pass through verbatim rather than
    # round-trip, see serve/server._insert_paged + ops/pallas_paged)
    q2, s2 = qk.quantize(xd)
    assert bool(jnp.all(q2 == q8))
    ulp = jnp.spacing(s.astype(jnp.float32))
    assert float(jnp.max(jnp.abs(s2 - s))) <= float(jnp.max(ulp))
    # zero rows stay zero with scale 1 (no NaN/inf)
    qz, sz = qk.quantize(jnp.zeros((4, 8)))
    assert bool(jnp.all(qz == 0)) and bool(jnp.all(sz == 1.0))


@pytest.mark.parametrize("impl", ["chunked", "pallas"])
def test_quant_prefix_attention_matches_dense(impl):
    """sliced_prefix_attention over a QuantKV cache: chunked and pallas
    (interpret) agree with the dense dequantized oracle."""
    rng = jax.random.PRNGKey(1)
    b, hkv, g, s, d, tq = 2, 2, 3, 70, 32, 5
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b, tq, hkv * g, d))
    kc = jax.random.normal(ks[1], (b, hkv, s, d))
    vc = jax.random.normal(ks[2], (b, hkv, s, d))
    qkv_k = qk.QuantKV(*qk.quantize(kc))
    qkv_v = qk.QuantKV(*qk.quantize(vc))
    k_hi = jnp.array([61, 37], jnp.int32)
    q_pos = k_hi[:, None] + jnp.arange(tq)[None, :]

    if impl == "pallas":
        import longspec_tpu.ops.pallas_decode as pd
        pd.INTERPRET = True
    try:
        o_ref, lse_ref = M.sliced_prefix_attention(
            q, qkv_k, qkv_v, k_hi, q_pos, None, 0, "dense")
        o, lse = M.sliced_prefix_attention(
            q, qkv_k, qkv_v, k_hi, q_pos, None, 0, impl, chunk=32)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                                   rtol=2e-5, atol=2e-5)
        # windowed variant
        o_refw, _ = M.sliced_prefix_attention(
            q, qkv_k, qkv_v, k_hi, q_pos, 24, 2, "dense")
        ow, _ = M.sliced_prefix_attention(
            q, qkv_k, qkv_v, k_hi, q_pos, 24, 2, impl, chunk=32)
        np.testing.assert_allclose(np.asarray(ow), np.asarray(o_refw),
                                   rtol=2e-5, atol=2e-5)
    finally:
        if impl == "pallas":
            pd.INTERPRET = False


def build_engine(attn_impl="chunked", window=None, **ekw):
    cfg = tiny_test(vocab_size=211, num_layers=2)
    if window is not None:
        cfg = dataclasses.replace(cfg, sliding_window=window, attn_sinks=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    # decode_precision="highest": RANDOM tiny models are all-tie margins —
    # the strict law is the one testable there (see test_lossless.py note);
    # the pinned default's int8-KV behavior is measured on the TRAINED
    # bench models (long_128k/long_262k rows).
    ekw.setdefault("decode_precision", "highest")
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl=attn_impl,
                        kv_quant="int8", **ekw)
    return SpecEngine(params, dparams, cfg, DraftConfig(window=8), ecfg), cfg


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate",
                                    "magicdec_generate"])
@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_lossless_with_int8_kv(method, impl):
    """T=0 spec output on the int8 cache is token-exact vs vanilla on the
    SAME int8 cache — the exactness contract of quantkv.py."""
    eng, cfg = build_engine(attn_impl=impl)
    rng = np.random.default_rng(7)
    B, S = 2, 19
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 6], np.int32)
    max_gen = 22
    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_lossless_int8_kv_pallas_engine():
    """Whole engine on the pallas kernels (interpret mode) with int8 KV."""
    import longspec_tpu.ops.pallas_decode as pd
    import longspec_tpu.ops.pallas_prefill as pp
    eng, cfg = build_engine(attn_impl="pallas")
    rng = np.random.default_rng(9)
    toks = rng.integers(2, cfg.vocab_size, (2, 17))
    lens = np.array([17, 12], np.int32)
    pd.INTERPRET = pp.INTERPRET = True
    try:
        van = eng.vanilla_generate(toks, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        out = eng.tree_spec_generate(toks, lens, max_gen_len=16,
                                     state_dtype=jnp.float32)
    finally:
        pd.INTERPRET = pp.INTERPRET = False
    for b in range(2):
        v = first_eos_trim(van["output_ids"][b][:16], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:16], cfg.eos_token_id)
        m = min(len(v), len(s), 16)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_lossless_int8_kv_with_sliding_window():
    """int8 KV composes with decode-time sliding windows (the 32k bench
    configuration)."""
    eng, cfg = build_engine(attn_impl="chunked", window=10)
    rng = np.random.default_rng(11)
    toks = rng.integers(2, cfg.vocab_size, (2, 21))
    lens = np.array([21, 14], np.int32)
    van = eng.vanilla_generate(toks, lens, max_gen_len=20,
                               state_dtype=jnp.float32)
    out = eng.tree_spec_generate(toks, lens, max_gen_len=20,
                                 state_dtype=jnp.float32)
    for b in range(2):
        v = first_eos_trim(van["output_ids"][b][:20], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:20], cfg.eos_token_id)
        m = min(len(v), len(s), 20)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_int8_kv_close_to_bf16_decode():
    """Fidelity: greedy continuations from the quantized cache track the
    full-precision ones closely on a peaked (near-deterministic) model —
    catches scale-application bugs that exactness tests cannot (a zeroed
    cache would still be 'lossless' in the spec-vs-vanilla sense)."""
    cfg = tiny_test(vocab_size=97, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(3), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    toks = rng.integers(2, cfg.vocab_size, (2, 24))
    lens = np.array([24, 24], np.int32)
    outs = {}
    for kvq in ("none", "int8"):
        ecfg = EngineConfig(tree_shape=(2, 3), gamma=2, attn_impl="chunked",
                            kv_quant=kvq)
        eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8), ecfg)
        outs[kvq] = np.asarray(eng.vanilla_generate(
            toks, lens, max_gen_len=24, state_dtype=jnp.float32)["output_ids"])
    agree = float(np.mean(outs["none"][:, :8] == outs["int8"][:, :8]))
    # a random-init model is not peaked, so demand agreement early in the
    # continuation rather than everywhere (divergence compounds after the
    # first mismatch); a garbled cache agrees at chance ~1/97
    assert agree >= 0.5, (agree, outs["none"][:, :8], outs["int8"][:, :8])


def test_serving_with_int8_kv_token_exact():
    """Continuous-batching over int8 KV slots: every served completion is
    token-exact vs a standalone tree_spec_generate on the same int8 engine."""
    from longspec_tpu.serve import SpecServer
    eng, cfg = build_engine(attn_impl="dense")
    rng = np.random.default_rng(13)
    prompts = [rng.integers(2, cfg.vocab_size, (l,)).tolist()
               for l in (11, 7, 15)]
    max_new = [10, 14, 8]
    srv = SpecServer(eng, n_slots=2, s_max=64, max_new_cap=16,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    uids = [srv.submit(p, m) for p, m in zip(prompts, max_new)]
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    assert sorted(comps) == sorted(uids)
    eos = cfg.eos_token_id
    for uid, p, m in zip(uids, prompts, max_new):
        out = eng.tree_spec_generate(np.asarray([p]),
                                     np.asarray([len(p)], np.int32),
                                     max_gen_len=m, state_dtype=jnp.float32)
        row = out["output_ids"][0]
        stop = np.nonzero(row == eos)[0]
        want = row[:min(stop[0] if len(stop) else len(row), m)].tolist()
        got = comps[uid].tokens
        n = min(len(want), len(got))
        assert got[:n] == want[:n], f"req {uid}: {got[:n]} vs {want[:n]}"


def _paged_int8_engines(page=16):
    from longspec_tpu.ops.pallas_paged import PagedAttn
    cfg = tiny_test(vocab_size=151, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    dcfg = DraftConfig(window=8)
    dense = SpecEngine(params, dparams, cfg, dcfg,
                       EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                    attn_impl="dense", kv_quant="int8",
                                    decode_precision="highest"))
    paged = SpecEngine(params, dparams, cfg, dcfg,
                       EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                    attn_impl=PagedAttn(page),
                                    kv_quant="int8",
                                    decode_precision="highest"))
    return cfg, dense, paged


def test_paged_server_int8_token_exact():
    """Paged pools hold int8 rows + scales: continuous batching over the
    quantized pools emits exactly the dense int8 engine's tokens."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_int8_engines()
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(2, cfg.vocab_size, (l,)).tolist()
               for l in (11, 7, 19)]
    uids = [srv.submit(p, 12) for p in prompts]
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    from tests.test_paged import _standalone
    for uid, p in zip(uids, prompts):
        assert comps[uid].tokens == _standalone(dense, p, 12), uid


def test_paged_elastic_int8_hibernation_exact():
    """Elastic paging under int8 KV: hibernation-swap preemption saves the
    int8 pages + scales and restores them bit-exact — preempted requests
    still finish token-identical to the dense int8 engine."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_int8_engines()
    # same pressure geometry as test_elastic_preempts_and_stays_token_exact:
    # two growing 10+40-token requests cannot coexist in a 7-page pool, so
    # the younger MUST hibernate (asserted below — this gate is only real if
    # the int8 save/restore path actually runs)
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=64, kv="paged",
                     prefill_buckets=(16,), state_dtype=jnp.float32,
                     paging="elastic", pool_pages=7)
    rng = np.random.default_rng(23)
    prompts = [rng.integers(2, cfg.vocab_size, (10,)).tolist()
               for _ in range(3)]
    max_new = 40
    uids = [srv.submit(p, max_new) for p in prompts]
    comps = {c.uid: c for c in srv.run(rounds_per_step=4)}
    assert sorted(comps) == sorted(uids)
    assert srv.preemptions >= 1, srv.stats()
    from tests.test_paged import _standalone
    for uid, p in zip(uids, prompts):
        assert comps[uid].tokens == _standalone(dense, p, max_new), uid


def test_prefix_cache_disabled_under_int8():
    """Prefix-cache compute reuse is OFF with int8 KV (a cached prefix is
    read dequantized while an uncached admission attends the fresh prompt —
    t0 laws would differ); admissions fall back to full prefill and stay
    exact."""
    from longspec_tpu.serve import SpecServer
    cfg, dense, paged = _paged_int8_engines()
    srv = SpecServer(paged, n_slots=2, s_max=96, max_new_cap=32, kv="paged",
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    assert not srv._prefix_ok
    p = np.random.default_rng(29).integers(2, cfg.vocab_size, (12,)).tolist()
    u1 = srv.submit(p, 8)
    u2 = srv.submit(p, 8)   # identical prompt: would hit the prefix cache
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    assert srv.prefix_hits == 0
    from tests.test_paged import _standalone
    want = _standalone(dense, p, 8)
    assert comps[u1].tokens == want and comps[u2].tokens == want


# int8 + sequence-parallel composition is covered on the virtual 8-device
# mesh in tests/test_sp.py (test_sp_int8_primitives_match_dense,
# test_sp_int8_tree_spec_lossless).


def test_bench_divergence_forensics_respects_engine_law():
    """bench._dissect_divergence replays the divergent position under the
    ENGINE's decode law (kv_quant cache + attn_impl), via a real append
    step — not a fixed bf16/chunked prefill. Exercise both cache laws and
    both branch arms (i=0 prefill, i>0 append)."""
    import bench

    for quant in ("none", "int8"):
        eng, cfg = build_engine(attn_impl="chunked")
        if quant == "none":
            eng.ecfg = dataclasses.replace(eng.ecfg, kv_quant="none")
        prompt = np.asarray(
            [np.random.default_rng(31).integers(2, cfg.vocab_size, (9,))])
        lens = np.asarray([9], np.int32)
        van = {"output_ids": np.asarray([[5, 7, 9, 11]], np.int32)}
        tree = {"output_ids": np.asarray([[5, 7, 8, 11]], np.int32)}
        out = bench._dissect_divergence(eng, prompt, lens, van, tree, 4)
        assert out["first_div_pos"] == 2
        assert out["first_div_tokens"] == [9, 8]
        assert np.isfinite(out["first_div_margin"])
        assert out["first_div_margin"] >= 0
        # i=0 arm: divergence at the prefill-sampled token
        tree0 = {"output_ids": np.asarray([[6, 7, 9, 11]], np.int32)}
        out0 = bench._dissect_divergence(eng, prompt, lens, van, tree0, 4)
        assert out0["first_div_pos"] == 0
        assert np.isfinite(out0["first_div_margin"])
