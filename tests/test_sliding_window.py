"""Sliding-window target attention (ModelConfig.sliding_window/attn_sinks)
and draft cross-attention window (DraftConfig.ca_window/ca_anchors).

The architecture knob that makes a model trained at seq L honest at
contexts >> L: every decode-time attention span stays within the trained
span (Mistral `sliding_window` / StreamingLLM sinks; see bench.py SPECS
notes — the 32k bench target's full-attention accuracy collapses past 20k
while the SAME params decode at 0.85+ everywhere with a window).

Invariants:
  * prefill/append consistency: greedy decode via forward_append equals a
    single big forward_prefill replay under the same window (per impl).
  * impl parity: dense vs chunked vs pallas(interpret) agree under windows.
  * the losslessness gate holds with windows on: vanilla == tree == chain.
  * convert: HF sliding_window maps (Mistral always; Qwen2 gated).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
import dataclasses

from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine


def _wcfg(**kw):
    cfg = tiny_test(vocab_size=151, num_layers=2)
    return dataclasses.replace(cfg, sliding_window=10, attn_sinks=2, **kw)


@pytest.mark.parametrize("impl", ["dense", "chunked"])
def test_windowed_prefill_matches_masked_oracle(impl):
    """forward_prefill under (window, sinks) == dense attention with the
    explicit window+sink mask."""
    from longspec_tpu.ops import attention as att
    cfg = _wcfg()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, S = 2, 33
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    lens = jnp.asarray([S, S - 7], jnp.int32)
    kv_k, kv_v = M.alloc_kv_cache(cfg, B, S + 4, jnp.float32)
    h, _, _ = M.forward_prefill(params, cfg, toks, lens, kv_k, kv_v,
                                attn_impl=impl)
    # oracle: full-attention model cannot be reused (different function);
    # instead verify the mask the impl applies by recomputing band-0 attn
    # through prefill_mask directly
    mask = att.prefill_mask(S, lens, window=cfg.sliding_window,
                            anchors=cfg.attn_sinks)
    qi = np.arange(S)[:, None]
    kj = np.arange(S)[None, :]
    want = (kj <= qi) & ((kj >= qi - 10) | (kj < 2))
    want = want[None] & (kj[None] < np.asarray(lens)[:, None, None])
    np.testing.assert_array_equal(np.asarray(mask), want)
    assert np.isfinite(np.asarray(h, np.float32)).all()


@pytest.mark.parametrize("impl", ["chunked", "pallas"])
def test_windowed_append_matches_dense(impl):
    """Greedy decode (prefill + forward_append steps) is impl-invariant
    under a sliding window + sinks."""
    cfg = _wcfg()
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(3), cfg)
    dcfg = DraftConfig(window=6, ca_window=10, ca_anchors=2)
    rng = np.random.default_rng(4)
    toks = rng.integers(2, cfg.vocab_size, (2, 19))
    lens = np.array([19, 13], np.int32)

    outs = {}
    for use in ("dense", impl):
        ecfg = EngineConfig(tree_shape=(2, 3), gamma=2, attn_impl=use)
        eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
        if use == "pallas":
            import longspec_tpu.ops.pallas_decode as pd
            import longspec_tpu.ops.pallas_prefill as pp
            pd.INTERPRET = pp.INTERPRET = True
        outs[use] = eng.vanilla_generate(toks, lens, max_gen_len=16,
                                         state_dtype=jnp.float32)["output_ids"]
        if use == "pallas":
            pd.INTERPRET = pp.INTERPRET = False
    np.testing.assert_array_equal(outs["dense"], outs[impl])


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
def test_lossless_with_sliding_window(method):
    """The T=0 losslessness gate holds for a sliding-window target with a
    ca-windowed draft — vanilla == chain == tree, token-exact."""
    cfg = _wcfg()
    params = M.init_params(jax.random.PRNGKey(5), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(6), cfg)
    dcfg = DraftConfig(window=6, ca_window=10, ca_anchors=2)
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="chunked")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    rng = np.random.default_rng(7)
    toks = rng.integers(2, cfg.vocab_size, (2, 21))
    lens = np.array([21, 15], np.int32)
    van = eng.vanilla_generate(toks, lens, max_gen_len=20,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(toks, lens, max_gen_len=20,
                               state_dtype=jnp.float32)
    n = min(int(van["num"]), 19)
    np.testing.assert_array_equal(van["output_ids"][:, :n],
                                  out["output_ids"][:, :n])


@pytest.fixture(scope="module")
def distilled_pair():
    """Same recipe as tests/test_lossless.distilled_pair (tiny Markov-trained
    target + distilled GLIDE draft) for real multi-token acceptance."""
    from longspec_tpu.train import trainer as T
    from longspec_tpu.train.distill import distill_draft
    from longspec_tpu.train.synthetic import make_markov_lm, sample_corpus_fast

    cfg = tiny_test(vocab_size=128, num_layers=2)
    succ, probs = make_markov_lm(cfg.vocab_size, branch_frac=0.05, seed=3,
                                 n_states=48)
    corpus = sample_corpus_fast(succ, probs, 64, 96, seed=4)
    params = M.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    opt = T.make_adafactor(lr=1e-2, warmup_steps=10)
    st = T.init_train_state(params, opt)
    step_fn = T.make_lm_train_step(cfg, opt, attn_impl="dense")
    rng = np.random.default_rng(11)
    for i in range(100):
        idx = rng.integers(0, corpus.shape[0], (8,))
        st, _ = step_fn(st, jnp.asarray(corpus[idx]), jax.random.PRNGKey(i))
    params = st.draft_params
    dcfg = DraftConfig(window=32)
    dparams, _ = distill_draft(params, cfg, dcfg, corpus, steps=80, batch=8,
                               lr=3e-3, attn_impl="dense")
    prompt = sample_corpus_fast(succ, probs, 2, 48, seed=77)
    return cfg, dcfg, params, dparams, prompt


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
def test_lossless_windowed_distilled_draft(method, distilled_pair):
    """The 32k bench configuration in miniature: a TRAINED pair decoded with
    decode-time sliding windows (target window+sinks, draft ca_window). The
    multi-token-accept commit paths must stay token-exact under windows —
    and acceptance must stay real (>= 2), i.e. the window doesn't gut the
    draft."""
    from tests.test_lossless import first_eos_trim
    cfg, dcfg, params, dparams, prompt = distilled_pair
    cfg_w = dataclasses.replace(cfg, sliding_window=24, attn_sinks=4)
    dcfg_w = dataclasses.replace(dcfg, ca_window=24, ca_anchors=4)
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="chunked")
    eng = SpecEngine(params, dparams, cfg_w, dcfg_w, ecfg)
    B, S = prompt.shape
    lens = np.array([S, S - 7], np.int32)
    van = eng.vanilla_generate(prompt, lens, max_gen_len=32,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(prompt, lens, max_gen_len=32,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:32], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:32], cfg.eos_token_id)
        m = min(len(v), len(s), 32)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"
    mean_accept = (out["count"] + out["num"]) / max(out["num"], 1)
    assert mean_accept >= 2.0, mean_accept


@pytest.mark.parametrize("trunc", [False, True])
def test_magicdec_lossless_with_sliding_window(trunc):
    """MagicDec under a sliding-window target: the compacted stream cache
    (row index != position) cannot use the position-derived window cut, so
    the DRAFT steps attend the full stream view; VERIFICATION runs the real
    windowed target over the full cache (row == position) and keeps T=0
    output token-exact vs windowed vanilla."""
    cfg = _wcfg()
    params = M.init_params(jax.random.PRNGKey(8), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(9), cfg)
    kw = dict(magicdec_sink=4, magicdec_window=8) if trunc else {}
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=6),
                     EngineConfig(attn_impl="chunked", gamma=3, **kw))
    rng = np.random.default_rng(10)
    toks = rng.integers(2, cfg.vocab_size, (2, 21))
    lens = np.array([21, 15], np.int32)
    van = eng.vanilla_generate(toks, lens, max_gen_len=20,
                               state_dtype=jnp.float32)
    out = eng.magicdec_generate(toks, lens, max_gen_len=20,
                                state_dtype=jnp.float32)
    from tests.test_lossless import first_eos_trim
    for b in range(2):
        v = first_eos_trim(van["output_ids"][b][:20], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:20], cfg.eos_token_id)
        m = min(len(v), len(s), 20)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_windowed_logits_match_hf_mistral():
    """Exact logits parity with transformers' Mistral (the sliding-window
    reference implementation) at context > window — pins the off-by-one:
    HF masks kv > q - sw, ours kj >= p - (sw-1)."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM
    from longspec_tpu.models.convert import (config_from_hf,
                                             params_from_hf_state_dict)
    torch.manual_seed(0)
    hf_cfg = MistralConfig(vocab_size=97, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=128, rope_theta=10000.0,
                           sliding_window=8, attn_implementation="eager")
    hf = MistralForCausalLM(hf_cfg).eval().to(torch.float32)
    cfg = config_from_hf(hf_cfg)
    assert cfg.sliding_window == 7
    params = params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)

    rng = np.random.default_rng(5)
    S = 24  # > window so the mask bites
    toks = rng.integers(2, cfg.vocab_size, (1, S))
    with torch.no_grad():
        want = hf(torch.tensor(toks)).logits.numpy()
    kv_k, kv_v = M.alloc_kv_cache(cfg, 1, S + 4, jnp.float32)
    h, _, _ = M.forward_prefill(params, cfg, jnp.asarray(toks),
                                jnp.asarray([S], jnp.int32), kv_k, kv_v,
                                attn_impl="dense")
    got = np.asarray(M.logits_at(params, h))
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)


def test_convert_maps_hf_sliding_window():
    from longspec_tpu.models.convert import config_from_hf

    class HfCfg:
        model_type = "mistral"
        vocab_size, hidden_size, intermediate_size = 128, 32, 64
        num_hidden_layers, num_attention_heads = 2, 4
        sliding_window = 4096

    # HF masks kv > q - sw (span sw); ours is kj >= p - w (span w+1), so
    # the mapping is w = sw - 1 for exact parity
    c = config_from_hf(HfCfg())
    assert c.sliding_window == 4095

    class Qwen(HfCfg):
        model_type = "qwen2"
        use_sliding_window = False

    assert config_from_hf(Qwen()).sliding_window is None
    Qwen.use_sliding_window = True
    assert config_from_hf(Qwen()).sliding_window == 4095
    # Qwen2 windows only a SUBSET of layers via max_window_layers: honored
    # only when it covers every layer
    Qwen.max_window_layers = 1
    assert config_from_hf(Qwen()).sliding_window is None
