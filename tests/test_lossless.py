"""Losslessness gate (SURVEY.md §7.1.8): at temperature 0, chain and tree
speculative decoding must produce token-exact greedy output — identical to
the vanilla autoregressive loop — regardless of draft quality.

The reference only eyeballs this (`inference_long-bench.py:252`); here it is
the primary CI gate, run with a *random* draft (worst case: near-zero
acceptance) and with a "self-distilled-ish" draft to exercise multi-token
acceptance paths.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine


def first_eos_trim(row, eos):
    row = list(row)
    if eos in row:
        return row[: row.index(eos) + 1]
    return row


def build_engine(tree_shape=(2, 3, 3), gamma=3, window=8, seed=0,
                 temperature=0.0, vocab=211, draft_head="bf16",
                 draft_compute="bf16", beam_topk="exact"):
    cfg = tiny_test(vocab_size=vocab, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(seed), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(seed + 1), cfg)
    ecfg = EngineConfig(tree_shape=tree_shape, gamma=gamma,
                        temperature=temperature, attn_impl="dense",
                        draft_head=draft_head, draft_compute=draft_compute,
                        beam_topk=beam_topk)
    dcfg = DraftConfig(window=window)
    return SpecEngine(params, dparams, cfg, dcfg, ecfg), cfg


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
def test_lossless_greedy_random_draft(method):
    eng, cfg = build_engine()
    rng = np.random.default_rng(0)
    B, S = 2, 17
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 5], np.int32)
    max_gen = 24

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
@pytest.mark.parametrize("prec", ["int8", "int4"])
def test_lossless_int8_draft_head(method, prec):
    """int8/int4 draft scoring head: proposal ranking changes slightly but
    T=0 output must stay token-exact vs vanilla (q never affects the emitted
    law, only the accept rate)."""
    eng, cfg = build_engine(draft_head=prec)
    rng = np.random.default_rng(21)
    B, S = 2, 15
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 4], np.int32)
    max_gen = 20

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
@pytest.mark.parametrize("prec", ["int8", "int4"])
def test_lossless_int8_draft_compute(method, prec):
    """int8/int4 draft-layer compute (`EngineConfig.draft_compute`): every
    decode micro-step matmul of the GLIDE layer runs as a native int8 dot
    (int4 weights stored packed, converted in VMEM). Proposals shift
    slightly; the T=0 emitted stream must stay token-exact vs vanilla
    (draft output only selects candidates, never the accepted law)."""
    eng, cfg = build_engine(draft_compute=prec)
    rng = np.random.default_rng(33)
    B, S = 2, 15
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 4], np.int32)
    max_gen = 20

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_lossless_approx_beam_topk():
    """`EngineConfig.beam_topk="approx"` (TPU approx_max_k for tree beam
    expansion): the beam only picks which tokens are proposed, so T=0 output
    must stay token-exact vs vanilla even with ~0.95-recall candidate
    selection."""
    eng, cfg = build_engine(beam_topk="approx")
    rng = np.random.default_rng(44)
    B, S = 2, 15
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 4], np.int32)
    max_gen = 20

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = eng.tree_spec_generate(toks, lens, max_gen_len=max_gen,
                                 state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


@pytest.mark.parametrize("trunc", [False, True])
def test_lossless_magicdec(trunc):
    """MagicDec self-speculation is exactly lossless at T=0 (verification
    uses the full cache) both when the stream cache covers the whole prompt
    and when it truncates it (ref llama.py:228-264)."""
    eng, cfg = build_engine()
    if trunc:
        # shrink sink+window below the prompt so compression kicks in
        from longspec_tpu.config import EngineConfig
        eng.ecfg = EngineConfig(tree_shape=eng.ecfg.tree_shape, gamma=3,
                                temperature=0.0, attn_impl="dense",
                                magicdec_sink=4, magicdec_window=8)
    rng = np.random.default_rng(5)
    B, S = 2, 21
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 6], np.int32)
    max_gen = 24

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = eng.magicdec_generate(toks, lens, max_gen_len=max_gen,
                                state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"
    if not trunc:
        # full coverage -> self-draft always agrees -> every round accepts all
        assert out["count"] > 0


@pytest.fixture(scope="module")
def distilled_pair():
    """Tiny target trained on a Markov language + a distilled GLIDE draft.

    Real multi-token acceptance (unlike the random-draft tests above, which
    reject almost everything) so the all-layer tree KV commit
    (`engine/engine.py` _tree_round step 5) and the chain double-token case
    are exercised under genuine acceptance, not just by the TPU bench.
    """
    from longspec_tpu.train import trainer as T
    from longspec_tpu.train.distill import distill_draft
    from longspec_tpu.train.synthetic import make_markov_lm, sample_corpus_fast

    cfg = tiny_test(vocab_size=128, num_layers=2)
    # mostly-deterministic language (branch_frac 0.05) so ~100 steps suffice
    # for sharp margins (measured: accept 4.0/4 with this recipe)
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
def test_lossless_greedy_distilled_draft(method, distilled_pair):
    """With a genuinely trained draft: token-exact at T=0 AND mean accepted
    length >= 2, so multi-token acceptance paths (all-layer KV commit, chain
    bonus double-feed) actually bite."""
    cfg, dcfg, params, dparams, prompt = distilled_pair
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, temperature=0.0,
                        attn_impl="dense")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    B, S = prompt.shape
    lens = np.array([S, S - 7], np.int32)
    max_gen = 32

    van = eng.vanilla_generate(prompt, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(prompt, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"
    mean_accept = (out["count"] + out["num"]) / max(out["num"], 1)
    assert mean_accept >= 2.0, f"distilled draft accept too low: {mean_accept}"


def test_vanilla_matches_hf_generate():
    """Vanilla greedy loop vs HF transformers generate (token-exact)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    hf_cfg = LlamaConfig(vocab_size=211, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=512,
                         rope_theta=10000.0)
    hf = LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    from longspec_tpu.models.convert import config_from_hf, params_from_hf_state_dict
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    dparams = G.init_draft_params(jax.random.PRNGKey(0), cfg)
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8),
                     EngineConfig(attn_impl="dense"))

    rng = np.random.default_rng(0)
    S, max_gen = 13, 16
    toks = rng.integers(2, cfg.vocab_size, (1, S))
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(toks), max_new_tokens=max_gen,
                             do_sample=False, eos_token_id=None,
                             pad_token_id=0)
    hf_new = hf_out[0, S:].numpy().tolist()
    van = eng.vanilla_generate(toks, np.array([S], np.int32),
                               max_gen_len=max_gen, state_dtype=jnp.float32)
    mine = van["output_ids"][0][:max_gen].tolist()
    m = min(len(hf_new), len(mine))
    # trim at eos (engine stops there, HF was told not to)
    if cfg.eos_token_id in mine:
        m = min(m, mine.index(cfg.eos_token_id) + 1)
    assert hf_new[:m] == mine[:m]


@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
def test_lossless_greedy_pallas_engine(method):
    """Whole-engine losslessness under attn_impl='pallas' (kernels run in
    Pallas interpret mode on CPU): spec output must be token-exact vs the
    vanilla loop THROUGH THE SAME KERNELS — the gate that must hold before
    pallas can be the engine default on TPU."""
    cfg = tiny_test(vocab_size=211, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3), gamma=3, temperature=0.0,
                        attn_impl="pallas")
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8), ecfg)
    rng = np.random.default_rng(3)
    B, S = 2, 17
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 5], np.int32)
    max_gen = 20

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    out = getattr(eng, method)(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.float32)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_extra_eos_stops_generation():
    """Multi-eos checkpoints (HF Llama-3.x instruct ships
    eos_token_id=[128001, 128009]): any id in extra_eos_token_ids must stop
    generation in every loop, while buffer fills keep the primary id."""
    import dataclasses
    eng, cfg = build_engine(seed=3)
    rng = np.random.default_rng(11)
    toks = rng.integers(2, cfg.vocab_size, (1, 13))
    lens = np.array([13], np.int32)
    max_gen = 24

    base = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                                state_dtype=jnp.float32)
    row = list(base["output_ids"][0][:max_gen])
    # pick an emitted token to promote to a stop id (skip the primary eos)
    k, t_star = next((i, t) for i, t in enumerate(row)
                     if i >= 2 and t != cfg.eos_token_id)
    cfg2 = dataclasses.replace(cfg, extra_eos_token_ids=(int(t_star),))
    eng2 = SpecEngine(eng.params, eng.draft_params, cfg2, eng.dcfg, eng.ecfg)

    van = eng2.vanilla_generate(toks, lens, max_gen_len=max_gen,
                                state_dtype=jnp.float32)
    got = list(van["output_ids"][0][:max_gen])
    stop = got.index(t_star)
    assert got[:stop + 1] == row[:k + 1]  # identical up to the stop token
    assert all(t == cfg.eos_token_id for t in got[stop + 1:])  # then fill

    # spec loops stop on it too, emitting the same prefix
    for method in ("spec_generate", "tree_spec_generate"):
        out = getattr(eng2, method)(toks, lens, max_gen_len=max_gen,
                                    state_dtype=jnp.float32)
        s = list(out["output_ids"][0][:max_gen])
        assert t_star in s, f"{method} never emitted the stop token"
        sstop = s.index(t_star)
        assert s[:sstop + 1] == got[:stop + 1], f"{method} prefix mismatch"
        assert all(t == cfg.eos_token_id for t in s[sstop + 1:]), method


# ---------------------------------------------------------------------------
# fp32-island decode law (EngineConfig.decode_dtype, round-3): with BF16
# params the T=1 vanilla step and the T=N verify step are different XLA
# programs; a bf16 residual stream lets their ~4e-3 relative noise flip
# greedy argmax ties (round-2 hard_8k bench row). The fp32 law must hold
# token exactness on bf16 models.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["spec_generate", "tree_spec_generate"])
@pytest.mark.parametrize("attn", ["dense", "chunked"])
def test_lossless_bf16_fp32_islands(method, attn):
    cfg = tiny_test(vocab_size=211, num_layers=2)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          M.init_params(jax.random.PRNGKey(3), cfg))
    dparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           G.init_draft_params(jax.random.PRNGKey(4), cfg))
    # decode_precision="highest": a RANDOM bf16 model has near-uniform
    # logits (every token is a ~1e-3-margin tie) — the strict-bitwise law
    # is the one that must hold there. The default "bf16_pinned" law's
    # contract (token-exact on real-margin models, documented tie-flips
    # below 1e-2) is tested in test_deferred_commit and on the TRAINED
    # bench models (LOSSLESSNESS.md).
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, temperature=0.0,
                        attn_impl=attn, decode_dtype="fp32",
                        decode_precision="highest")
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8), ecfg)
    rng = np.random.default_rng(5)
    B, S = 2, 19
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 4], np.int32)
    max_gen = 24
    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen)
    out = getattr(eng, method)(toks, lens, max_gen_len=max_gen)
    for b in range(B):
        v = first_eos_trim(van["output_ids"][b][:max_gen], cfg.eos_token_id)
        s = first_eos_trim(out["output_ids"][b][:max_gen], cfg.eos_token_id)
        m = min(len(v), len(s), max_gen)
        assert v[:m] == s[:m], f"row {b}: {v[:m]} vs {s[:m]}"


def test_decode_dtype_native_still_runs():
    # "native" keeps the old law available (and is what training-time code
    # paths implicitly use); it must execute end to end
    eng, cfg = build_engine()
    eng = SpecEngine(eng.params, eng.draft_params, cfg, eng.dcfg,
                     __import__("dataclasses").replace(
                         eng.ecfg, decode_dtype="native"))
    toks = np.random.default_rng(0).integers(2, cfg.vocab_size, (1, 12))
    out = eng.tree_spec_generate(toks, np.array([12], np.int32),
                                 max_gen_len=8, state_dtype=jnp.float32)
    assert out["output_ids"].shape[0] == 1
