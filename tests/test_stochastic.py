"""Distribution-level test of stochastic tree verification (SURVEY §7.2.6):
whatever the draft proposes, the law of the next emitted token must equal
the target's softmax — the losslessness guarantee of speculative sampling
(ref verify_stochastic, `llama_glide.py:1177-1245`)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import EngineConfig
from longspec_tpu.engine.verify import verify_stochastic


def tv(a, b):
    return 0.5 * np.abs(a - b).sum()


def run_dist(c_children, vocab, B=16384, seed=0, q_like_p=False):
    """Children are drawn IID from q per row — the regime in which
    multi-candidate rejection sampling with residual updates provably
    preserves the target law (SpecInfer-style). With deterministic top-k
    children (what beam drafting produces) the law is only approximate —
    true of the reference too (`llama_glide.py:1216-1233`)."""
    rng = np.random.default_rng(seed)
    ecfg = EngineConfig(tree_shape=(c_children,), temperature=1.0)
    N = 1 + c_children
    p_logits = rng.normal(0, 1.5, (vocab,)).astype(np.float32)
    q_logits = p_logits if q_like_p else rng.normal(0, 1.5, (vocab,)).astype(np.float32)
    p = np.exp(p_logits - p_logits.max())
    p /= p.sum()
    q = np.exp(q_logits - q_logits.max())
    q /= q.sum()

    tree_tokens = np.zeros((B, N), np.int32)
    tree_tokens[:, 1:] = rng.choice(vocab, size=(B, c_children), p=q)
    father = np.zeros((B, N), np.int32)
    depth = np.concatenate([[0], np.ones(c_children)]).astype(np.int32)
    depth = np.tile(depth[None], (B, 1))
    tmask = np.zeros((B, N, N), bool)
    tmask[:, :, 0] = True
    tmask[:, np.arange(1, N), np.arange(1, N)] = True

    tgt_logits = np.tile(p_logits[None, None], (B, N, 1))
    spec_logp = np.tile(jax.nn.log_softmax(jnp.asarray(q_logits))[None, None],
                        (B, N, 1))
    emit, acc_num, path_idx = verify_stochastic(
        jnp.asarray(tree_tokens), jnp.asarray(tmask), jnp.asarray(father),
        jnp.asarray(depth), jnp.asarray(tgt_logits), jnp.asarray(spec_logp),
        1.0, jax.random.PRNGKey(seed + 1), ecfg)
    first = np.asarray(emit[:, 0])
    emp = np.bincount(first, minlength=vocab) / B
    return emp, p, np.asarray(acc_num)


def test_stochastic_verify_matches_target_distribution():
    emp, p, acc = run_dist(c_children=3, vocab=12)
    # statistical tolerance ~ 3*sqrt(V/B)
    assert tv(emp, p) < 0.05, (emp, p)


def test_stochastic_verify_mismatched_draft_still_target():
    """Adversarial draft (independent logits): emitted law is still p."""
    emp, p, _ = run_dist(c_children=2, vocab=9, seed=3)
    assert tv(emp, p) < 0.05


def test_engine_t1_runs_all_methods():
    """T=1 generation paths execute (chain/tree/magicdec with sampled
    drafts + stochastic verification) and produce in-vocab tokens."""
    import jax.numpy as jnp
    from tests.test_lossless import build_engine
    eng, cfg = build_engine(temperature=1.0)
    rng = np.random.default_rng(2)
    toks = rng.integers(2, cfg.vocab_size, (2, 15))
    lens = np.array([15, 11], np.int32)
    for m in ("spec_generate", "tree_spec_generate", "magicdec_generate"):
        out = getattr(eng, m)(toks, lens, max_gen_len=12,
                              state_dtype=jnp.float32)
        ids = out["output_ids"]
        assert ((ids >= 0) & (ids < cfg.vocab_size)).all(), m


def test_stochastic_verify_perfect_draft_accepts_often():
    """q == p: first sampled child accepts with probability >= its mass."""
    _, p, acc = run_dist(c_children=4, vocab=8, seed=5, q_like_p=True)
    assert (acc >= 2).mean() > 0.6


def _exact_first_token_law(cfg, params, prompt, temperature):
    """Exact law of the token after t0: sum_t0 p(t0|prompt) p(x|prompt,t0),
    excluding eos-t0 rows (the engine marks them done and emits nothing)."""
    from longspec_tpu.models import llama as M
    V, S = cfg.vocab_size, prompt.shape[1]
    rows = np.tile(prompt, (V, 1))
    rows = np.concatenate([rows, np.arange(V, dtype=np.int32)[:, None]], 1)
    lens = np.full((V,), S + 1, np.int32)
    kv_k, kv_v = M.alloc_kv_cache(cfg, V, S + 2, jnp.float32)
    h, _, _ = M.forward_prefill(params, cfg, jnp.asarray(rows), jnp.asarray(lens),
                                kv_k, kv_v, attn_impl="dense")
    logits0 = M.logits_at(params, h[0, S - 1])          # p(t0 | prompt)
    logits1 = M.logits_at(params, h[:, S])              # p(x | prompt, t0)
    p0 = np.asarray(jax.nn.softmax(logits0 / temperature))
    p1 = np.asarray(jax.nn.softmax(logits1 / temperature, axis=-1))  # [V, V]
    p0 = p0.copy()
    p0[cfg.eos_token_id] = 0.0
    p0 /= p0.sum()
    return p0 @ p1


@pytest.mark.parametrize("method", ["tree_spec_generate", "spec_generate"])
def test_engine_t1_first_token_law_exact(method):
    """ENGINE-level exactness at T>0: the full generation loop (i.i.d.-from-q
    tree expansion / sampled chain drafts + residual verification) emits the
    target law. The reference cannot pass this — its T>0 tree proposes top-k
    children and resamples rejections from p (`llama_glide.py:1177-1245`),
    both approximations."""
    from longspec_tpu.config import DraftConfig, tiny_test
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.engine.engine import SpecEngine

    cfg = tiny_test(vocab_size=13, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(9), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3), gamma=2, temperature=1.0,
                        attn_impl="dense")
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8), ecfg)

    rng = np.random.default_rng(4)
    S, B = 9, 16384
    prompt1 = rng.integers(2, cfg.vocab_size, (1, S)).astype(np.int32)
    exact = _exact_first_token_law(cfg, params, prompt1, 1.0)

    toks = np.tile(prompt1, (B, 1))
    lens = np.full((B,), S, np.int32)
    # max_gen=2 -> exactly one speculative round per row
    out = getattr(eng, method)(toks, lens, max_gen_len=2,
                               state_dtype=jnp.float32, seed=123)
    ids = out["output_ids"]
    live = ids[:, 0] != cfg.eos_token_id
    first = ids[live, 1]
    emp = np.bincount(first, minlength=cfg.vocab_size) / live.sum()
    assert out["count"] > 0  # some draft tokens actually accepted
    # noise floor ~0.012 for V=13, B=16k; 0.035 leaves 3x margin while
    # still catching the top-k/resample-from-p biases (both O(0.1) here)
    assert tv(emp, exact) < 0.035, (tv(emp, exact), emp, exact)


def test_engine_t1_sharpened_proposals_law_exact():
    """proposal_sharpness < 1 samples children from a SHARPER q' but the
    verifier divides by the same q' — rejection sampling is exact for any
    proposal distribution, so the engine-level emitted law must still be
    the target's (the whole point of offering sharpness as the exact
    alternative to the reference's approximate top-k proposals)."""
    from longspec_tpu.config import DraftConfig, tiny_test
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.engine.engine import SpecEngine

    cfg = tiny_test(vocab_size=13, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(9), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3), gamma=2, temperature=1.0,
                        attn_impl="dense", proposal_sharpness=0.4)
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8), ecfg)

    rng = np.random.default_rng(4)
    S, B = 9, 16384
    prompt1 = rng.integers(2, cfg.vocab_size, (1, S)).astype(np.int32)
    exact = _exact_first_token_law(cfg, params, prompt1, 1.0)
    toks = np.tile(prompt1, (B, 1))
    lens = np.full((B,), S, np.int32)
    out = eng.tree_spec_generate(toks, lens, max_gen_len=2,
                                 state_dtype=jnp.float32, seed=123)
    ids = out["output_ids"]
    live = ids[:, 0] != cfg.eos_token_id
    first = ids[live, 1]
    emp = np.bincount(first, minlength=cfg.vocab_size) / live.sum()
    assert out["count"] > 0
    assert tv(emp, exact) < 0.035, (tv(emp, exact), emp, exact)


def test_engine_t1_topk_proposals_run():
    """t_proposals="topk" (reference-parity approximate mode,
    `llama_glide.py:1177-1245`): distinct top-k children + the residual
    walk. Smoke-level: executes, emits in-vocab tokens, accepts drafts.
    (No law assertion — the mode is documented as approximate.)"""
    from tests.test_lossless import build_engine
    eng, cfg = build_engine(temperature=1.0)
    eng = type(eng)(eng.params, eng.draft_params, eng.cfg, eng.dcfg,
                    __import__("dataclasses").replace(
                        eng.ecfg, t_proposals="topk"))
    rng = np.random.default_rng(2)
    toks = rng.integers(2, cfg.vocab_size, (2, 15))
    lens = np.array([15, 11], np.int32)
    out = eng.tree_spec_generate(toks, lens, max_gen_len=16,
                                 state_dtype=jnp.float32, seed=3)
    ids = out["output_ids"]
    assert ((ids >= 0) & (ids < cfg.vocab_size)).all()
    assert out["count"] > 0
