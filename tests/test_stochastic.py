"""Distribution-level test of stochastic tree verification (SURVEY §7.2.6):
whatever the draft proposes, the law of the next emitted token must equal
the target's softmax — the losslessness guarantee of speculative sampling
(ref verify_stochastic, `llama_glide.py:1177-1245`)."""
import numpy as np
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
