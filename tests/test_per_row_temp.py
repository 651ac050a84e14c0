"""Per-row traced temperature (EngineConfig.per_row_temperature).

The serving feature: one compiled decode program handles any mix of greedy
and stochastic rows — a continuous-batching server sets each request's
temperature at admission (SpecServer.submit(temperature=...)) without
recompiling. The reference has no serving layer; its temperature is a CLI
flag fixed for the whole run (`inference_long-bench.py:69`).

Invariants tested:
  * temps=0 rows are TOKEN-EXACT vs the scalar-T=0 compiled engine (the
    per-row select must pick the identical greedy expansion + verification).
  * temps=T rows follow the same law as the scalar-T engine (first-token
    distribution vs the exact target law, as test_stochastic does).
  * mixed batches in the server: the greedy request's completion equals the
    standalone greedy output even while a stochastic row shares the batch.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine
from longspec_tpu.serve import SpecServer


def _pair(seed=0, vocab=211):
    cfg = tiny_test(vocab_size=vocab, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(seed), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(seed + 1), cfg)
    return cfg, params, dparams


def _mk(cfg, params, dparams, per_row, temperature=0.0, **kw):
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="dense",
                        temperature=temperature,
                        per_row_temperature=per_row, **kw)
    return SpecEngine(params, dparams, cfg, dcfg=DraftConfig(window=8),
                      ecfg=ecfg)


@pytest.mark.parametrize("method", ["tree_spec_generate", "spec_generate",
                                    "magicdec_generate"])
def test_per_row_t0_token_exact(method):
    """All-zero temps through the per-row program == scalar T=0 program."""
    cfg, params, dparams = _pair()
    rng = np.random.default_rng(3)
    toks = rng.integers(2, cfg.vocab_size, (2, 17)).astype(np.int32)
    lens = np.array([17, 12], np.int32)
    base = _mk(cfg, params, dparams, per_row=False)
    pr = _mk(cfg, params, dparams, per_row=True)
    a = getattr(base, method)(toks, lens, max_gen_len=24,
                              state_dtype=jnp.float32)
    b = getattr(pr, method)(toks, lens, max_gen_len=24,
                            state_dtype=jnp.float32)
    np.testing.assert_array_equal(a["output_ids"], b["output_ids"])
    assert a["count"] == b["count"] and a["num"] == b["num"]


def test_per_row_t1_first_token_law_exact():
    """temps=1 rows through the per-row program emit the exact target law
    (the greedy arm computed alongside must not leak into T>0 rows)."""
    from tests.test_stochastic import _exact_first_token_law, tv
    cfg, params, dparams = _pair(seed=4, vocab=13)
    ecfg = EngineConfig(tree_shape=(2, 3), gamma=2, temperature=1.0,
                        attn_impl="dense", per_row_temperature=True)
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
    assert tv(emp, exact) < 0.035, tv(emp, exact)


def _standalone_greedy(engine, toks, max_new):
    out = engine.tree_spec_generate(
        np.asarray([toks]), np.asarray([len(toks)], np.int32),
        max_gen_len=max_new, state_dtype=jnp.float32)
    row = out["output_ids"][0]
    eos_pos = np.nonzero(row == engine.cfg.eos_token_id)[0]
    stop = eos_pos[0] if len(eos_pos) else len(row)
    return row[:min(stop, max_new)].tolist()


def test_server_mixed_temperatures():
    """One batch, two laws: the greedy request is token-exact vs standalone
    greedy decode while a stochastic request shares the slots."""
    cfg, params, dparams = _pair(seed=7)
    eng = _mk(cfg, params, dparams, per_row=True)
    greedy_ref = _mk(cfg, params, dparams, per_row=False)
    rng = np.random.default_rng(5)
    p_greedy = rng.integers(2, cfg.vocab_size, (13,)).tolist()
    p_stoch = rng.integers(2, cfg.vocab_size, (9,)).tolist()

    srv = SpecServer(eng, n_slots=2, s_max=96, max_new_cap=24,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    u_g = srv.submit(p_greedy, 16, temperature=0.0)
    u_s = srv.submit(p_stoch, 16, temperature=1.0)
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    assert sorted(comps) == sorted([u_g, u_s])
    want = _standalone_greedy(greedy_ref, p_greedy, 16)
    assert comps[u_g].tokens == want
    s_toks = comps[u_s].tokens
    assert 1 <= len(s_toks) <= 17
    assert all(0 <= t < cfg.vocab_size for t in s_toks)


def test_server_temperature_requires_mode():
    """submit(temperature=) on a fixed-temperature server must raise."""
    cfg, params, dparams = _pair(seed=9)
    eng = _mk(cfg, params, dparams, per_row=False)
    srv = SpecServer(eng, n_slots=1, s_max=64, max_new_cap=8,
                     prefill_buckets=(16,), state_dtype=jnp.float32)
    with pytest.raises(ValueError, match="per_row_temperature"):
        srv.submit([3, 4, 5], 4, temperature=0.7)
    # matching the engine's compiled temperature is always fine
    srv.submit([3, 4, 5], 4, temperature=0.0)


def test_http_per_request_temperature():
    """End-to-end over a real socket: `temperature` in the request body
    reaches the row; greedy requests stay token-exact."""
    from longspec_tpu.serve import HttpFrontend
    from longspec_tpu.data.api_client import post_json
    cfg, params, dparams = _pair(seed=13)
    eng = _mk(cfg, params, dparams, per_row=True)
    greedy_ref = _mk(cfg, params, dparams, per_row=False)
    srv = SpecServer(eng, n_slots=2, s_max=96, max_new_cap=16,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    rng = np.random.default_rng(6)
    toks = rng.integers(2, cfg.vocab_size, (10,)).tolist()
    with HttpFrontend(srv, port=0) as fe:
        url = f"http://127.0.0.1:{fe.port}/v1/completions"
        out0 = post_json(url, {"prompt": toks, "max_tokens": 8,
                               "temperature": 0.0})
        assert (out0["choices"][0]["token_ids"]
                == _standalone_greedy(greedy_ref, toks, 8))
        out1 = post_json(url, {"prompt": toks, "max_tokens": 8,
                               "temperature": 1.0})
        ids = out1["choices"][0]["token_ids"]
        assert 1 <= len(ids) <= 8
        assert all(0 <= t < cfg.vocab_size for t in ids)


def test_server_default_temp_matches_engine_default():
    """Requests WITHOUT a temperature on a per-row server behave like the
    engine's scalar default (here greedy)."""
    cfg, params, dparams = _pair(seed=11)
    eng = _mk(cfg, params, dparams, per_row=True)
    greedy_ref = _mk(cfg, params, dparams, per_row=False)
    rng = np.random.default_rng(8)
    prompts = [rng.integers(2, cfg.vocab_size, (l,)).tolist()
               for l in (11, 15)]
    srv = SpecServer(eng, n_slots=2, s_max=96, max_new_cap=16,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    uids = [srv.submit(p, 10) for p in prompts]
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    for uid, p in zip(uids, prompts):
        assert comps[uid].tokens == _standalone_greedy(greedy_ref, p, 10)
