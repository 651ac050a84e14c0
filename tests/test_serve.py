"""Continuous-batching server tests (CPU).

The core invariant: serving (slot admission, batched decode with ragged
rows, mid-stream slot reuse) must not change any request's emitted tokens —
each completion is token-exact vs a standalone `tree_spec_generate` call for
the same prompt at T=0.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine
from longspec_tpu.serve import SpecServer


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_test(vocab_size=211, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, temperature=0.0,
                        attn_impl="dense")
    return SpecEngine(params, dparams, cfg, dcfg=DraftConfig(window=8),
                      ecfg=ecfg)


def _standalone(engine, toks, max_new):
    out = engine.tree_spec_generate(
        np.asarray([toks]), np.asarray([len(toks)], np.int32),
        max_gen_len=max_new, state_dtype=jnp.float32)
    row = out["output_ids"][0]
    eos = engine.cfg.eos_token_id
    eos_pos = np.nonzero(row == eos)[0]
    stop = eos_pos[0] if len(eos_pos) else len(row)
    return row[:min(stop, max_new)].tolist()


def test_continuous_batching_token_exact(engine):
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, engine.cfg.vocab_size, (l,)).tolist()
               for l in (11, 7, 19, 13, 9, 16)]
    max_new = [12, 20, 8, 16, 24, 10]

    srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=32,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    uids = [srv.submit(p, m) for p, m in zip(prompts, max_new)]
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}

    assert sorted(comps) == sorted(uids)
    for uid, p, m in zip(uids, prompts, max_new):
        want = _standalone(engine, p, m)
        got = comps[uid].tokens
        n = min(len(want), len(got))
        assert got[:n] == want[:n], f"req {uid}: {got[:n]} vs {want[:n]}"
        # same stop decision too (budget or eos)
        assert len(got) == len(want), f"req {uid}: len {len(got)} vs {len(want)}"
    st = srv.stats()
    assert st["completions"] == len(uids)
    assert st["tokens_served"] == sum(len(c.tokens) for c in comps.values())
    assert st["pending"] == 0 and st["active_slots"] == 0


def test_slots_reused_and_interleaved(engine):
    """More requests than slots: slots must be reused; queue drains fully
    even when later requests arrive mid-flight."""
    rng = np.random.default_rng(9)
    srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=16,
                     prefill_buckets=(32,), state_dtype=jnp.float32)
    first = [srv.submit(rng.integers(2, 211, (10,)).tolist(), 8)
             for _ in range(3)]
    got = []
    got.extend(srv.step(rounds=2))
    late = srv.submit(rng.integers(2, 211, (25,)).tolist(), 8)
    got.extend(srv.run(rounds_per_step=2))
    uids = {c.uid for c in got}
    assert uids == set(first) | {late}
    for c in got:
        assert 1 <= len(c.tokens) <= 9


def test_admission_policies(engine):
    """Admission order follows the configured policy (n_slots=1 serializes
    admissions, so completion order IS admission order)."""
    rng = np.random.default_rng(11)

    def run(policy, submits):
        srv = SpecServer(engine, n_slots=1, s_max=96, max_new_cap=8,
                         prefill_buckets=(16, 32), state_dtype=jnp.float32,
                         policy=policy)
        uids = [srv.submit(rng.integers(2, 211, (l,)).tolist(), 4, priority=p)
                for l, p in submits]
        comps = srv.run(rounds_per_step=2)
        order = [c.uid for c in comps]
        # run() returns per-step harvests in completion order
        return uids, order

    # priority: highest first, FIFO within a level
    uids, order = run("priority", [(10, 0), (10, 5), (10, 5), (10, 9)])
    assert order == [uids[3], uids[1], uids[2], uids[0]], (uids, order)

    # sjf: shortest prompt first
    uids, order = run("sjf", [(20, 0), (6, 0), (13, 0)])
    assert order == [uids[1], uids[2], uids[0]], (uids, order)

    # packed: smallest prefill bucket first, longest-within-bucket
    uids, order = run("packed", [(20, 0), (9, 0), (14, 0), (30, 0)])
    # buckets (16, 32): lens 9,14 -> bucket 16; 20,30 -> bucket 32
    assert order == [uids[2], uids[1], uids[3], uids[0]], (uids, order)

    # fifo stays arrival-ordered
    uids, order = run("fifo", [(20, 3), (6, 9), (13, 0)])
    assert order == uids, (uids, order)


def test_policy_token_exactness(engine):
    """Scheduling policy never changes emitted tokens, only order."""
    rng = np.random.default_rng(13)
    prompts = [rng.integers(2, 211, (l,)).tolist() for l in (18, 7, 12)]
    outs = {}
    for policy in ("fifo", "sjf"):
        srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=8,
                         prefill_buckets=(32,), state_dtype=jnp.float32,
                         policy=policy)
        uids = [srv.submit(p, 6) for p in prompts]
        comps = {c.uid: c.tokens for c in srv.run(rounds_per_step=2)}
        outs[policy] = [comps[u] for u in uids]
    assert outs["fifo"] == outs["sjf"]


def test_budget_caps_cache_growth(engine):
    """A row with a small max_new parks as done at its budget inside the
    jitted segment (GenCarry.out_cap), so cache_lens never outruns
    submit()'s capacity reservation even across long decode segments."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(2, engine.cfg.vocab_size, (10,)).tolist()
    max_new = 4
    srv = SpecServer(engine, n_slots=1, s_max=64, max_new_cap=32,
                     prefill_buckets=(16,), state_dtype=jnp.float32)
    uid = srv.submit(prompt, max_new)
    # one big segment: without out_cap the row would decode toward
    # max_new_cap (32) before harvest notices the budget
    comps = srv.step(rounds=64)
    assert [c.uid for c in comps] == [uid]
    assert len(comps[0].tokens) <= max_new
    a_max = srv.a_max
    lens = np.asarray(srv._carry.state.cache_lens)
    assert lens[0] <= len(prompt) + max_new + a_max + 8, lens


def test_bucket_clamped_to_s_max(engine):
    """A prefill bucket larger than s_max must be clamped: the persistent
    prefill state has s_max rows, so an oversized bucket shape-mismatches
    the KV write (regression)."""
    rng = np.random.default_rng(9)
    prompt = rng.integers(2, engine.cfg.vocab_size, (40,)).tolist()
    srv = SpecServer(engine, n_slots=1, s_max=96, max_new_cap=16,
                     prefill_buckets=(32, 128), state_dtype=jnp.float32)
    uid = srv.submit(prompt, 8)
    comps = {c.uid: c for c in srv.run(rounds_per_step=3)}
    assert comps[uid].tokens == _standalone(engine, prompt, 8)
