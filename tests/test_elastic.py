"""Elastic paged serving: grow-as-you-decode page allocation with
hibernation-based preemption (SpecServer(kv="paged", paging="elastic")).

Unlike reserved paging (a request's full token budget is reserved at
admission), elastic admission takes only the prompt + one round's headroom
and tops up before each decode segment; under pool pressure the youngest
active request is PREEMPTED — pages and slot state swapped to the host,
request requeued — and later restored bit-exact. The invariants:

  * token-exactness: every completion equals the standalone decode, even
    for requests that were preempted and restored mid-generation (swap
    restores the exact KV bytes; nothing is recomputed);
  * progress: the oldest active request is never the victim, so a pool
    that fits any single request can never deadlock;
  * concurrency win: a pool too small for two RESERVED requests runs two
    elastic ones concurrently.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine
from longspec_tpu.ops.pallas_paged import PagedAttn
from longspec_tpu.serve import SpecServer


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_test(vocab_size=211, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, temperature=0.0,
                        attn_impl=PagedAttn(16))
    return SpecEngine(params, dparams, cfg, dcfg=DraftConfig(window=8),
                      ecfg=ecfg)


@pytest.fixture(scope="module")
def dense_ref(engine):
    return SpecEngine(engine.params, engine.draft_params, engine.cfg,
                      engine.dcfg,
                      EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                   temperature=0.0, attn_impl="dense"))


def _standalone(ref, toks, max_new):
    out = ref.tree_spec_generate(
        np.asarray([toks]), np.asarray([len(toks)], np.int32),
        max_gen_len=max_new, state_dtype=jnp.float32)
    row = out["output_ids"][0]
    eos_pos = np.nonzero(row == ref.cfg.eos_token_id)[0]
    stop = eos_pos[0] if len(eos_pos) else len(row)
    return row[:min(stop, max_new)].tolist()


def test_elastic_preempts_and_stays_token_exact(engine, dense_ref):
    """Pool sized so two growing requests collide: the younger hibernates,
    the older finishes, the younger restores — all completions exact."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, engine.cfg.vocab_size, (10,)).tolist()
               for _ in range(3)]
    max_new = 40
    # full need per request: 10 + 40 + a_max(4) + 8 = 62 tok = 4 pages of 16.
    # pool: 6 usable (+1 scratch) -> two full requests (8 pages) cannot
    # coexist reserved; elastic admits both at 2 pages and preempts on growth.
    srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=64,
                     prefill_buckets=(16,), state_dtype=jnp.float32,
                     kv="paged", pool_pages=7, paging="elastic")
    uids = [srv.submit(p, max_new) for p in prompts]
    comps = {c.uid: c for c in srv.run(rounds_per_step=4)}
    assert sorted(comps) == sorted(uids)
    assert srv.preemptions >= 1, srv.stats()
    for uid, p in zip(uids, prompts):
        want = _standalone(dense_ref, p, max_new)
        assert comps[uid].tokens == want, (uid, comps[uid].tokens, want)
    st = srv.stats()
    assert st["paging"] == "elastic" and st["hibernated"] == 0
    assert st["pool"]["live_seqs"] == 1  # the permanent scratch page


def test_elastic_concurrency_beats_reserved(engine):
    """The same pool admits TWO elastic requests concurrently where
    reserved admission serializes them."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, engine.cfg.vocab_size, (10,)).tolist()
               for _ in range(2)]
    peak = {}
    for paging in ("reserved", "elastic"):
        srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=64,
                         prefill_buckets=(16,), state_dtype=jnp.float32,
                         kv="paged", pool_pages=7, paging=paging)
        for p in prompts:
            srv.submit(p, 40)
        srv._admit()
        peak[paging] = srv.active_slots
        srv.run(rounds_per_step=4)
    assert peak["reserved"] == 1, peak
    assert peak["elastic"] == 2, peak


def test_elastic_no_pressure_no_preemption(engine, dense_ref):
    """With an ample pool, elastic behaves like reserved (no preemptions)
    and stays exact."""
    rng = np.random.default_rng(7)
    p = rng.integers(2, engine.cfg.vocab_size, (13,)).tolist()
    srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=32,
                     prefill_buckets=(16,), state_dtype=jnp.float32,
                     kv="paged", pool_pages=16, paging="elastic")
    uid = srv.submit(p, 20)
    comps = {c.uid: c for c in srv.run(rounds_per_step=4)}
    assert srv.preemptions == 0
    assert comps[uid].tokens == _standalone(dense_ref, p, 20)


def test_cancel_hibernated_request(engine):
    """A cancelled hibernated request leaves no state behind."""
    rng = np.random.default_rng(9)
    prompts = [rng.integers(2, engine.cfg.vocab_size, (10,)).tolist()
               for _ in range(3)]
    srv = SpecServer(engine, n_slots=2, s_max=96, max_new_cap=64,
                     prefill_buckets=(16,), state_dtype=jnp.float32,
                     kv="paged", pool_pages=7, paging="elastic")
    uids = [srv.submit(p, 40) for p in prompts]
    # run until someone hibernates
    for _ in range(50):
        srv.step(rounds=4)
        if srv._hibernated:
            break
    if srv._hibernated:
        victim = next(iter(srv._hibernated))
        assert srv.cancel(victim)
        assert victim not in srv._hibernated
    done = srv.run(rounds_per_step=4)
    finished = {c.uid for c in done}
    # everything not cancelled completed
    assert all(u in finished or u not in srv._requests for u in uids)
    assert srv.stats()["pool"]["live_seqs"] == 1  # scratch page only
