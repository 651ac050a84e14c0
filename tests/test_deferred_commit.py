"""Deferred-commit law regression tests (round-4 postmortem).

Commit 1423c51 moved the KV commit out of the round that produced it: the
accepted rows are stashed in a tiny `pend_*` scratch and flushed at the TOP
of the next round (write-before-read, so the carried cache aliases in place
— `engine._flush_pending`). Round 4 shipped that rework with NO test of the
law it must preserve, and the hard_8k bench row went red (the vanilla and
tree arms' committed K/V rows drifted from generated position 1,
`bitdiff_hard8k_r4.log`).

The law, tested here on the CPU oracle:

  1. CROSS-ARM: at T=0 under `uniform_decode_shape` every method's decode
     loop calls THE one verify program (`engine._verify_forward`), so the
     vanilla, chain, and tree arms must leave BIT-IDENTICAL committed K/V
     rows for the token positions they agree on — not merely equal tokens.
     (Reference invariant: T=0 spec ≡ greedy, `llama_glide.py:1128-1175`;
     the bit-level cache form is what makes it robust to margins.)
  2. DEFER ≡ IN-ROUND: the deferred flush must commit exactly the rows the
     in-round commit would have written — same data, same positions.
  3. FLUSH AT REST: the state returned by `generate(..., return_state=True)`
     has every row `cache_lens` counts actually present in the cache (the
     last round's rows are not stranded in the pend scratch).
"""
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine


def build_engine(attn_impl="chunked", uniform=True, seed=0, vocab=211,
                 tree_shape=(2, 3, 3), gamma=3, decode_precision="highest"):
    # default "highest" here: these tests assert the STRICT bit-equality
    # contract; the default engine law ("bf16_pinned") has its own
    # token-exactness + bounded-drift tests below.
    cfg = tiny_test(vocab_size=vocab, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(seed), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(seed + 1), cfg)
    ecfg = EngineConfig(tree_shape=tree_shape, gamma=gamma, temperature=0.0,
                        attn_impl=attn_impl, uniform_decode_shape=uniform,
                        decode_precision=decode_precision)
    dcfg = DraftConfig(window=8)
    return SpecEngine(params, dparams, cfg, dcfg, ecfg), cfg


def _prompt(cfg, B=2, S=17, seed=3):
    rng = np.random.default_rng(seed)
    toks = rng.integers(2, cfg.vocab_size, (B, S))
    lens = np.array([S, S - 5], np.int32)
    return toks, lens


def _committed_rows(state, b, lo, hi):
    """Host copies of cache rows [lo, hi) of batch row b, all layers/heads."""
    k = np.asarray(jax.device_get(state.kv_k))[:, b, :, lo:hi, :]
    v = np.asarray(jax.device_get(state.kv_v))[:, b, :, lo:hi, :]
    return k, v


def _bit_view(a):
    return a.view(np.uint16) if a.dtype.itemsize == 2 else a


def _agree_len(a_row, b_row, eos):
    n = 0
    for x, y in zip(a_row, b_row):
        if x != y:
            break
        n += 1
        if x == eos:
            break
    return n


@pytest.mark.parametrize("arm", ["spec_generate", "tree_spec_generate"])
@pytest.mark.parametrize("state_dtype", [jnp.bfloat16, jnp.float32])
def test_cross_arm_committed_kv_bitequal(arm, state_dtype):
    """Vanilla vs spec arms: committed K/V rows bit-identical over the
    agreed token prefix (the exact class bitdiff_hard8k_r4.log caught on
    hardware with no CI-side counterpart)."""
    eng, cfg = build_engine()
    toks, lens = _prompt(cfg)
    max_gen = 24
    s_max = int(max(lens)) + max_gen + eng.ecfg.tree_size + 8

    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=state_dtype, s_max=s_max,
                               return_state=True)
    spec = getattr(eng, arm)(toks, lens, max_gen_len=max_gen,
                             state_dtype=state_dtype, s_max=s_max,
                             return_state=True)
    rows_checked = 0
    for b in range(toks.shape[0]):
        plen = int(lens[b])
        n = _agree_len(van["output_ids"][b], spec["output_ids"][b],
                       cfg.eos_token_id)
        if int(van["output_ids"][b][0]) == cfg.eos_token_id:
            continue   # prefill emitted eos: nothing was committed
        assert n >= 2, f"arms diverged immediately on row {b}"
        rows_checked += 1
        # committed rows for generated tokens t0..t_{n-2} live at
        # plen..plen+n-1 (t0 itself comes from prefill; each generated
        # token's K/V row is committed when the NEXT forward consumes it,
        # so the last agreed token's row may still be uncommitted junk in
        # one arm — compare up to n-1 rows)
        kv_v_van = _committed_rows(van["state"], b, plen, plen + n - 1)
        kv_v_spec = _committed_rows(spec["state"], b, plen, plen + n - 1)
        for name, a, c in (("K", kv_v_van[0], kv_v_spec[0]),
                           ("V", kv_v_van[1], kv_v_spec[1])):
            if state_dtype == jnp.bfloat16:
                # THE production law (bench rows run bf16 caches): the bf16
                # commit grid is a deterministic quantizer — the arms'
                # fp32-island drift (different prefix/suffix attention
                # splits) stays below half a bf16 ulp, so committed rows
                # are BIT-identical. Commit 1423c51's regression (default-
                # precision MXU dots, drift 0.023 >> bf16 ulp) fails here.
                eq = _bit_view(a) == _bit_view(c)
                assert bool(np.all(eq)), (
                    f"{arm} row {b}: {name} rows drift from committed "
                    f"position "
                    f"{int(np.argwhere(~np.all(eq, axis=(0, 1, 3)))[0][0])} "
                    f"(agreed tokens: {n})")
            else:
                # fp32 caches keep the split-dependent reduction drift
                # (~1e-4 abs measured); losslessness there rests on token
                # margins, not bit equality — bound the drift
                np.testing.assert_allclose(a.astype(np.float32),
                                           c.astype(np.float32),
                                           atol=2e-3, rtol=2e-3)
    assert rows_checked >= 1, "every row eos'd at t0 — pick another prompt"


@pytest.mark.parametrize("arm", ["spec_generate", "tree_spec_generate"])
@pytest.mark.parametrize("dprec", ["bf16_pinned", "high"])
def test_decode_precision_laws_lossless(arm, dprec):
    """The alternative decode-precision laws (EngineConfig.decode_precision
    "bf16_pinned" / "high") must keep T=0 arms token-exact on the emitted
    stream. "high" keeps the cross-arm drift seed linear-small (~2^-19) so
    committed rows stay bit-identical like "highest"; "bf16_pinned" rounds
    the QUERY activations — the cross-arm split drift then amplifies at
    rounding boundaries into occasional 1-ulp committed-row flips (allowed,
    bounded), which is the documented trade for its one-pass MXU speed."""
    eng, cfg = build_engine(decode_precision=dprec)
    toks, lens = _prompt(cfg, seed=17)
    max_gen = 20
    s_max = int(max(lens)) + max_gen + eng.ecfg.tree_size + 8
    van = eng.vanilla_generate(toks, lens, max_gen_len=max_gen,
                               state_dtype=jnp.bfloat16, s_max=s_max,
                               return_state=True)
    spec = getattr(eng, arm)(toks, lens, max_gen_len=max_gen,
                             state_dtype=jnp.bfloat16, s_max=s_max,
                             return_state=True)
    rows_checked = 0
    for b in range(toks.shape[0]):
        if int(van["output_ids"][b][0]) == cfg.eos_token_id:
            continue
        n = _agree_len(van["output_ids"][b], spec["output_ids"][b],
                       cfg.eos_token_id)
        # token-exact over the whole emitted stream (both rows run to
        # max_gen or eos together)
        v = [int(x) for x in van["output_ids"][b][:max_gen]]
        s = [int(x) for x in spec["output_ids"][b][:max_gen]]
        ve = v.index(cfg.eos_token_id) if cfg.eos_token_id in v else max_gen
        assert v[:ve] == s[:ve], f"{dprec} {arm} row {b} tokens diverge"
        plen = int(lens[b])
        kv = _committed_rows(van["state"], b, plen, plen + n - 1)
        ks = _committed_rows(spec["state"], b, plen, plen + n - 1)
        for name, a, c in (("K", kv[0], ks[0]), ("V", kv[1], ks[1])):
            if dprec == "high":
                assert bool(np.all(_bit_view(a) == _bit_view(c))), (
                    f"{dprec} {arm} row {b}: {name} rows drift")
            else:
                # bounded ulp-class drift only
                np.testing.assert_allclose(a.astype(np.float32),
                                           c.astype(np.float32),
                                           atol=0.05, rtol=0.05)
        rows_checked += 1
    assert rows_checked >= 1


def test_deferred_equals_inround_commit():
    """Tree arm with the deferred commit (generate()'s path) vs a manually
    driven in-round-commit carry: identical tokens AND bit-identical
    committed cache rows."""
    eng, cfg = build_engine()
    toks, lens = _prompt(cfg, seed=11)
    max_gen = 20
    s_max = int(max(lens)) + max_gen + eng.ecfg.tree_size + 8

    deferred = eng.tree_spec_generate(toks, lens, max_gen_len=max_gen,
                                      state_dtype=jnp.bfloat16, s_max=s_max,
                                      return_state=True)

    # manual drive with defer=False: rounds commit in-round (the pre-1423c51
    # law), same prefill/seed
    state = eng.init_state(toks.shape[0], s_max, jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    rng, k_pre, k_gen = jax.random.split(rng, 3)
    prefill = jax.jit(eng._prefill_impl)
    state, t0, _ = prefill(eng.params, eng.draft_params,
                           jnp.asarray(toks, jnp.int32),
                           jnp.asarray(lens, jnp.int32), state, k_pre)
    A = eng.ecfg.tree_depth + 1
    carry = eng._spec_carry(state, t0, max_gen, k_gen, A, defer=False)
    seg = jax.jit(functools.partial(eng._spec_segment, eng._tree_round))
    for _ in range(max_gen + 4):
        carry, status = seg(eng.params, eng._decode_draft_params, carry,
                            jnp.int32(4 * max_gen))
        if int(np.asarray(status)) % 2 == 1:
            break
        if int(np.min(np.asarray(carry.out_len))) >= max_gen:
            break
    assert carry.pend_k is None  # really the in-round path

    out_d = deferred["output_ids"]
    out_i = np.asarray(carry.output_ids)
    lens_d = np.asarray(deferred["state"].cache_lens)
    lens_i = np.asarray(carry.state.cache_lens)
    rows_checked = 0
    for b in range(toks.shape[0]):
        if int(out_d[b][0]) == cfg.eos_token_id:
            continue   # prefill emitted eos: nothing was committed
        n = _agree_len(out_d[b], out_i[b], cfg.eos_token_id)
        assert n >= 2, f"paths diverged at {n} on row {b}"
        rows_checked += 1
        plen = int(lens[b])
        hi = plen + min(int(lens_d[b]), int(lens_i[b])) - plen
        kd = _committed_rows(deferred["state"], b, plen, hi)
        ki = _committed_rows(carry.state, b, plen, hi)
        for name, a, c in (("K", kd[0], ki[0]), ("V", kd[1], ki[1])):
            assert bool(np.all(_bit_view(a) == _bit_view(c))), (
                f"deferred vs in-round {name} rows differ on row {b}")
    assert rows_checked >= 1, "every row eos'd at t0 — pick another prompt"


def test_state_at_rest_is_flushed():
    """generate(return_state=True): rows `cache_lens` counts are PRESENT —
    the final round's accepted rows must not be stranded in the pend
    scratch (they must match what a fresh target forward of the emitted
    tokens produces)."""
    eng, cfg = build_engine()
    toks, lens = _prompt(cfg, seed=29)
    max_gen = 16
    s_max = int(max(lens)) + max_gen + eng.ecfg.tree_size + 8
    res = eng.tree_spec_generate(toks, lens, max_gen_len=max_gen,
                                 state_dtype=jnp.float32, s_max=s_max,
                                 return_state=True)
    st = res["state"]
    out = res["output_ids"]
    cache_lens = np.asarray(st.cache_lens)
    rows_checked = 0
    for b in range(toks.shape[0]):
        if int(out[b][0]) == cfg.eos_token_id:
            continue   # prefill emitted eos: nothing was committed
        plen = int(lens[b])
        n_committed = int(cache_lens[b]) - plen
        assert n_committed >= 1
        rows_checked += 1
        # recompute the committed rows with a clean prefill of
        # prompt + emitted tokens: they must match the at-rest cache
        full = np.concatenate(
            [np.asarray(toks[b][:plen]),
             np.asarray(out[b][:n_committed])]).astype(np.int32)[None]
        ref_state = eng.init_state(1, s_max, jnp.float32)
        ref_state, _, _ = jax.jit(eng._prefill_impl)(
            eng.params, eng.draft_params, jnp.asarray(full),
            jnp.asarray([full.shape[1]], np.int32), ref_state,
            jax.random.PRNGKey(5))
        got_k, got_v = _committed_rows(st, b, plen, plen + n_committed)
        ref_k, ref_v = _committed_rows(ref_state, 0, plen, plen + n_committed)
        # prefill computes in one big block, decode in verify-shaped blocks:
        # values agree to fp32 reduction-order tolerance (the at-rest check
        # is about PRESENCE of the rows, not bit equality across different
        # legal schedules)
        np.testing.assert_allclose(got_k.astype(np.float32),
                                   ref_k.astype(np.float32),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(got_v.astype(np.float32),
                                   ref_v.astype(np.float32),
                                   rtol=2e-2, atol=2e-2)
        # and specifically NOT the pend-scratch zeros
        assert float(np.max(np.abs(got_k.astype(np.float32)))) > 0.0
    assert rows_checked >= 1, "every row eos'd at t0 — pick another prompt"
