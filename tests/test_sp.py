"""Sequence-parallel (attn_impl="sp") engine tests on the virtual 8-device
CPU mesh: the KV cache lives SEQUENCE-SHARDED across the mesh, prefill runs
as a ppermute ring, decode/verify as per-shard partials + exact LSE merge.

The reference has no sequence-parallel story (SURVEY §5: "Long-context SP:
absent") — its context ceiling is one GPU's HBM. This is the TPU build's
scale-out for 262k-class contexts (BASELINE north star), validated here for
correctness: sharded-cache generation is token-exact vs the spec-decoding
lossless gate, and every SP primitive matches its dense single-device oracle.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def sp_setup():
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.parallel import shardings as sh
    mesh = sh.make_mesh(dp=1, sp=8, tp=1)
    cfg = ModelConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=32, max_position_embeddings=4096)
    dcfg = DraftConfig(window=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    return mesh, cfg, dcfg, params, dparams


def test_sp_write_cache_rows_matches_dense(sp_setup):
    """Sharded scatter-write == single-device write_cache_rows (rank 4 + 5)."""
    from longspec_tpu.models.llama import write_cache_rows
    from longspec_tpu.parallel.ring import sp_write_cache_rows
    mesh, *_ = sp_setup
    rng = np.random.default_rng(0)
    B, Hkv, S, D, T = 3, 2, 64, 8, 5
    cache = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    starts = jnp.asarray([0, 13, S - T], jnp.int32)
    ref = write_cache_rows(cache, new, starts)
    got = sp_write_cache_rows(mesh, cache, new, starts)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    L = 2
    cache5 = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)).astype(np.float32))
    new5 = jnp.asarray(rng.normal(size=(L, B, T, Hkv, D)).astype(np.float32))
    ref5 = jax.vmap(write_cache_rows, in_axes=(0, 0, None))(cache5, new5, starts)
    got5 = sp_write_cache_rows(mesh, cache5, new5, starts)
    np.testing.assert_array_equal(np.asarray(got5), np.asarray(ref5))


def test_sp_prefill_matches_dense(sp_setup):
    """forward_prefill under attn_impl='sp' == dense oracle (hidden + caches)."""
    from longspec_tpu.models import llama as M
    from longspec_tpu.parallel.ring import SPAttn
    mesh, cfg, dcfg, params, dparams = sp_setup
    B, S, S_max = 2, 32, 64
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    lengths = jnp.asarray([S, S - 5], jnp.int32)
    kv_k, kv_v = M.alloc_kv_cache(cfg, B, S_max, jnp.float32)
    h_ref, ck_ref, cv_ref = M.forward_prefill(params, cfg, tokens, lengths,
                                              kv_k, kv_v, attn_impl="dense")
    with mesh:
        h_sp, ck_sp, cv_sp = M.forward_prefill(params, cfg, tokens, lengths,
                                               kv_k, kv_v,
                                               attn_impl=SPAttn(mesh))
    # rows beyond a batch's length hold garbage in both impls; compare valid
    ln = np.asarray(lengths)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(h_sp)[b, :ln[b]],
                                   np.asarray(h_ref)[b, :ln[b]],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ck_sp)[:, b, :, :ln[b]],
                                   np.asarray(ck_ref)[:, b, :, :ln[b]],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cv_sp)[:, b, :, :ln[b]],
                                   np.asarray(cv_ref)[:, b, :, :ln[b]],
                                   rtol=2e-4, atol=2e-4)


def test_sp_tree_spec_lossless(sp_setup):
    """Tree speculation over the sequence-sharded cache is token-exact vs the
    SP vanilla loop — the T=0 lossless gate holds under SP partitioning."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = sp_setup
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="sp")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg, mesh=mesh)
    B = 2
    prompts = np.random.default_rng(3).integers(2, cfg.vocab_size, (B, 24))
    lens = np.full((B,), 24, np.int32)
    with mesh:
        van = eng.vanilla_generate(prompts, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        tree = eng.tree_spec_generate(prompts, lens, max_gen_len=16,
                                      state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(van["output_ids"][:, :n], tree["output_ids"][:, :n]), \
        (van["output_ids"][:, :n], tree["output_ids"][:, :n])


def test_sp_chain_spec_lossless(sp_setup):
    """Chain speculation (draft cache also sequence-sharded) stays lossless."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = sp_setup
    ecfg = EngineConfig(gamma=3, attn_impl="sp")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg, mesh=mesh)
    B = 2
    prompts = np.random.default_rng(4).integers(2, cfg.vocab_size, (B, 24))
    lens = np.full((B,), 24, np.int32)
    with mesh:
        van = eng.vanilla_generate(prompts, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        chain = eng.spec_generate(prompts, lens, max_gen_len=16,
                                  state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(van["output_ids"][:, :n], chain["output_ids"][:, :n])


def test_sp_vs_unsharded_logits(sp_setup):
    """SP vanilla decode emits the same tokens as the plain single-device
    engine on a well-separated model (distinct rows; argmax margins are
    O(1) for random init at this width, so reduction-order ties are absent
    at fp32 tolerances)."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = sp_setup
    eng_sp = SpecEngine(params, dparams, cfg, dcfg,
                        EngineConfig(attn_impl="sp"), mesh=mesh)
    eng_ref = SpecEngine(params, dparams, cfg, dcfg,
                         EngineConfig(attn_impl="dense"))
    B = 1
    prompts = np.random.default_rng(5).integers(2, cfg.vocab_size, (B, 16))
    lens = np.full((B,), 16, np.int32)
    with mesh:
        van_sp = eng_sp.vanilla_generate(prompts, lens, max_gen_len=8,
                                         state_dtype=jnp.float32)
    van_ref = eng_ref.vanilla_generate(prompts, lens, max_gen_len=8,
                                       state_dtype=jnp.float32)
    assert np.array_equal(van_sp["output_ids"][:, :8],
                          van_ref["output_ids"][:, :8])


@pytest.mark.slow  # ~220s: grad-of-shard_map ring compile dominates
def test_sp_draft_training_grads_match(sp_setup):
    """Sequence-parallel draft TRAINING: the full training loss (ring target
    forward + SP cross-attention over the sequence-sharded teacher KV)
    differentiates through shard_map — pmax rides a stop_gradient (the LSE
    stabilizer's gradient cancels identically) — and the gradients match the
    dense single-device trainer. This is the >1-chip path for training at
    sequence lengths past one chip's activation memory."""
    import jax.flatten_util
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.parallel.ring import SPAttn
    mesh, cfg, dcfg, params, dparams = sp_setup
    B, S = 2, 32
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))

    def loss_fn(dp_, attn):
        h, (lk, lv) = M.forward_train(params, cfg, tokens, pos,
                                      return_last_kv=True, attn_impl=attn)
        out = G.glide_train_forward(dp_, cfg, dcfg, M.embed(params, tokens),
                                    pos, lk, lv, jnp.int32(2), attn_impl=attn)
        logits = M.logits_at(params, out)
        tgt = jnp.roll(tokens, -1, 1)
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    l_d = loss_fn(dparams, "dense")
    g_d = jax.grad(loss_fn)(dparams, "dense")
    with mesh:
        l_s = loss_fn(dparams, SPAttn(mesh))
        g_s = jax.grad(loss_fn)(dparams, SPAttn(mesh))
    assert abs(float(l_d) - float(l_s)) < 1e-4, (float(l_d), float(l_s))
    fd, _ = jax.flatten_util.ravel_pytree(g_d)
    fs, _ = jax.flatten_util.ravel_pytree(g_s)
    err = float(jnp.max(jnp.abs(fd - fs)) / (1e-8 + jnp.max(jnp.abs(fd))))
    assert err < 1e-3, err


@pytest.mark.slow  # ~36s compile: QuantKV-of-shard_map primitives
def test_sp_int8_primitives_match_dense(sp_setup):
    """QuantKV over the sequence-sharded layout: sp_write_cache_rows
    quantizes rows into sharded int8+scale pools identically to the dense
    int8 write, and sp_flash_decode over the sharded QuantKV equals the
    dense oracle on the dequantized cache."""
    from longspec_tpu.models.llama import (write_cache_rows,
                                           sliced_prefix_attention)
    from longspec_tpu.parallel.ring import sp_write_cache_rows, sp_flash_decode
    from longspec_tpu.ops.quantkv import QuantKV, alloc_quant_kv, dequant
    mesh, *_ = sp_setup
    rng = np.random.default_rng(6)
    B, Hkv, S, D, T, H = 2, 2, 64, 16, 5, 4
    cache = alloc_quant_kv((B, Hkv, S, D))
    new = jnp.asarray(rng.normal(size=(B, T, Hkv, D)).astype(np.float32))
    starts = jnp.asarray([0, 40], jnp.int32)
    ref = write_cache_rows(alloc_quant_kv((B, Hkv, S, D)), new, starts)
    got = sp_write_cache_rows(mesh, cache, new, starts)
    np.testing.assert_array_equal(np.asarray(got.qv), np.asarray(ref.qv))
    np.testing.assert_array_equal(np.asarray(got.scale), np.asarray(ref.scale))

    # fill more rows, then decode-attend over the sharded quantized cache
    full = jnp.asarray(rng.normal(size=(B, 48, Hkv, D)).astype(np.float32))
    cache = sp_write_cache_rows(mesh, got, full, jnp.zeros((B,), jnp.int32))
    q = jnp.asarray(rng.normal(size=(B, 3, H, D)).astype(np.float32))
    k_hi = jnp.asarray([45, 33], jnp.int32)
    q_pos = k_hi[:, None] + jnp.arange(3)[None, :]
    o_ref, lse_ref = sliced_prefix_attention(
        q, cache, cache, k_hi, q_pos, None, 0, "dense")
    o, lse = sp_flash_decode(mesh, q, cache, cache, k_hi, q_pos)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                               rtol=2e-5, atol=2e-5)
    # windowed + anchors variant
    o_refw, _ = sliced_prefix_attention(
        q, cache, cache, k_hi, q_pos, 16, 2, "dense")
    ow, _ = sp_flash_decode(mesh, q, cache, cache, k_hi, q_pos, 16, 2)
    np.testing.assert_allclose(np.asarray(ow), np.asarray(o_refw),
                               rtol=2e-5, atol=2e-5)


def test_sp_int8_tree_spec_lossless(sp_setup):
    """int8 KV composes with the sequence-sharded layout: the whole tree
    engine runs over a sharded QuantKV cache (each shard dequantizes only
    its slice) and stays token-exact vs SP vanilla on the same cache."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = sp_setup
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="sp",
                        kv_quant="int8")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg, mesh=mesh)
    B = 2
    prompts = np.random.default_rng(8).integers(2, cfg.vocab_size, (B, 24))
    lens = np.full((B,), 24, np.int32)
    with mesh:
        st = eng.init_state(B, 64, jnp.float32)
        from longspec_tpu.ops.quantkv import QuantKV
        assert isinstance(st.kv_k, QuantKV)
        van = eng.vanilla_generate(prompts, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        tree = eng.tree_spec_generate(prompts, lens, max_gen_len=16,
                                      state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(van["output_ids"][:, :n], tree["output_ids"][:, :n]), \
        (van["output_ids"][:, :n], tree["output_ids"][:, :n])
