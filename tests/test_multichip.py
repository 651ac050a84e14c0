"""Multi-chip regression tests on the virtual 8-device CPU mesh
(conftest forces `--xla_force_host_platform_device_count=8`).

Round 1 validated (dp, tp) sharding only via the driver's end-of-round
dryrun; these tests put the same substance in pytest so a sharding
regression fails CI, not the round. TPU-native counterpart of the
reference's distributed substrate (DeepSpeed ZeRO/fairscale/NCCL,
SURVEY.md §2.4) — collectives are XLA-inserted over the mesh.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def mesh_and_models():
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.parallel import shardings as sh
    dp, tp = 2, 4
    mesh = sh.make_mesh(dp=dp, tp=tp)
    cfg = ModelConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                      num_layers=2, num_heads=2 * tp, num_kv_heads=tp,
                      head_dim=32, max_position_embeddings=4096)
    dcfg = DraftConfig(window=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    params = sh.shard_tree(params, sh.param_pspecs(cfg), mesh)
    dparams = sh.shard_tree(dparams, sh.draft_pspecs(), mesh)
    return mesh, cfg, dcfg, params, dparams


def test_sharded_train_step(mesh_and_models):
    """dp=2/tp=4 draft train step: runs, loss finite, grads flow."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from longspec_tpu.train import trainer as T
    mesh, cfg, dcfg, params, dparams = mesh_and_models
    opt = T.make_optimizer(lr=1e-3, warmup_steps=2, total_steps=10)
    # the step donates its state; train on a copy so the module-scoped
    # draft params survive for the other tests
    state = T.init_train_state(jax.tree.map(jnp.copy, dparams), opt)
    step_fn = T.make_train_step(cfg, dcfg, opt, attn_impl="chunked")
    B, S = 4, 64
    tokens = jax.device_put(
        np.random.default_rng(0).integers(2, cfg.vocab_size, (B, S))
        .astype(np.int32), NamedSharding(mesh, P("dp", None)))
    with mesh:
        losses = []
        for i in range(2):
            state, m = step_fn(state, params, tokens, tokens,
                               jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert float(m["gnorm"]) > 0


def test_sharded_tree_spec_lossless(mesh_and_models):
    """Sharded tree-spec output is token-exact vs the sharded vanilla loop —
    the T=0 lossless gate holds under (dp, tp) partitioning (KV sharded on
    kv-heads, lm_head vocab-sharded)."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = mesh_and_models
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="chunked")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    eng.mesh = mesh
    B = 2
    prompts = np.random.default_rng(1).integers(2, cfg.vocab_size, (B, 24))
    lens = np.full((B,), 24, np.int32)
    with mesh:
        van = eng.vanilla_generate(prompts, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        tree = eng.tree_spec_generate(prompts, lens, max_gen_len=16,
                                      state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(van["output_ids"][:, :n], tree["output_ids"][:, :n]), \
        (van["output_ids"][:, :n], tree["output_ids"][:, :n])


def test_sharded_tree_spec_lossless_int8_kv(mesh_and_models):
    """Same gate with the int8 KV cache: QuantKV rows shard on kv-heads over
    tp (scales alongside, minus the head-dim axis) and the sharded T=0
    lossless invariant holds."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = mesh_and_models
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="chunked",
                        kv_quant="int8")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    eng.mesh = mesh
    B = 2
    prompts = np.random.default_rng(3).integers(2, cfg.vocab_size, (B, 24))
    lens = np.array([24, 17], np.int32)
    with mesh:
        van = eng.vanilla_generate(prompts, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        tree = eng.tree_spec_generate(prompts, lens, max_gen_len=16,
                                      state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(van["output_ids"][:, :n], tree["output_ids"][:, :n]), \
        (van["output_ids"][:, :n], tree["output_ids"][:, :n])


def test_sharded_tree_spec_int8_head_lossless_and_matches_unsharded(
        mesh_and_models):
    """draft_head='int8' + tp-sharded vocab compose (round-3; previously the
    engine silently fell back to full logits): the sharded int8-head tree
    engine is (a) T=0 lossless vs its own vanilla loop and (b) emits the
    SAME tokens as the unsharded int8-head engine — shard-local quantized
    scoring is bit-identical per-column, so beam candidates match."""
    from longspec_tpu.engine.engine import SpecEngine
    mesh, cfg, dcfg, params, dparams = mesh_and_models
    ecfg = EngineConfig(tree_shape=(2, 3, 3), gamma=3, attn_impl="chunked",
                        draft_head="int8")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    eng.mesh = mesh
    host_params = jax.tree.map(np.asarray, params)
    host_dparams = jax.tree.map(np.asarray, dparams)
    eng1 = SpecEngine(host_params, host_dparams, cfg, dcfg, ecfg)
    B = 2
    prompts = np.random.default_rng(3).integers(2, cfg.vocab_size, (B, 24))
    lens = np.full((B,), 24, np.int32)
    with mesh:
        van = eng.vanilla_generate(prompts, lens, max_gen_len=16,
                                   state_dtype=jnp.float32)
        tree = eng.tree_spec_generate(prompts, lens, max_gen_len=16,
                                      state_dtype=jnp.float32)
    tree1 = eng1.tree_spec_generate(prompts, lens, max_gen_len=16,
                                    state_dtype=jnp.float32)
    n = 14
    assert np.array_equal(van["output_ids"][:, :n], tree["output_ids"][:, :n])
    assert np.array_equal(tree1["output_ids"][:, :n],
                          tree["output_ids"][:, :n])
    # beam quality parity: same accept statistics, not just same emissions
    assert tree["count"] == tree1["count"] and tree["num"] == tree1["num"]
