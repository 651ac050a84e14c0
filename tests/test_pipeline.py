"""Pipeline parallelism (parallel/pipeline.py, P3): the [L,...] layer stack
staged over a `pp` mesh axis with a ppermute scan schedule.

Gates: forward equality (incl. the last-layer KV contract GLIDE distillation
consumes) and grad equality vs the single-device layer scan, on pp-only and
dp x pp meshes, with ragged lengths and both even/uneven microbatch loads.
The reference ships pp group helpers only (dist_utils.py:102-109, pp_size=1
everywhere) — equality vs the sequential stack is the correctness oracle.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.parallel import pipeline as PP


def _setup(seed=0, L=4, B=4, S=24):
    cfg = tiny_test(vocab_size=127, num_layers=L)
    params = M.init_params(jax.random.PRNGKey(seed), cfg, jnp.float32)
    rng = np.random.default_rng(seed + 1)
    tokens = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)), jnp.int32)
    lengths = jnp.asarray([S, S - 5, S - 1, S][:B], jnp.int32)
    return cfg, params, tokens, lengths


@pytest.mark.parametrize("pp,dp,n_micro", [(4, 1, 4), (2, 2, 2), (2, 1, 4)])
def test_pipeline_forward_matches_scan(pp, dp, n_micro):
    cfg, params, tokens, lengths = _setup()
    mesh = PP.make_pp_mesh(pp, dp=dp)
    ref, (k_ref, v_ref) = M.forward_train(params, cfg, tokens,
                                          lengths=lengths, remat=False,
                                          return_last_kv=True)
    with mesh:
        out, (k, v) = PP.pipeline_forward_train(
            mesh, params, cfg, tokens, lengths=lengths, n_micro=n_micro,
            remat=False, return_last_kv=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_grad_matches_scan():
    """jax.grad THROUGH the ppermute schedule == grad of the layer scan —
    the property that makes the pipeline usable for full-model training
    without a hand-written backward schedule."""
    cfg, params, tokens, lengths = _setup(seed=3)
    mesh = PP.make_pp_mesh(2, dp=2)
    tgt = jax.random.normal(jax.random.PRNGKey(9),
                            (*tokens.shape, cfg.hidden_size), jnp.float32)

    def loss_ref(layers):
        p = dict(params, layers=layers)
        h = M.forward_train(p, cfg, tokens, lengths=lengths, remat=False)
        return jnp.mean((h - tgt) ** 2)

    def loss_pp(layers):
        p = dict(params, layers=layers)
        with mesh:
            h = PP.pipeline_forward_train(mesh, p, cfg, tokens,
                                          lengths=lengths, n_micro=2,
                                          remat=True)
        return jnp.mean((h - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(params["layers"])
    g_pp = jax.grad(loss_pp)(params["layers"])
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_ref[k]),
                                   atol=1e-5, rtol=1e-4, err_msg=k)


def test_pp_teacher_train_step_matches_plain():
    """train.teacher_pp: the frozen-teacher forward runs pipeline-parallel
    inside the draft train step; loss and draft grads must match the
    single-device teacher (the teacher is frozen — only its ACTIVATIONS
    flow into the draft loss)."""
    from longspec_tpu.config import DraftConfig
    from longspec_tpu.models import glide as G
    from longspec_tpu.train import trainer as T

    cfg, params, tokens, lengths = _setup(seed=7, L=4, B=4, S=24)
    dcfg = DraftConfig(window=8)
    dparams = G.init_draft_params(jax.random.PRNGKey(11), cfg)
    opt = T.make_optimizer(lr=1e-3, warmup_steps=2, total_steps=10)
    mesh = PP.make_pp_mesh(2, dp=2)
    labels = tokens

    def run(pp_mesh):
        step = T.make_train_step(cfg, dcfg, opt, anchor_offset=False,
                                 pp_mesh=pp_mesh, pp_micro=2)
        state = T.init_train_state(
            jax.tree_util.tree_map(jnp.copy, dparams), opt)
        with (pp_mesh or jax.sharding.Mesh(np.asarray(jax.devices()[:1]),
                                           ("x",))):
            state, metrics = step(state, params, tokens, labels,
                                  jax.random.PRNGKey(3))
        return float(metrics["loss"]), state.draft_params

    loss_ref, dp_ref = run(None)
    loss_pp, dp_pp = run(mesh)
    assert abs(loss_ref - loss_pp) < 1e-4, (loss_ref, loss_pp)
    ra = jax.tree_util.tree_leaves(dp_ref)
    rb = jax.tree_util.tree_leaves(dp_pp)
    for a, b in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_pp_teacher_composes_with_lora():
    """train.teacher_pp x LoRA: the pipelined frozen teacher must feed the
    LoRA step too (train/loop.py builds pp_mesh before the LoRA branch) —
    loss and LoRA grads match the single-device teacher."""
    from longspec_tpu.config import DraftConfig
    from longspec_tpu.models import glide as G
    from longspec_tpu.train import trainer as T
    from longspec_tpu.train.lora import init_lora, make_lora_train_step

    cfg, params, tokens, lengths = _setup(seed=13, L=4, B=4, S=24)
    dcfg = DraftConfig(window=8)
    dparams = G.init_draft_params(jax.random.PRNGKey(21), cfg)
    opt = T.make_optimizer(lr=1e-3, warmup_steps=2, total_steps=10)
    mesh = PP.make_pp_mesh(2, dp=2)

    def run(pp_mesh):
        lora = init_lora(jax.random.PRNGKey(17), dparams, rank=2)
        step = make_lora_train_step(cfg, dcfg, opt, dparams, scale=2.0,
                                    anchor_offset=False,
                                    pp_mesh=pp_mesh, pp_micro=2)
        state = T.init_train_state(lora, opt)
        with (pp_mesh or jax.sharding.Mesh(np.asarray(jax.devices()[:1]),
                                           ("x",))):
            state, metrics = step(state, params, tokens, tokens,
                                  jax.random.PRNGKey(3))
        return float(metrics["loss"]), state.draft_params

    loss_ref, lo_ref = run(None)
    loss_pp, lo_pp = run(mesh)
    assert abs(loss_ref - loss_pp) < 1e-4, (loss_ref, loss_pp)
    for a, b in zip(jax.tree_util.tree_leaves(lo_ref),
                    jax.tree_util.tree_leaves(lo_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_pipeline_sharded_params_and_jit():
    """End-to-end under jit with the stage-sharded layer stack placed via
    shard_layers_pp (the deployment form: each device holds L/pp layers)."""
    cfg, params, tokens, lengths = _setup(seed=5, L=4, B=2, S=16)
    mesh = PP.make_pp_mesh(4, dp=1)
    layers_sharded = PP.shard_layers_pp(params["layers"], cfg, mesh)
    p2 = dict(params, layers=layers_sharded)
    ref = M.forward_train(params, cfg, tokens, lengths=lengths, remat=False)

    @jax.jit
    def f(p):
        return PP.pipeline_forward_train(mesh, p, cfg, tokens,
                                         lengths=lengths, n_micro=2,
                                         remat=False)
    with mesh:
        out = f(p2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
