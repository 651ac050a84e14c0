"""Training-loop semantics: gradient accumulation equivalence and resume
data fast-forward (ref `trainer_base_ds_mul_fs_tp.py:215-318, 244-251`)."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from longspec_tpu.config import DraftConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.train import trainer as T


@pytest.fixture(scope="module")
def tiny_models():
    cfg = tiny_test(vocab_size=97, num_layers=2)
    tparams = M.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    return cfg, DraftConfig(window=16), tparams, dparams


def test_grad_accum_matches_full_batch(tiny_models):
    """batch=4 x accum=1 and batch=4 split into accum=2 microbatches follow
    the same loss/param trajectory (randomness drawn once per step)."""
    cfg, dcfg, tparams, dparams = tiny_models
    opt = T.make_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)
    rng = np.random.default_rng(0)
    toks = rng.integers(2, cfg.vocab_size, (3, 4, 24)).astype(np.int32)

    results = []
    for accum in (1, 2):
        step_fn = T.make_train_step(cfg, dcfg, opt, attn_impl="dense",
                                    accum_steps=accum)
        # the step donates its state; train on a copy of the shared fixture
        st = T.init_train_state(jax.tree.map(jnp.copy, dparams), opt)
        losses = []
        for i in range(3):
            st, m = step_fn(st, tparams, jnp.asarray(toks[i]),
                            jnp.asarray(toks[i]), jax.random.PRNGKey(5))
            losses.append(float(m["loss"]))
        results.append((losses, st.draft_params))

    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_resume_fast_forwards_data(tiny_models, tmp_path):
    """Interrupted training (4 steps, checkpoint, resume to 6) reproduces the
    uninterrupted 6-step run exactly — requires the loop to skip the 4
    consumed batches on resume, not restart the data stream."""
    from longspec_tpu.train import loop as L
    cfg, dcfg, tparams, dparams = tiny_models
    rng = np.random.default_rng(7)
    all_batches = [{"input_ids": rng.integers(2, cfg.vocab_size, (2, 24))
                    .astype(np.int32)} for _ in range(8)]

    def batch_iter(epoch):
        return iter(all_batches)

    def crashing_iter(epoch):
        # simulates a crash after 5 batches (step 4's checkpoint exists)
        for i, b in enumerate(all_batches):
            if i == 5:
                raise RuntimeError("simulated crash")
            yield b

    kw = dict(lr=1e-3, warmup_steps=1, save_steps=2, log_steps=1,
              attn_impl="dense", seed=3)

    p_full = L.train(cfg, dcfg, tparams, dparams, batch_iter,
                     output_dir=str(tmp_path / "full"), total_steps=6, **kw)
    with pytest.raises(RuntimeError, match="simulated crash"):
        L.train(cfg, dcfg, tparams, dparams, crashing_iter,
                output_dir=str(tmp_path / "split"), total_steps=6, **kw)
    p_resumed = L.train(cfg, dcfg, tparams, dparams, batch_iter,
                        output_dir=str(tmp_path / "split"), total_steps=6,
                        **kw)

    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=3e-5)
    # the resumed segment's logged losses equal the uninterrupted run's
    rows_full = {r["step"]: r["train/loss"] for r in
                 map(json.loads, open(tmp_path / "full" / "train.metrics.jsonl"))}
    rows_res = {r["step"]: r["train/loss"] for r in
                map(json.loads, open(tmp_path / "split" / "train.metrics.jsonl"))}
    for s in (5, 6):
        assert abs(rows_full[s] - rows_res[s]) < 1e-4, (s, rows_full, rows_res)


def test_lora_draft_finetune(tiny_models, tmp_path):
    """LoRA adapter training (ref peft mixin `mixin.py:34-120`): base draft
    frozen, loss decreases, deployable export is plain merged weights the
    engine can run."""
    from longspec_tpu.train import loop as L
    from longspec_tpu.train import lora
    cfg, dcfg, tparams, dparams = tiny_models

    # direct step: loss decreases and base stays frozen
    opt = T.make_optimizer(lr=5e-3, warmup_steps=1, total_steps=12)
    adapter = lora.init_lora(jax.random.PRNGKey(2), dparams, rank=4)
    st = T.init_train_state(adapter, opt)  # adapter is fresh: donation ok
    step_fn = lora.make_lora_train_step(cfg, dcfg, opt, dparams,
                                        attn_impl="dense")
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, (4, 32)), jnp.int32)
    losses = []
    for i in range(12):
        st, m = step_fn(st, tparams, toks, toks, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # merged weights differ from base only on 2-D kernels
    merged = lora.merge_lora(dparams, st.draft_params)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), dparams, merged)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    assert float(jnp.abs(dparams["input_norm"] - merged["input_norm"]).max()) == 0

    # loop-level: lora_rank routes training through the adapter and the
    # export is engine-ready merged params
    def batch_iter(epoch):
        rng2 = np.random.default_rng(9)
        return iter([{"input_ids": rng2.integers(
            2, cfg.vocab_size, (2, 24)).astype(np.int32)} for _ in range(4)])

    out = L.train(cfg, dcfg, tparams, dparams, batch_iter,
                  output_dir=str(tmp_path / "lora_run"), total_steps=3,
                  lr=1e-3, warmup_steps=1, save_steps=2, log_steps=1,
                  attn_impl="dense", lora_rank=4, seed=0)
    from longspec_tpu.train.checkpoint import load_draft
    deployed = load_draft(str(tmp_path / "lora_run" / "checkpoint-last"))
    assert set(deployed) == set(dparams)
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.config import EngineConfig
    eng = SpecEngine(tparams, out, cfg, dcfg,
                     EngineConfig(tree_shape=(2, 3), attn_impl="dense"))
    res = eng.tree_spec_generate(np.asarray(toks[:1]), np.array([32], np.int32),
                                 max_gen_len=6, state_dtype=jnp.float32)
    assert res["num"] >= 1


def test_unroll_layers_matches_scan(tiny_models):
    """forward_train(unroll_layers=True) — the HBM-friendly form used for
    seq>=8k full-param pretraining (per-layer grad slices instead of one
    stacked while-loop carry) — matches the scan form in both the forward
    hidden states and the parameter gradients."""
    cfg, _, tparams, _ = tiny_models
    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, (2, 24)).astype(np.int32))

    def loss(p, unroll):
        h = M.forward_train(p, cfg, toks, attn_impl="chunked",
                            unroll_layers=unroll)
        return jnp.sum(h.astype(jnp.float32) ** 2) / h.size

    for unroll in (False, True):
        hs = M.forward_train(tparams, cfg, toks, attn_impl="chunked",
                             unroll_layers=unroll, return_last_kv=True)
        if unroll:
            h_u, kv_u = hs
        else:
            h_s, kv_s = hs
    np.testing.assert_allclose(np.asarray(h_u), np.asarray(h_s),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(kv_u, kv_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    g_s = jax.grad(loss)(tparams, False)
    g_u = jax.grad(loss)(tparams, True)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_glide_train_forward_chunked_matches_dense(tiny_models):
    """The memory-safe chunked draft-training attention (mandatory at long
    seq: dense CA scores are [B, H, S, S]) must match the dense-mask oracle,
    including the pad-truncated cross-attention bound and ragged lengths."""
    cfg, dcfg, tparams, dparams = tiny_models
    rng = np.random.default_rng(7)
    B, S = 2, 40
    toks = jnp.asarray(rng.integers(2, cfg.vocab_size, (B, S)).astype(np.int32))
    lengths = jnp.asarray(np.array([S, S - 13], np.int32))
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    emb = M.forward_train.__globals__["embed"](tparams, toks)
    _, (llm_k, llm_v) = M.forward_train(tparams, cfg, toks,
                                        positions=positions,
                                        return_last_kv=True,
                                        attn_impl="dense")
    for pad in (1, 4):
        outs = {}
        for impl in ("dense", "chunked"):
            outs[impl] = G.glide_train_forward(
                dparams, cfg, dcfg, emb, positions, llm_k, llm_v,
                jnp.int32(pad), lengths=lengths, attn_impl=impl)
        np.testing.assert_allclose(np.asarray(outs["chunked"]),
                                   np.asarray(outs["dense"]),
                                   rtol=2e-4, atol=2e-4)


def test_lora_accum_matches_full_batch(tiny_models):
    """LoRA fine-tuning honors accum_steps with the same trajectory
    equivalence as the full-param step (regression: accum was silently
    ignored when lora_rank > 0)."""
    from longspec_tpu.train.lora import (init_lora, make_lora_train_step)
    cfg, dcfg, tparams, dparams = tiny_models
    opt = T.make_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)
    rng = np.random.default_rng(3)
    toks = rng.integers(2, cfg.vocab_size, (3, 4, 24)).astype(np.int32)
    lora0 = init_lora(jax.random.PRNGKey(9), dparams, rank=4)

    results = []
    for accum in (1, 2):
        step_fn = make_lora_train_step(cfg, dcfg, opt, dparams,
                                       attn_impl="dense", accum_steps=accum)
        st = T.init_train_state(jax.tree.map(jnp.copy, lora0), opt)
        losses = []
        for i in range(3):
            st, m = step_fn(st, tparams, jnp.asarray(toks[i]),
                            jnp.asarray(toks[i]), jax.random.PRNGKey(5))
            losses.append(float(m["loss"]))
        results.append((losses, st.draft_params))

    (l1, p1), (l2, p2) = results
    np.testing.assert_allclose(l1, l2, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
