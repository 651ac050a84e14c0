"""int8 frozen-target weights (`ops/quantparams.py`) — the TPU-native
counterpart of the reference's kbit base-model loading for PEFT draft
training (ref `train/models/mixin.py:34-120`), doubling as W8A16 serving
(halved weight HBM reads for the decode-bound vanilla path).

Gates: (1) quantization error bounded + ints stable; (2) every forward
(train scan/unrolled, prefill, append) runs on QuantParam kernels and stays
CLOSE to bf16; (3) the draft trains against the int8 teacher (finite loss,
same trajectory shape); (4) spec-vs-vanilla exactness holds ON the
quantized target; (5) tp sharding splits int8 rows and scales coherently.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.config import DraftConfig, EngineConfig, tiny_test
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.ops import quantparams as qp


def test_quantize_param_props():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 24)) * 0.05
    p = qp.quantize_param(w)
    assert p.qv.dtype == jnp.int8 and p.scale.shape == (3, 24)
    deq = qp.dequant_param(p, jnp.float32)
    # per-output-channel absmax: error <= scale/2 elementwise
    assert float(jnp.max(jnp.abs(deq - w) - p.scale[:, None, :] / 2)) <= 1e-6
    # zero columns stay zero with scale 1
    w0 = w.at[:, :, 3].set(0.0)
    p0 = qp.quantize_param(w0)
    assert float(p0.scale[0, 3]) == 1.0
    assert not np.any(np.asarray(p0.qv[:, :, 3]))


def test_quantized_forwards_close_and_consistent():
    cfg = tiny_test(vocab_size=97, num_layers=2)
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    qparams = qp.quantize_target_params(params)
    assert qp.is_quantized_params(qparams) and not qp.is_quantized_params(params)
    toks = jnp.asarray(np.random.default_rng(2).integers(2, 97, (2, 12)))

    h_ref = M.forward_train(params, cfg, toks)
    h_q = M.forward_train(qparams, cfg, toks)
    h_qu = M.forward_train(qparams, cfg, toks, unroll_layers=True)
    rel = float(jnp.max(jnp.abs(h_q - h_ref)) / (jnp.max(jnp.abs(h_ref)) + 1e-9))
    assert rel < 0.2, rel
    np.testing.assert_allclose(np.asarray(h_qu), np.asarray(h_q),
                               rtol=2e-5, atol=2e-5)

    # prefill/append consume the same quantized kernels
    kv_k, kv_v = M.alloc_kv_cache(cfg, 2, 24, jnp.float32)
    lens = jnp.asarray([12, 9], jnp.int32)
    h, kv_k, kv_v = M.forward_prefill(qparams, cfg, toks, lens, kv_k, kv_v,
                                      attn_impl="chunked")
    h2, _, _ = M.forward_append(qparams, cfg, toks[:, :1], lens[:, None],
                                jnp.ones((2, 1, 1), bool), lens, kv_k, kv_v,
                                attn_impl="chunked")
    assert np.all(np.isfinite(np.asarray(h2)))


def test_draft_trains_against_int8_teacher():
    from longspec_tpu.train.trainer import (make_optimizer, make_train_step,
                                            init_train_state)
    cfg = tiny_test(vocab_size=97, num_layers=2)
    dcfg = DraftConfig(window=8)
    params = M.init_params(jax.random.PRNGKey(3), cfg)
    qparams = qp.quantize_target_params(params)
    dparams = G.init_draft_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(2, 97, (2, 16)))
    labels = jnp.asarray(np.where(rng.random((2, 16)) < 0.1, -100,
                                  np.asarray(toks)))

    losses = {}
    for name, tp in (("bf16", params), ("int8", qparams)):
        opt = make_optimizer(lr=1e-3, warmup_steps=1)
        step = make_train_step(cfg, dcfg, opt)
        # the step donates its state: give each run its own param buffers
        cur = init_train_state(jax.tree.map(jnp.array, dparams), opt)
        ls = []
        for i in range(3):
            cur, metrics = step(cur, tp, toks, labels, jax.random.PRNGKey(7))
            ls.append(float(metrics["loss"]))
        losses[name] = ls
    assert all(np.isfinite(losses["int8"])), losses
    # the int8 teacher defines nearly the same task: losses track closely
    np.testing.assert_allclose(losses["int8"], losses["bf16"],
                               rtol=0.1, atol=0.15)


def test_spec_lossless_on_quantized_target():
    """T=0 spec output on int8 WEIGHTS is token-exact vs vanilla on the
    same weights — the kv_quant exactness contract, for params."""
    from longspec_tpu.engine.engine import SpecEngine
    cfg = tiny_test(vocab_size=151, num_layers=2)
    params = qp.quantize_target_params(M.init_params(jax.random.PRNGKey(6), cfg))
    dparams = G.init_draft_params(jax.random.PRNGKey(7), cfg)
    eng = SpecEngine(params, dparams, cfg, DraftConfig(window=8),
                     EngineConfig(tree_shape=(2, 3, 3), gamma=3,
                                  attn_impl="chunked"))
    toks = np.random.default_rng(8).integers(2, 151, (2, 19))
    lens = np.asarray([19, 13], np.int32)
    van = eng.vanilla_generate(toks, lens, max_gen_len=18,
                               state_dtype=jnp.float32)
    tree = eng.tree_spec_generate(toks, lens, max_gen_len=18,
                                  state_dtype=jnp.float32)
    chain = eng.spec_generate(toks, lens, max_gen_len=18,
                              state_dtype=jnp.float32)
    n = 16
    assert np.array_equal(van["output_ids"][:, :n], tree["output_ids"][:, :n])
    assert np.array_equal(van["output_ids"][:, :n], chain["output_ids"][:, :n])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_quantized_params_shard_over_tp():
    from longspec_tpu.parallel import shardings as sh
    mesh = sh.make_mesh(dp=2, tp=4)
    cfg = tiny_test(vocab_size=128, num_layers=2)   # vocab % tp == 0
    params = qp.quantize_target_params(M.init_params(jax.random.PRNGKey(9), cfg))
    sharded = sh.shard_tree(params, sh.param_pspecs(cfg), mesh)
    wq = sharded["layers"]["wq"]
    # int8 rows split on the out axis; scales split the same axis
    assert "tp" in str(wq.qv.sharding.spec)
    assert wq.scale.sharding.spec[-1] == wq.qv.sharding.spec[-1]
    deq = qp.dequant_param(wq, jnp.float32)
    ref = qp.dequant_param(params["layers"]["wq"], jnp.float32)
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(ref))
