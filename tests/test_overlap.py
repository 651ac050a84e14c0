"""Legality tests for the verify/draft overlap primitives (SURVEY §7.3
north star) on the virtual 8-device CPU mesh: the explicit ring schedule and
the shard-local winner gather must be bit-equivalent to their unoverlapped
dense references. (Overlap SPEED is only measurable on real multi-chip
hardware; these tests pin correctness of the schedule.)"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.parallel import shardings as sh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def mesh():
    return sh.make_mesh(dp=2, tp=4)


def test_sharded_topk_matches_dense(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from longspec_tpu.parallel.overlap import sharded_topk
    rng = np.random.default_rng(0)
    rows, H, V, k = 6, 32, 512, 5
    h = jnp.asarray(rng.normal(size=(rows, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, V)), jnp.float32)
    w_sh = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))

    vals, ids = sharded_topk(mesh, h, w_sh, k)
    ref_lp = jax.nn.log_softmax(h @ w, axis=-1)
    ref_v, ref_i = jax.lax.top_k(ref_lp, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(ids), np.asarray(ref_i))


def test_ring_allgather_overlap_order_and_compute(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from longspec_tpu.parallel.overlap import ring_allgather_overlap
    rng = np.random.default_rng(1)
    n = mesh.shape["tp"]
    x = jnp.asarray(rng.normal(size=(n * 3, 7)), jnp.float32)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("tp")))
    a = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    steps = [lambda i=i: (a * (i + 1)) @ a.T for i in range(n - 1)]

    gathered, outs = ring_allgather_overlap(mesh, x_sh, steps)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(x),
                               rtol=1e-6, atol=1e-6)
    for i, o in enumerate(outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray((a * (i + 1)) @ a.T),
                                   rtol=1e-5, atol=1e-5)


def test_verify_winners_with_draft_overlap(mesh):
    """Composed schedule: winner ring-gather interleaved with 'draft'
    matmuls — equals the unoverlapped sharded_topk + direct computes."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from longspec_tpu.parallel.overlap import (sharded_topk,
                                               verify_winners_with_draft_overlap)
    rng = np.random.default_rng(2)
    rows, H, V, k = 4, 16, 256, 4
    n = mesh.shape["tp"]
    h = jnp.asarray(rng.normal(size=(rows, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, V)), jnp.float32)
    w_sh = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    d = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    steps = [lambda i=i: d @ (d.T * (i + 2)) for i in range(n - 1)]

    (vals, ids), outs = verify_winners_with_draft_overlap(mesh, h, w_sh, k,
                                                          steps)
    ref_v, ref_i = sharded_topk(mesh, h, w_sh, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(ids), np.asarray(ref_i))
    for i, o in enumerate(outs):
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(d @ (d.T * (i + 2))),
                                   rtol=1e-5, atol=1e-5)


def test_sharded_topk_quant_matches_single_device_int8(mesh):
    """int8-head x tp-sharded-vocab composition (round-3): the sharded
    quantized scorer must pick EXACTLY the candidates of the single-device
    int8 head (engine._draft_logits law: per-column weight scales + dynamic
    per-row activation scales)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from longspec_tpu.parallel.overlap import sharded_topk_quant
    rng = np.random.default_rng(2)
    rows, H, V, k = 6, 32, 512, 5
    h = jnp.asarray(rng.normal(size=(rows, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, V)), jnp.float32)
    # the engine's per-column quantization (SpecEngine.__init__)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    w8 = jnp.round(w / jnp.maximum(scale, 1e-30)[None, :]).astype(jnp.int8)

    # single-device int8 law (engine._draft_logits)
    hmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    h8 = jnp.round(h * (127.0 / jnp.maximum(hmax, 1e-30))).astype(jnp.int8)
    acc = jax.lax.dot_general(h8, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    logits = acc.astype(jnp.float32) * (hmax / 127.0) * scale[None, :]
    ref_lp = jax.nn.log_softmax(logits, axis=-1)
    ref_v, ref_i = jax.lax.top_k(ref_lp, k)

    w8_sh = jax.device_put(w8, NamedSharding(mesh, P(None, "tp")))
    sc_sh = jax.device_put(scale, NamedSharding(mesh, P("tp")))
    vals, ids = sharded_topk_quant(mesh, h, w8_sh, sc_sh, k)
    assert np.array_equal(np.asarray(ids), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
