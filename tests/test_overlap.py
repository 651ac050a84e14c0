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
