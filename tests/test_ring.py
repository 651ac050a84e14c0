"""Sequence-parallel attention (parallel/ring.py) vs single-device oracles
on the virtual 8-device CPU mesh: ring prefill and SP decode must equal the
unsharded implementations (same exactness bar as the single-chip LSE merge).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from longspec_tpu.parallel import shardings as sh
from longspec_tpu.parallel.ring import ring_flash_prefill, sp_flash_decode
from longspec_tpu.models import llama as M

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

B, S, H, HKV, D = 2, 64, 4, 2, 8  # S divisible by sp=8


@pytest.fixture(scope="module")
def mesh():
    return sh.make_mesh(dp=1, sp=8, tp=1)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, HKV, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, HKV, D)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("window,anchors", [
    (None, 0),
    # window-only (16, 0) rides --slow: each ring-prefill compile is ~33s
    # and (16, 2) covers the window mask plus the anchor branch
    pytest.param(16, 0, marks=pytest.mark.slow),
    (16, 2),
])
def test_ring_prefill_matches_causal(mesh, qkv, window, anchors):
    q, k, v = qkv
    lengths = jnp.asarray([S, S - 19], jnp.int32)
    q_sh = jax.device_put(q, NamedSharding(mesh, P(None, "sp")))
    k_sh = jax.device_put(k, NamedSharding(mesh, P(None, "sp")))
    v_sh = jax.device_put(v, NamedSharding(mesh, P(None, "sp")))
    o, lse = ring_flash_prefill(mesh, q_sh, k_sh, v_sh, lengths,
                                window=window, anchors=anchors)
    ref_o, ref_lse = M.causal_self_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), lengths,
        window, anchors, "dense")
    # compare only valid rows (oracles differ on queries past `lengths`)
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_allclose(np.asarray(o)[b, :n],
                                   np.asarray(ref_o)[b, :n],
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse)[b, :n],
                                   np.asarray(ref_lse)[b, :n],
                                   rtol=2e-5, atol=2e-5)


def test_sp_decode_matches_sliced_prefix(mesh, qkv):
    """Sequence-sharded KV decode: ragged per-query bounds, some shards
    entirely out of range, plus an all-empty row (k_hi=0)."""
    rng = np.random.default_rng(1)
    TQ = 5
    q = jnp.asarray(rng.normal(size=(B, TQ, H, D)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(B, HKV, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(B, HKV, S, D)).astype(np.float32))
    # row 0: staggered bounds incl. 0 (empty) and 3 (first shard only);
    # row 1: bounds past several shard boundaries
    k_hi = jnp.asarray([[0, 3, 8, 17, 64], [5, 9, 33, 48, 60]], jnp.int32)
    q_pos = jnp.maximum(k_hi - 1, 0)
    kc_sh = jax.device_put(kc, NamedSharding(mesh, P(None, None, "sp")))
    vc_sh = jax.device_put(vc, NamedSharding(mesh, P(None, None, "sp")))
    for window, anchors in ((None, 0), (16, 2)):
        o, lse = sp_flash_decode(mesh, q, kc_sh, vc_sh, k_hi, q_pos,
                                 window=window, anchors=anchors)
        ref_o, ref_lse = M.sliced_prefix_attention(
            q, kc, vc, k_hi, q_pos, window, anchors, "dense")
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                                   rtol=2e-5, atol=2e-5)
        # empty rows: both report lse == -inf
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                                   rtol=2e-5, atol=2e-5)


def test_sp_decode_jits_under_mesh(mesh, qkv):
    """The SP decode must be jittable (it sits inside the decode loop)."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(B, HKV, S, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(B, HKV, S, D)).astype(np.float32))
    k_hi = jnp.asarray([[40], [64]], jnp.int32)
    q_pos = k_hi - 1
    kc_sh = jax.device_put(kc, NamedSharding(mesh, P(None, None, "sp")))
    vc_sh = jax.device_put(vc, NamedSharding(mesh, P(None, None, "sp")))
    f = jax.jit(lambda *a: sp_flash_decode(mesh, *a))
    o, _ = f(q, kc_sh, vc_sh, k_hi, q_pos)
    ref_o, _ = M.sliced_prefix_attention(q, kc, vc, k_hi, q_pos, None, 0,
                                         "dense")
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                               rtol=2e-5, atol=2e-5)
