"""Pallas kernels vs dense-JAX oracles (interpret mode on CPU).

The oracles' semantics are pinned by the reference's torch twins
(SURVEY.md §4): flash_attn_with_kvcache-style prefix decode with per-row
lengths / window / LSE.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from longspec_tpu.models.llama import sliced_prefix_attention
from longspec_tpu.ops.pallas_decode import flash_decode


def mk(b, t, h, hkv, d, s, seed=0):
    """Caches in native [B, Hkv, S, D] layout."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("t,h,hkv", [(1, 4, 4), (5, 4, 2), (7, 8, 2)])
def test_flash_decode_vs_dense(t, h, hkv):
    b, d, s = 2, 32, 300
    q, k, v = mk(b, t, h, hkv, d, s)
    k_hi = jnp.asarray([[min(100 + 7 * i, 256) for i in range(t)],
                        [min(50 + 3 * i, 256) for i in range(t)]], jnp.int32)
    o_ref, lse_ref = sliced_prefix_attention(q, k, v, k_hi, None, None, 0, "dense")
    o, lse = flash_decode(q, k, v, k_hi, chunk=128)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=1e-5, rtol=1e-4)


def test_flash_decode_window_chunk_skip_batch():
    """Low-side chunk skipping (window start) uses the MIN q_pos across the
    batch: rows deep in the sequence must not skip chunks a shallow row
    still needs."""
    from longspec_tpu.models.llama import sliced_prefix_attention
    b, t, h, hkv, d, s = 2, 4, 4, 2, 32, 640
    q, k, v = mk(b, t, h, hkv, d, s, seed=9)
    # row 0 shallow (pos ~40), row 1 deep (pos ~600): c_lo from row 0
    q_pos = jnp.asarray([[40 + i for i in range(t)],
                         [600 + i for i in range(t)]], jnp.int32)
    k_hi = jnp.asarray([[40] * t, [600] * t], jnp.int32)
    for window, anchors in [(64, 0), (64, 4), (200, 2)]:
        o_ref, lse_ref = sliced_prefix_attention(q, k, v, k_hi, q_pos, window,
                                                 anchors, "dense")
        o, lse = flash_decode(q, k, v, k_hi, q_pos, window, anchors, chunk=128)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5,
                                   rtol=1e-4, err_msg=f"w={window} a={anchors}")
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                                   atol=1e-5, rtol=1e-4)


def test_flash_decode_window_anchors():
    b, t, h, hkv, d, s = 1, 6, 4, 2, 32, 400
    q, k, v = mk(b, t, h, hkv, d, s, seed=3)
    q_pos = jnp.asarray([[300 + i for i in range(t)]], jnp.int32)
    k_hi = jnp.full((b, t), 300, jnp.int32)
    # anchors=160 > chunk=128: anchor sinks span TWO chunks, both of which
    # must stay live in the window chunk-skip (regression: only chunk 0 was
    # revived, silently dropping anchor keys 128..159)
    for window, anchors in [(64, 0), (64, 4), (16, 2), (32, 160)]:
        o_ref, lse_ref = sliced_prefix_attention(q, k, v, k_hi, q_pos, window,
                                                 anchors, "dense")
        o, lse = flash_decode(q, k, v, k_hi, q_pos, window, anchors, chunk=128)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5,
                                   rtol=1e-4, err_msg=f"w={window} a={anchors}")
        np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref),
                                   atol=1e-5, rtol=1e-4)


def test_flash_decode_empty_prefix():
    """Rows with zero valid keys must give o=0, lse=-inf (merge no-op)."""
    b, t, h, hkv, d, s = 1, 2, 2, 2, 32, 128
    q, k, v = mk(b, t, h, hkv, d, s, seed=5)
    k_hi = jnp.asarray([[0, 17]], jnp.int32)
    o, lse = flash_decode(q, k, v, k_hi, chunk=64)
    assert np.all(np.asarray(o[0, 0]) == 0.0)
    assert np.all(np.isneginf(np.asarray(lse[0, 0])))
    o_ref, lse_ref = sliced_prefix_attention(q, k, v, k_hi, None, None, 0, "dense")
    np.testing.assert_allclose(np.asarray(o[0, 1]), np.asarray(o_ref[0, 1]),
                               atol=1e-5, rtol=1e-4)


def test_flash_decode_uneven_tail():
    """S not a multiple of chunk; k_hi beyond the last partial chunk edge."""
    b, t, h, hkv, d, s = 1, 3, 4, 4, 32, 200
    q, k, v = mk(b, t, h, hkv, d, s, seed=7)
    k_hi = jnp.asarray([[200, 199, 150]], jnp.int32)
    o_ref, lse_ref = sliced_prefix_attention(q, k, v, k_hi, None, None, 0, "dense")
    o, lse = flash_decode(q, k, v, k_hi, chunk=128)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=1e-5, rtol=1e-4)


def test_flash_decode_query_split_matches_oracle(monkeypatch):
    """Query batches with G*T > R_MAX split along T (segmented prefill at
    131k+ context feeds 8192-token segments; unsplit, the kernel's scoped
    VMEM blows at ~900 rows). The split must be exact — including uneven
    tails, windows/anchors, and int8 caches — vs the chunked oracle."""
    import longspec_tpu.ops.pallas_decode as pd
    from longspec_tpu.ops import quantkv as qkv8
    from longspec_tpu.models.llama import _attend_prefix_chunked_khi
    monkeypatch.setattr(pd, "R_MAX", 96)  # force the split on tiny shapes
    b, t, h, hkv, d, s = 2, 200, 8, 2, 32, 640  # R=800, tc=24: uneven tail
    q, k, v = mk(b, t, h, hkv, d, s, seed=11)
    lens = jnp.asarray([500, 130], jnp.int32)
    q_pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)) + 60
    k_hi = jnp.minimum(q_pos + 1, lens[:, None])
    kq = qkv8.QuantKV(*qkv8.quantize(k))
    vq = qkv8.QuantKV(*qkv8.quantize(v))
    for kk, vv, tag in [(k, v, "bf16"), (kq, vq, "int8")]:
        for window, anchors in [(None, 0), (128, 4)]:
            o, lse = pd.flash_decode(q, kk, vv, k_hi, q_pos, window,
                                     anchors, chunk=128)
            o2, lse2 = _attend_prefix_chunked_khi(q, kk, vv, k_hi, q_pos,
                                                  window, anchors, 128)
            np.testing.assert_allclose(np.asarray(o), np.asarray(o2),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"{tag} w={window}")
            lse_f = np.nan_to_num(np.asarray(lse - lse2), posinf=0, neginf=0)
            assert np.max(np.abs(lse_f)) < 2e-5, (tag, window)


# ---------------------------------------------------------------------------
# flash_prefill vs dense oracle
# ---------------------------------------------------------------------------

from longspec_tpu.models.llama import causal_self_attention
from longspec_tpu.ops.pallas_prefill import flash_prefill


@pytest.mark.parametrize("window,anchors", [(None, 0), (64, 0), (64, 4)])
def test_flash_prefill_vs_dense(window, anchors):
    b, s, h, hkv, d = 2, 200, 4, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    lengths = jnp.asarray([s, s - 37], jnp.int32)
    o_ref, lse_ref = causal_self_attention(q, k, v, lengths, window, anchors,
                                           "dense")
    o, lse = flash_prefill(q, k, v, lengths, window=window, anchors=anchors,
                           q_blk=64, k_blk=64)
    # rows beyond lengths are undefined; compare valid region only
    for bi, L in enumerate([s, s - 37]):
        np.testing.assert_allclose(np.asarray(o[bi, :L]), np.asarray(o_ref[bi, :L]),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(lse[bi, :L]),
                                   np.asarray(lse_ref[bi, :L]), atol=1e-5, rtol=1e-4)


def test_flash_prefill_window_anchor_block_skip():
    """window+anchors left-clamp (round-3): with sinks the index map fetches
    real block 0 for kc=0 and clamps dead mid-band steps onto first_live —
    many fully-dead KV blocks between the sinks and the window must not
    change results (this is the 131k-ctx prefill traffic fix)."""
    b, s, h, hkv, d = 1, 768, 2, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    lengths = jnp.asarray([s], jnp.int32)
    for window, anchors in [(96, 4), (96, 64), (200, 1)]:
        o_ref, lse_ref = causal_self_attention(q, k, v, lengths, window,
                                               anchors, "dense")
        o, lse = flash_prefill(q, k, v, lengths, window=window,
                               anchors=anchors, q_blk=64, k_blk=64)
        np.testing.assert_allclose(np.asarray(o[0]), np.asarray(o_ref[0]),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"w={window} a={anchors}")
        np.testing.assert_allclose(np.asarray(lse[0]), np.asarray(lse_ref[0]),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"w={window} a={anchors}")


def test_prefill_pallas_int8_kv_reads_dequant():
    """QuantKV reads on the pallas prefill path (the draft-CA prefill over an
    int8 target cache) must equal the dense oracle over the DEQUANTIZED
    values — round 3 replaced the O(S^2) chunked fallback with
    dequant-once + pallas."""
    from longspec_tpu.ops import quantkv as qkv8
    b, s, h, hkv, d = 1, 256, 4, 2, 32
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    kq8, ks8 = qkv8.quantize(k.transpose(0, 2, 1, 3))
    vq8, vs8 = qkv8.quantize(v.transpose(0, 2, 1, 3))
    kq = qkv8.QuantKV(kq8.transpose(0, 2, 1, 3), ks8.transpose(0, 2, 1))
    vq = qkv8.QuantKV(vq8.transpose(0, 2, 1, 3), vs8.transpose(0, 2, 1))
    lengths = jnp.asarray([s], jnp.int32)
    o_ref, lse_ref = causal_self_attention(q, kq, vq, lengths, 64, 4, "dense")
    o, lse = causal_self_attention(q, kq, vq, lengths, 64, 4, "pallas")
    np.testing.assert_allclose(np.asarray(o[0]), np.asarray(o_ref[0]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lse[0]), np.asarray(lse_ref[0]),
                               atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# stacked-layer decode (zero-copy per-layer reads)
# ---------------------------------------------------------------------------

def test_flash_decode_stacked_layer_matches_sliced():
    """`flash_decode(layer=i)` over a stacked [L, B, Hkv, S, D] cache must
    equal the per-layer-sliced call exactly (the BlockSpec index map picks
    the layer; no materialized slice). Covers bf16 + int8 caches, window +
    anchors. S chunk-aligned (stacked mode refuses ragged tails)."""
    from longspec_tpu.ops import quantkv as qkv8
    from longspec_tpu.ops.pallas_decode import flash_decode
    L, b, t, h, hkv, d, s = 3, 2, 5, 4, 2, 32, 256
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (L, b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (L, b, hkv, s, d), jnp.float32)
    q_pos = jnp.asarray([[200 + i for i in range(t)],
                         [90 + i for i in range(t)]], jnp.int32)
    k_hi = jnp.asarray([[200] * t, [90] * t], jnp.int32)
    kq = qkv8.QuantKV(*qkv8.quantize(k))
    vq = qkv8.QuantKV(*qkv8.quantize(v))
    for kk, vv, tag in [(k, v, "f32"), (kq, vq, "int8")]:
        for window, anchors in [(None, 0), (64, 4)]:
            for li in range(L):
                sl_k = (qkv8.QuantKV(kk.qv[li], kk.scale[li])
                        if tag == "int8" else kk[li])
                sl_v = (qkv8.QuantKV(vv.qv[li], vv.scale[li])
                        if tag == "int8" else vv[li])
                o_ref, lse_ref = flash_decode(q, sl_k, sl_v, k_hi, q_pos,
                                              window, anchors, chunk=128)
                o, lse = flash_decode(q, kk, vv, k_hi, q_pos, window,
                                      anchors, chunk=128,
                                      layer=jnp.int32(li))
                np.testing.assert_array_equal(
                    np.asarray(o), np.asarray(o_ref),
                    err_msg=f"{tag} w={window} layer={li}")
                np.testing.assert_array_equal(np.asarray(lse),
                                              np.asarray(lse_ref))


def test_flash_decode_stacked_ring_matches_sliced():
    """Stacked + ring mode: position recovery in-kernel over the layer
    picked by the index map."""
    from longspec_tpu.ops.ring_cache import ring_write, ring_positions
    from longspec_tpu.ops.pallas_decode import flash_decode
    L, b, t, h, hkv, d, ring = 2, 1, 3, 4, 2, 32, 128
    anchors, window = 4, 100
    ks = jax.random.split(jax.random.PRNGKey(22), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (L, b, hkv, ring, d), jnp.float32)
    v = jax.random.normal(ks[2], (L, b, hkv, ring, d), jnp.float32)
    d_len = jnp.asarray([150], jnp.int32)   # wrapped past the ring once
    q_pos = jnp.asarray([[150, 151, 152]], jnp.int32)
    k_hi = jnp.asarray([[150, 151, 152]], jnp.int32)
    for li in range(L):
        o_ref, lse_ref = flash_decode(q, k[li], v[li], k_hi, q_pos, window,
                                      anchors, chunk=64, ring=True,
                                      d_len=d_len)
        o, lse = flash_decode(q, k, v, k_hi, q_pos, window, anchors,
                              chunk=64, ring=True, d_len=d_len,
                              layer=jnp.int32(li))
        np.testing.assert_array_equal(np.asarray(o), np.asarray(o_ref))
        np.testing.assert_array_equal(np.asarray(lse), np.asarray(lse_ref))


def test_flash_decode_stacked_refuses_ragged():
    from longspec_tpu.ops.pallas_decode import flash_decode
    q = jnp.zeros((1, 1, 2, 32), jnp.float32)
    k = jnp.zeros((2, 1, 2, 200, 32), jnp.float32)
    with pytest.raises(ValueError, match="chunk-aligned"):
        flash_decode(q, k, k, jnp.asarray([[100]], jnp.int32), chunk=128,
                     layer=jnp.int32(0))


@pytest.mark.parametrize("window,anchors,quant,stacked", [
    (None, 0, False, False),
    (24, 4, False, False),
    (24, 4, False, True),
    (None, 0, True, False),
    (24, 4, True, True),
])
def test_flash_cache_prefill_vs_oracle(window, anchors, quant, stacked):
    """Segmented-prefill kernel (affine positions, per-row lengths) vs the
    generic sliced_prefix_attention oracle with k_hi = min(pos+1, len)."""
    import jax
    import jax.numpy as jnp
    from longspec_tpu.ops.pallas_prefill import flash_cache_prefill
    from longspec_tpu.models.llama import sliced_prefix_attention
    from longspec_tpu.ops import quantkv as qkv8

    rng = np.random.default_rng(17)
    B, T, H, Hkv, D, S, OFF = 2, 16, 4, 2, 16, 128, 40
    L = 3
    lens = jnp.asarray([OFF + T, OFF + 5], jnp.int32)  # row 1 ends mid-seg
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(L, B, Hkv, S, D)), jnp.float32)
    li = 1
    if quant:
        q8k, sck = qkv8.quantize(kc.reshape(-1, S, D))
        q8v, scv = qkv8.quantize(vc.reshape(-1, S, D))
        kq = qkv8.QuantKV(q8k.reshape(L, B, Hkv, S, D),
                          sck.reshape(L, B, Hkv, S))
        vq = qkv8.QuantKV(q8v.reshape(L, B, Hkv, S, D),
                          scv.reshape(L, B, Hkv, S))
        k_in = kq if stacked else qkv8.QuantKV(kq.qv[li], kq.scale[li])
        v_in = vq if stacked else qkv8.QuantKV(vq.qv[li], vq.scale[li])
        k_or = qkv8.QuantKV(kq.qv[li], kq.scale[li])
        v_or = qkv8.QuantKV(vq.qv[li], vq.scale[li])
    else:
        k_in = kc if stacked else kc[li]
        v_in = vc if stacked else vc[li]
        k_or, v_or = kc[li], vc[li]

    pos = OFF + jnp.arange(T)[None, :]
    pos = jnp.broadcast_to(pos, (B, T))
    k_hi = jnp.minimum(pos + 1, lens[:, None])
    got = flash_cache_prefill(q, k_in, v_in, jnp.int32(OFF), lens,
                              window, anchors, q_blk=8, chunk=32,
                              layer=jnp.int32(li) if stacked else None)
    want, _ = sliced_prefix_attention(q, k_or, v_or, k_hi, pos, window,
                                      anchors, "chunked", precision=None)
    # rows past a row's length are garbage in both; compare live rows
    live = np.asarray(pos < lens[:, None])
    np.testing.assert_allclose(np.asarray(got)[live], np.asarray(want)[live],
                               atol=2e-5, rtol=2e-5)
