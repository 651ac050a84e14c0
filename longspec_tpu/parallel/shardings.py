"""Mesh + sharding rules for multi-chip execution.

TPU-native replacement for the reference's distributed substrate (DeepSpeed
ZeRO + fairscale mpu + NCCL, SURVEY.md §2.4): a (dp, tp) `jax.sharding.Mesh`
with GSPMD partitioning — XLA inserts all collectives over ICI.

Layout (SURVEY.md §7.1.7 / BASELINE north star):
  * target attention weights sharded on the head dimension over `tp`;
  * MLP sharded on the intermediate dimension over `tp`;
  * lm_head / embedding sharded on the vocab dimension over `tp` (draft beam
    top-k runs shard-local per vocab shard, then a tiny cross-shard top-k —
    see engine note on per-node top-k);
  * target KV cache sharded on kv-heads over `tp`, batch over `dp`;
  * GLIDE draft layer REPLICATED over `tp` (it is one layer; replication
    keeps the gamma draft micro-steps collective-free so they can overlap
    verify's collectives), its KV cache sharded over `dp` only;
  * optimizer state for the draft sharded like ZeRO-1 over `dp` where
    divisible (draft-only training: the state is small, but the rule is
    applied anyway for parity with ZeRO semantics).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig


def make_mesh(dp: int = 1, tp: int = 1, devices=None, sp: int = 1) -> Mesh:
    """(dp, tp) mesh; pass sp>1 for a (dp, sp, tp) mesh with a sequence-
    parallel axis (used by `parallel.ring` for long-context SP)."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * sp * tp, (len(devices), dp, sp, tp)
    if sp > 1:
        arr = np.asarray(devices[: dp * sp * tp]).reshape(dp, sp, tp)
        return Mesh(arr, ("dp", "sp", "tp"))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_pspecs(cfg: ModelConfig) -> dict:
    """PartitionSpecs matching the param pytree of models.llama.init_params."""
    layers = {
        "input_norm": P(None, None),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "post_norm": P(None, None),
        "w_gate": P(None, None, "tp"),
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),
    }
    if cfg.attention_bias:
        layers["bq"] = P(None, "tp")
        layers["bk"] = P(None, "tp")
        layers["bv"] = P(None, "tp")
    out = {
        "embed": P(None, None),      # replicated rows: token gather stays local
        "layers": layers,
        "final_norm": P(None),
    }
    if not cfg.tie_word_embeddings:
        out["lm_head"] = P(None, "tp")   # vocab-sharded logits
    return out


def draft_pspecs() -> dict:
    """Draft layer replicated over tp (single layer; SURVEY §7.1.7)."""
    rep2 = P(None, None)
    attn = {"wq": rep2, "bq": P(None), "wk": rep2, "bk": P(None),
            "wv": rep2, "bv": P(None), "wo": rep2}
    return {
        "input_norm": P(None), "sa": dict(attn), "post_sa_norm": P(None),
        "ca": dict(attn), "post_ca_norm": P(None),
        "w_gate": rep2, "w_up": rep2, "w_down": rep2,
    }


def state_pspecs(sp: bool = False, ring: bool = False,
                 kv_quant: bool = False) -> dict:
    """PartitionSpecs for engine.DecodeState (as a dict by field name).

    With ``sp=True`` the caches are additionally sharded on the SEQUENCE axis
    over the mesh's `sp` axis (engine attn_impl="sp"; parallel/ring.py).
    With ``ring=True`` the draft cache is a ~window-sized ring buffer
    (DraftConfig.ring_size) and stays replicated over `sp`.
    With ``kv_quant=True`` the target caches are `ops.quantkv.QuantKV`
    pytrees: the int8 rows shard like the bf16 cache and the per-row scales
    [L, B, Hkv, S] shard identically minus the head-dim axis."""
    seq = "sp" if sp else None
    dseq = None if ring else seq
    kv = P(None, "dp", "tp", seq, None)
    if kv_quant:
        from ..ops.quantkv import QuantKV
        kv = QuantKV(kv, P(None, "dp", "tp", seq))
    return {
        "kv_k": kv,
        "kv_v": kv,
        "d_kv_k": P("dp", None, dseq, None),
        "d_kv_v": P("dp", None, dseq, None),
        "cache_lens": P("dp"),
        "d_cache_lens": P("dp"),
    }


def paged_state_pspecs(kv_quant: bool = False) -> dict:
    """PartitionSpecs for a PAGED engine.DecodeState (serve.SpecServer
    kv="paged"): the shared page pools [L, n_pages, Hkv, page, D] shard on
    kv-heads over `tp` like the dense cache; page indirection (tables) and
    per-slot bookkeeping stay replicated — pages are a memory-management
    axis, not a parallelism axis. Serving data-parallelism is server
    replicas (one pool per replica), so the slot/batch dims stay
    unsharded here; `tp` is the in-server scaling axis."""
    pool = P(None, None, "tp", None, None)
    if kv_quant:
        from ..ops.quantkv import QuantKV
        pool = QuantKV(pool, P(None, None, "tp", None))
    return {
        "kv_k": pool,
        "kv_v": pool,
        "d_kv_k": P(None, "tp", None, None),
        "d_kv_v": P(None, "tp", None, None),
        "cache_lens": P(None),
        "d_cache_lens": P(None),
        "tables": P(None, None),
    }


def drop_axis(pspecs, axis: str):
    """Replace `axis` with None in every PartitionSpec of a pspec tree —
    used when a dimension is not divisible by the mesh axis (e.g. the
    serving prefill's batch-1 dense state under a dp>1 mesh: the batch
    stays replicated instead of dp-sharded)."""
    def fix(s):
        return P(*(None if a == axis else a for a in s))
    return jax.tree.map(fix, pspecs, is_leaf=lambda x: isinstance(x, P))


def shard_tree(tree, pspecs, mesh: Mesh):
    """Device_put a pytree with matching PartitionSpecs.

    int8-quantized kernels (`ops.quantparams.QuantParam`) shard like their
    bf16 counterparts: the [.., In, Out] spec applies to the int8 rows and
    its In axis is dropped for the [.., Out] per-channel scales."""
    from ..ops.quantparams import QuantParam

    def put(x, s):
        if isinstance(x, QuantParam):
            sc_spec = P(*(s[:-2] + (s[-1],)))
            return QuantParam(
                jax.device_put(x.qv, NamedSharding(mesh, s)),
                jax.device_put(x.scale, NamedSharding(mesh, sc_spec)))
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(put, tree, pspecs,
                        is_leaf=lambda x: not isinstance(x, dict))


def ns(mesh: Mesh, pspecs):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                        is_leaf=lambda x: isinstance(x, P))
