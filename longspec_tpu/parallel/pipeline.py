"""GPipe-style pipeline parallelism over a `pp` mesh axis (P3).

The reference ships pipeline-parallel *group helpers* only
(`train/utils/dist_utils.py:102-109` — `get_pipeline_parallel_rank/
world_size`; every shipped config sets `pp_size: 1`), so no schedule exists
to port. This is the TPU-native design a working pp_size>1 would want:

  * The model's stacked ``[L, ...]`` layer parameters shard their LEADING
    axis over the mesh's ``pp`` axis — each device holds ``L/pp``
    contiguous layers (one stage). No per-layer module surgery: stage
    assignment is a PartitionSpec.
  * Microbatches flow stage-to-stage over ICI via ``lax.ppermute`` inside a
    ``shard_map``-ped ``lax.scan`` over pipeline ticks (the standard
    scan-pipeline from the JAX scaling playbook). Tick ``t`` runs
    microbatch ``t - stage`` on ``stage``; ``n_micro + pp - 1`` ticks
    drain the pipeline (bubble fraction ``(pp-1)/(n_micro+pp-1)``).
  * Backward IS ``jax.grad`` of the scan: ``ppermute`` transposes to the
    reverse permutation, so the same schedule runs the backward pipeline —
    no hand-written 1F1B state machine to maintain. Per-layer
    ``jax.checkpoint`` bounds stage activation memory to one microbatch.

Composes with data parallelism (mesh ("dp", "pp"): microbatch rows shard
over ``dp``, stages over ``pp``) and with the trainer's frozen-target
teacher forward (`train/trainer.py` uses `models.llama.forward_train`;
`pipeline_forward_train` is a drop-in for pp>1 meshes, returning the same
(logits-input hidden, last-layer KV) contract GLIDE distillation needs).

Tested for token-exact forward equality and grad equality vs the
single-device layer scan on the virtual 8-device mesh
(tests/test_pipeline.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..models import llama as M
from ..ops.rope import rope_cos_sin


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """("dp", "pp") mesh; pp is the fast-moving (ICI-adjacent) axis so
    stage hops ride neighbor links."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * pp, (len(devices), dp, pp)
    arr = np.asarray(devices[: dp * pp]).reshape(dp, pp)
    return Mesh(arr, ("dp", "pp"))


def pp_layer_pspecs(cfg: ModelConfig) -> dict:
    """PartitionSpecs for params["layers"]: leading [L] axis over `pp`."""
    def lead_pp(rank):
        return P(*(("pp",) + (None,) * (rank - 1)))
    specs = {
        "input_norm": lead_pp(2), "wq": lead_pp(3), "wk": lead_pp(3),
        "wv": lead_pp(3), "wo": lead_pp(3), "post_norm": lead_pp(2),
        "w_gate": lead_pp(3), "w_up": lead_pp(3), "w_down": lead_pp(3),
    }
    if cfg.attention_bias:
        specs.update(bq=lead_pp(2), bk=lead_pp(2), bv=lead_pp(2))
    return specs


def shard_layers_pp(layers, cfg: ModelConfig, mesh: Mesh):
    """Device_put the stacked layer stack with stages over `pp`."""
    specs = pp_layer_pspecs(cfg)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in layers.items()}


def pipeline_apply(mesh: Mesh, layers, cfg: ModelConfig, h: jnp.ndarray,
                   cos: jnp.ndarray, sin: jnp.ndarray, lengths: jnp.ndarray,
                   n_micro: int, attn_impl: str = "dense",
                   remat: bool = True):
    """Run the [L, ...] layer stack over `h` with a `pp`-staged pipeline.

    h: [B, S, D] hidden states (post-embed); cos/sin: [B, S, hd];
    lengths: [B]. Returns (h_out [B, S, D], (k_last, v_last) of the LAST
    layer, both [B, S, Hkv, hd]) — the same contract as
    ``forward_train(..., return_last_kv=True)`` needs for GLIDE
    distillation. B must divide by n_micro (and by the mesh's dp).
    """
    pp = mesh.shape["pp"]
    L = cfg.num_layers
    assert L % pp == 0, (L, pp)
    b, s, d = h.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    hkv, hd = cfg.num_kv_heads, cfg.head_dim_

    # [n_micro, mb, ...] microbatch stacks; metadata is indexed per-stage by
    # m = t - stage rather than ppermuted alongside the activations
    hs = h.reshape(n_micro, mb, s, d)
    cos_s = cos.reshape(n_micro, mb, s, cos.shape[-1])
    sin_s = sin.reshape(n_micro, mb, s, sin.shape[-1])
    len_s = lengths.reshape(n_micro, mb)

    # microbatch rows shard over dp only when they divide it; otherwise the
    # data replicates across dp (correct, just idle pipelines — e.g. tiny
    # CI batches on a big mesh)
    dp_in_mesh = ("dp" in mesh.axis_names and mesh.shape["dp"] > 1
                  and mb % mesh.shape["dp"] == 0)

    def dat(rank):
        if not dp_in_mesh:
            return P()
        return P(*((None, "dp") + (None,) * (rank - 2)))

    lspecs = pp_layer_pspecs(cfg)
    layer_in_specs = {k: lspecs[k] for k in layers}

    def run(layers_loc, hs, cos_s, sin_s, len_s):
        stage = jax.lax.axis_index("pp")
        n_ticks = n_micro + pp - 1

        def stage_fn(x, m):
            cosm = jax.lax.dynamic_index_in_dim(cos_s, m, 0, False)
            sinm = jax.lax.dynamic_index_in_dim(sin_s, m, 0, False)
            lenm = jax.lax.dynamic_index_in_dim(len_s, m, 0, False)

            def lyr(hh, lp):
                return M.train_layer(hh, lp, cfg, cosm, sinm, lenm, attn_impl)
            if remat:
                lyr = jax.checkpoint(lyr)
            x, (ks, vs) = jax.lax.scan(lyr, x, layers_loc)
            return x, (ks[-1], vs[-1])

        def put(buf, val, m, live):
            cur = jax.lax.dynamic_index_in_dim(buf, m, 0, False)
            return jax.lax.dynamic_update_index_in_dim(
                buf, jnp.where(live, val, cur), m, 0)

        def tick(carry, t):
            x, out, kout, vout = carry
            m = jnp.clip(t - stage, 0, n_micro - 1)
            # stage 0 injects microbatch t (idle/bubble ticks recompute a
            # clipped microbatch whose result is masked out below)
            inj = jax.lax.dynamic_index_in_dim(
                hs, jnp.clip(t, 0, n_micro - 1), 0, False)
            x = jnp.where(stage == 0, inj, x)
            y, (kl, vl) = stage_fn(x, m)
            live = ((t >= stage) & (t - stage < n_micro)
                    & (stage == pp - 1))
            out = put(out, y, m, live)
            kout = put(kout, kl, m, live)
            vout = put(vout, vl, m, live)
            x_next = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return (x_next, out, kout, vout), None

        mb_loc = hs.shape[1]
        x0 = jnp.zeros((mb_loc, s, d), hs.dtype)
        out0 = jnp.zeros_like(hs)
        kv0 = jnp.zeros((n_micro, mb_loc, s, hkv, hd), hs.dtype)
        (x, out, kout, vout), _ = jax.lax.scan(
            tick, (x0, out0, kv0, kv0), jnp.arange(n_ticks))
        # only the last stage holds real outputs; replicate over pp
        last = (stage == pp - 1).astype(out.dtype)
        out = jax.lax.psum(out * last, "pp")
        kout = jax.lax.psum(kout * last.astype(kout.dtype), "pp")
        vout = jax.lax.psum(vout * last.astype(vout.dtype), "pp")
        return out, kout, vout

    out, kout, vout = shard_map(
        run, mesh=mesh,
        in_specs=(layer_in_specs, dat(4), dat(4), dat(4), dat(2)),
        out_specs=(dat(4), dat(5), dat(5)),
        check_vma=False,
    )(layers, hs, cos_s, sin_s, len_s)
    h_out = out.reshape(b, s, d)
    k_last = kout.reshape(b, s, hkv, hd)
    v_last = vout.reshape(b, s, hkv, hd)
    return h_out, (k_last, v_last)


def pipeline_forward_train(mesh: Mesh, params, cfg: ModelConfig,
                           tokens: jnp.ndarray,
                           positions: Optional[jnp.ndarray] = None,
                           lengths: Optional[jnp.ndarray] = None,
                           n_micro: int = 2, attn_impl: str = "dense",
                           remat: bool = True,
                           return_last_kv: bool = False):
    """Pipeline-parallel twin of ``models.llama.forward_train`` (no cache).

    Embedding, final norm, and the (replicated) non-layer params run outside
    the pipeline; the [L, ...] stack runs staged over `pp`. Output is
    bit-comparable to forward_train up to the usual reduction-order noise
    (token-exact greedy in tests at fp32).
    """
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)
    cos, sin = rope_cos_sin(positions, cfg.head_dim_, cfg.rope_theta,
                            scaling=cfg.rope_scaling)
    h = M.embed(params, tokens)
    h, (k_last, v_last) = pipeline_apply(
        mesh, params["layers"], cfg, h, cos, sin, lengths,
        n_micro=n_micro, attn_impl=attn_impl, remat=remat)
    out = M._final(params, cfg, h)
    if return_last_kv:
        return out, (k_last, v_last)
    return out
