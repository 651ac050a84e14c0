#!/usr/bin/env python
"""Tree-round time breakdown on the real chip (VERDICT r1 'what's weak' #6).

Loads the cached hard-language bench models (2.5B target + GLIDE draft),
prefills at --ctx, then times each component of one tree-speculation round
separately with jitted functions and host-readback barriers:

  vanilla_step   one autoregressive decode step (the speedup denominator,
                 and ~ the floor for the verify forward)
  verify         target forward_append over the N-node tree + fp32 logits
  draft_reenc    draft re-encode of the A accepted tokens (glide_forward)
  draft_level    one tree-expansion level: glide_forward over level-2 width
                 + beam top-k over the (possibly int8) scoring head
  tree_round     the full jitted round via a limit-1 while-loop segment

and prints one JSON line with ms each plus the non-verify fraction of the
round (VERDICT target: < 20%).

Usage: python scripts/profile_tree.py [--ctx 8192] [--attn chunked]
         [--draft-head int8] [--draft-compute int8] [--tree-shape 4,16,16,16,16]
         [--tag hard256_s4096]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np  # noqa: E402


def timeit(fn, *args, iters=20, warmup=2):
    """Median wall ms per call; host readback of a small leaf as the barrier
    (block_until_ready can no-op through the axon relay)."""
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--attn", type=str, default="chunked")
    ap.add_argument("--draft-head", type=str, default="int8")
    ap.add_argument("--draft-compute", type=str, default="int8")
    ap.add_argument("--tree-shape", type=str, default="4,16,16,16,16")
    ap.add_argument("--row", type=str, default="hard_8k",
                    help="bench row whose cached pair to profile")
    ap.add_argument("--n-states", type=int, default=256)
    ap.add_argument("--window", type=int, default=0,
                    help="decode-time sliding window + 4 sinks (bench "
                    "hard_32k uses 12288)")
    ap.add_argument("--decode-dtype", type=str, default="fp32",
                    choices=["fp32", "native"],
                    help="EngineConfig.decode_dtype for the profiled engine")
    ap.add_argument("--batch", type=int, default=1,
                    help="prompt batch size (the tree-round batch-scaling "
                    "question, VERDICT r4 #5: which component stops "
                    "scaling from b=1 to b=4)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU run (logic check only)")
    args = ap.parse_args()

    global jax
    import jax
    if args.smoke:
        import jax._src.xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig
    from longspec_tpu.models import llama as M
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2
    from bench import load_tree, row_cache_paths, big_model_config

    if args.smoke:
        cfg = ModelConfig(vocab_size=503, hidden_size=128,
                          intermediate_size=256, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=32,
                          max_position_embeddings=4096, eos_token_id=1)
        dcfg = DraftConfig(window=64)
        args.ctx = min(args.ctx, 192)
        args.n_states = cfg.vocab_size - 2
    else:
        cfg = big_model_config()
        dcfg = DraftConfig(window=512)
    if args.window:
        import dataclasses
        cfg = dataclasses.replace(cfg, sliding_window=args.window,
                                  attn_sinks=4)
        dcfg = dataclasses.replace(dcfg, ca_window=args.window, ca_anchors=4)
    ecfg = EngineConfig(tree_shape=tuple(int(x) for x in
                                         args.tree_shape.split(",")),
                        gamma=4, temperature=0.0, attn_impl=args.attn,
                        draft_head=args.draft_head,
                        draft_compute=args.draft_compute,
                        decode_dtype=args.decode_dtype)
    if args.smoke:
        cache = os.path.join(ROOT, ".bench_cache")
        tpath = os.path.join(cache, "target_v5_smoke2_2x128x256.npz")
        dpath = os.path.join(cache, "draft_v5_smoke2_2x128x256.npz")
    else:
        tpath, dpath = row_cache_paths(args.row)
    params = load_tree(tpath)
    dparams = load_tree(dpath)
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)

    succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                    n_states=args.n_states, branch_frac=0.2)
    prompt = sample_corpus2(succ2, probs2, args.batch, args.ctx, seed=999)
    lens = jnp.asarray(np.full((args.batch,), args.ctx, np.int32))
    b = args.batch
    N, A = ecfg.tree_size, ecfg.tree_depth + 1
    s_max = args.ctx + 512 + N + 16

    state = eng.init_state(b, s_max)
    rng = jax.random.PRNGKey(0)
    prefill = jax.jit(eng._prefill_impl)
    state, t0, _ = prefill(eng.params, eng.draft_params,
                           jnp.asarray(prompt, jnp.int32), lens, state, rng)
    np.asarray(t0)
    out = {"ctx": args.ctx, "batch": b, "attn": args.attn,
           "draft_head": args.draft_head,
           "draft_compute": args.draft_compute, "tree_shape": args.tree_shape,
           "decode_dtype": args.decode_dtype}

    # --- full tree round (limit-1 segment) ---
    carry = eng._spec_carry(state, t0, 512, rng, A, defer=True)
    import functools
    seg = jax.jit(functools.partial(eng._spec_segment, eng._tree_round))
    # carry is never donated here, so rounds stays 0 and limit=1 executes
    # exactly one round per call
    def one_round():
        c, status = seg(eng.params, eng._decode_draft_params, carry,
                        jnp.int32(1))
        return status
    out["tree_round_ms"] = timeit(one_round, iters=20)

    # --- vanilla step (limit-1 segment) ---
    vcarry = eng._vanilla_carry(state, t0, 512, rng)
    vseg = jax.jit(functools.partial(eng._vanilla_segment, max_gen_len=512))
    def one_van():
        c, status = vseg(eng.params, vcarry, jnp.int32(1))
        return status
    out["vanilla_step_ms"] = timeit(one_van, iters=20)

    # --- verify alone: forward_append over N tree tokens + fp32 logits ---
    tree_tokens = jnp.asarray(prompt[:, :N], jnp.int32)
    tmask = jnp.tril(jnp.ones((b, N, N), bool))
    pos_t = state.cache_lens[:, None] + jnp.arange(N)[None, :]
    # NOTE all micro-bench jits below take params as ARGUMENTS: closing over
    # eng.params captures ~5GB as MLIR constants, and uploading that program
    # through the remote-compile tunnel breaks the pipe (round-2/3 crashes).
    @jax.jit
    def verify(params, kv_k, kv_v, cache_lens):
        hv, _, _, nk, nv = M.forward_append(
            params, cfg, tree_tokens, pos_t, tmask, cache_lens,
            kv_k, kv_v, attn_impl=ecfg.attn_impl, collect_kv=True,
            compute_dtype=eng._cdt)
        return M.logits_at(params, hv)
    out["verify_ms"] = timeit(verify, eng.params, state.kv_k, state.kv_v,
                              state.cache_lens, iters=20)

    # --- vanilla decomposition: the T=1 target forward without the head,
    # and the fp32 lm_head projection alone (is the denominator the model
    # read or the head?) ---
    one_tok = jnp.asarray(prompt[:, :1], jnp.int32)
    smask1 = jnp.ones((b, 1, 1), bool)

    @jax.jit
    def append_only(params, kv_k, kv_v, cache_lens):
        h, _, _ = M.forward_append(
            params, cfg, one_tok, cache_lens[:, None], smask1,
            cache_lens, kv_k, kv_v, attn_impl=ecfg.attn_impl,
            compute_dtype=eng._cdt)
        return h[:, 0, :4]
    out["append1_ms"] = timeit(append_only, eng.params, state.kv_k,
                               state.kv_v, state.cache_lens, iters=20)
    hrow = jnp.zeros((b, cfg.hidden_size), jnp.float32)

    @jax.jit
    def head_only(params, h):
        return M.logits_at(params, h)[:, :8]
    out["lm_head_ms"] = timeit(head_only, eng.params, hrow, iters=20)

    # --- draft re-encode of A accepted tokens ---
    from longspec_tpu.models import glide as G
    acc = jnp.asarray(prompt[:, :A], jnp.int32)
    @jax.jit
    def reenc(params, dpar, st_):
        pos = st_.d_cache_lens[:, None] + jnp.arange(A)[None, :]
        emb = M.embed(params, acc)
        llm_k, llm_v, llm_layer = eng._llm_ca_args(st_)
        h, _, _ = G.glide_forward(
            dpar, cfg, dcfg, emb, pos,
            st_.d_kv_k, st_.d_kv_v, st_.d_cache_lens,
            llm_k, llm_v, pos,
            attn_impl=ecfg.attn_impl, write_at=st_.d_cache_lens,
            llm_written=st_.cache_lens, llm_layer=llm_layer)
        return h[:, -1, 0]
    out["draft_reenc_ms"] = timeit(reenc, eng.params,
                                   eng._decode_draft_params, state, iters=20)

    # --- one expansion level (width = level-2 width) + beam top-k ---
    c_l = ecfg.tree_shape[0]
    toks_l = jnp.asarray(prompt[:, :c_l], jnp.int32)
    sfx = jnp.zeros((b, c_l, N), bool).at[:, :, 0].set(True)
    tk = jnp.zeros((b, N, cfg.num_kv_heads, cfg.head_dim_), jnp.bfloat16)
    tv = jnp.zeros((b, N, cfg.num_kv_heads, cfg.head_dim_), jnp.bfloat16)
    @jax.jit
    def level(params, dpar, st_, tk_, tv_):
        emb_l = M.embed(params, toks_l)
        pos_l = jnp.broadcast_to((st_.d_cache_lens - 1 + 1)[:, None], (b, c_l))
        llm_k, llm_v, llm_layer = eng._llm_ca_args(st_)
        h_l, tk2, tv2 = G.glide_forward(
            dpar, cfg, dcfg, emb_l, pos_l,
            st_.d_kv_k, st_.d_kv_v, st_.d_cache_lens,
            llm_k, llm_v,
            jnp.broadcast_to(st_.cache_lens[:, None], (b, c_l)),
            suffix_mask=sfx, attn_impl=ecfg.attn_impl,
            suffix_kv=(tk_, tv_), suffix_write_offset=1,
            llm_written=st_.cache_lens, llm_layer=llm_layer)
        vals, ids = eng._beam_topk(params, h_l, ecfg.tree_shape[1]
                                   if len(ecfg.tree_shape) > 1 else 4)
        return vals
    out["draft_level_ms"] = timeit(level, eng.params,
                                   eng._decode_draft_params, state, tk, tv,
                                   iters=20)

    gamma = ecfg.tree_depth
    modeled = (out["verify_ms"] + out["draft_reenc_ms"]
               + (gamma - 1) * out["draft_level_ms"])
    out["modeled_round_ms"] = round(modeled, 3)
    out["nonverify_frac_of_round"] = round(
        1.0 - out["verify_ms"] / out["tree_round_ms"], 4)
    out["unattributed_ms"] = round(out["tree_round_ms"] - modeled, 3)
    for k in ("tree_round_ms", "vanilla_step_ms", "verify_ms",
              "draft_reenc_ms", "draft_level_ms", "append1_ms",
              "lm_head_ms"):
        out[k] = round(out[k], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
