#!/usr/bin/env python
"""Locate and dissect the pallas flash_decode losslessness divergence.

ROADMAP: at hard_8k, `--attn pallas` reported lossless=false (tree output !=
vanilla output) while `chunked` is token-exact. This script loads the cached
hard_8k bench pair and:
  1. runs vanilla decode under chunked AND pallas -> are the baselines equal?
  2. runs tree decode under pallas -> first divergent position vs vanilla;
  3. recomputes the target logits at the divergent position through both
     attention impls and prints the top-2 margins, separating "kernel bug"
     (large logit delta) from "fp tie flip" (margin ~1e-6).

Run on the TPU (no JAX_PLATFORMS override) AFTER bench.py has cached models:
  python scripts/debug_pallas_lossless.py [--row hard_8k] [--gen 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", default="hard_8k")
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import load_tree, row_cache_paths, big_model_config
    from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

    cfg = big_model_config()
    dcfg = DraftConfig(window=512)
    tpath, dpath = row_cache_paths(args.row)
    params = load_tree(tpath)
    dparams = load_tree(dpath)

    succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7, n_states=256,
                                    branch_frac=0.2)
    prompt = sample_corpus2(succ2, probs2, 1, args.ctx, seed=999)
    lens = np.full((1,), args.ctx, np.int32)
    s_max = args.ctx + args.gen + 70 + 16

    outs = {}
    for impl in ("chunked", "pallas"):
        ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16), gamma=4,
                            attn_impl=impl, draft_head="int8",
                            draft_compute="int8")
        eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
        outs[impl, "van"] = eng.vanilla_generate(
            prompt, lens, max_gen_len=args.gen, s_max=s_max)["output_ids"]
        outs[impl, "tree"] = eng.tree_spec_generate(
            prompt, lens, max_gen_len=args.gen, s_max=s_max)["output_ids"]
        del eng

    n = args.gen - 2
    van_c, van_p = outs["chunked", "van"][0, :n], outs["pallas", "van"][0, :n]
    tree_c, tree_p = outs["chunked", "tree"][0, :n], outs["pallas", "tree"][0, :n]

    def first_diff(a, b):
        d = np.nonzero(a != b)[0]
        return int(d[0]) if len(d) else -1

    print("van  chunked vs pallas: first diff", first_diff(van_c, van_p))
    print("tree chunked vs pallas: first diff", first_diff(tree_c, tree_p))
    print("chunked lossless:", first_diff(van_c, tree_c))
    i = first_diff(van_p, tree_p)
    print("pallas  lossless:", i)
    if i < 0:
        print("pallas is lossless on this prompt — rerun bench to confirm")
        return

    # --- dissect position i: recompute logits both ways on the vanilla
    # prefix (prompt ++ van_p[:i]) ---
    from longspec_tpu.models import llama as M
    full = np.concatenate([prompt[0], np.asarray(van_p[:i])])[None]
    flens = np.asarray([full.shape[1]], np.int32)
    for impl in ("chunked", "pallas", "dense"):
        kv_k, kv_v = M.alloc_kv_cache(cfg, 1, full.shape[1] + 8, jnp.bfloat16)
        h, _, _ = M.forward_prefill(params, cfg, jnp.asarray(full), flens,
                                    kv_k, kv_v, attn_impl=impl)
        lg = np.asarray(M.logits_at(params, h[0, -1]))
        top2 = np.argsort(lg)[-2:][::-1]
        print(f"{impl:8s} top2={top2} margin={lg[top2[0]] - lg[top2[1]]:.3e} "
              f"want_van={van_p[i]} want_tree={tree_p[i]}")
        del kv_k, kv_v, h


if __name__ == "__main__":
    main()
