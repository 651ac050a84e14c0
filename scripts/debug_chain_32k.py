#!/usr/bin/env python
"""Dissect the hard_32k pallas chain/magicdec lossless=false report.

The pallas row at 32k shows tree lossless=true but chain (and magicdec)
lossless=false vs the same-impl vanilla. This script reproduces the bench
row's exact configuration (windowed model, markov2 prompt seed 999), finds
the first divergent position, and recomputes the target logits at that
position under dense/chunked/pallas prefill to separate "kernel bug"
(large logit delta between impls) from "bf16 tie flip" (tiny top-2 margin).

Run on the TPU after bench.py has cached the hard_32k models:
  python scripts/debug_chain_32k.py [--impl pallas] [--method chain]
"""
import argparse
import dataclasses
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--method", default="chain",
                    choices=["chain", "magicdec", "tree"])
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=32768)
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import (load_tree, row_cache_paths, big_model_config, SPECS)
    from longspec_tpu.config import DraftConfig, EngineConfig
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

    sp = SPECS["hard_32k"]
    cfg = big_model_config()
    dcfg = DraftConfig(window=512)
    if sp["window"]:
        cfg = dataclasses.replace(cfg, sliding_window=sp["window"],
                                  attn_sinks=4)
        dcfg = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)
    tpath, dpath = row_cache_paths("hard_32k")
    params = load_tree(tpath)
    dparams = load_tree(dpath)

    succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                    n_states=sp["n_states"], branch_frac=0.2)
    prompt = sample_corpus2(succ2, probs2, 1, args.ctx, seed=999)
    lens = np.full((1,), args.ctx, np.int32)
    s_max = args.ctx + args.gen + 70 + 16

    ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16), gamma=4,
                        attn_impl=args.impl, draft_head="int8",
                        draft_compute="int8")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    van = eng.vanilla_generate(prompt, lens, max_gen_len=args.gen,
                               s_max=s_max)
    fn = {"chain": eng.spec_generate, "magicdec": eng.magicdec_generate,
          "tree": eng.tree_spec_generate}[args.method]
    out = fn(prompt, lens, max_gen_len=args.gen, s_max=s_max)
    n = int(min(van["num"], out["count"] + out["num"], args.gen - 1))
    v = np.asarray(van["output_ids"])[0, :n]
    s = np.asarray(out["output_ids"])[0, :n]
    d = np.nonzero(v != s)[0]
    if not len(d):
        print(f"{args.method} under {args.impl}: lossless over {n} tokens "
              "on this prompt")
        return
    i = int(d[0])
    print(f"first divergence at {i}/{n}: vanilla={v[i]} {args.method}={s[i]}")
    print("context:", v[max(0, i - 4):i + 3], "vs", s[max(0, i - 4):i + 3])
    del eng, out
    gc.collect()

    # recompute logits at position i on the vanilla prefix under all impls
    import jax
    from longspec_tpu.models import llama as M
    full = np.concatenate([prompt[0], v[:i]])[None]
    flens = np.asarray([full.shape[1]], np.int32)
    for impl in ("chunked", "pallas"):
        kv_k, kv_v = M.alloc_kv_cache(cfg, 1, full.shape[1] + 8, jnp.bfloat16)
        h, _, _ = M.forward_prefill(params, cfg, jnp.asarray(full), flens,
                                    kv_k, kv_v, attn_impl=impl)
        lg = np.asarray(M.logits_at(params, h[0, -1]))
        top2 = np.argsort(lg)[-2:][::-1]
        print(f"{impl:8s} top2={top2} margin={lg[top2[0]] - lg[top2[1]]:.3e} "
              f"want_van={v[i]} want_{args.method}={s[i]}")
        del kv_k, kv_v, h
        gc.collect()


if __name__ == "__main__":
    main()
