#!/usr/bin/env python
"""Dissect the hard_32k sliding-window losslessness divergence.

Runs vanilla + tree (chunked impl, window per bench SPECS) on one 32k
prompt, finds the first divergent emitted token, then replays the vanilla
prefix through forward_prefill (dense + chunked, windowed) and prints the
top-2 logit margin at that position:
  * margin ~1e-6 and impls disagree on argmax -> fp tie flip (the hard
    language has genuinely near-tied successors), not an engine bug;
  * margin large or prefill argmax != vanilla's own emitted token ->
    prefill/append semantic mismatch in the window path (real bug).

Run on the TPU after bench.py cached the hard_32k models:
  python scripts/debug_window_lossless.py [--gen 256]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", default="hard_32k")
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--attn", default="chunked")
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import load_tree, row_cache_paths, big_model_config, SPECS
    from longspec_tpu.config import DraftConfig, EngineConfig
    from longspec_tpu.engine.engine import SpecEngine
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

    sp = SPECS[args.row]
    w = sp["window"] or None
    cfg = dataclasses.replace(big_model_config(), sliding_window=w,
                              attn_sinks=4 if w else 0)
    dcfg = DraftConfig(window=512, ca_window=w, ca_anchors=4 if w else 0)
    tpath, dpath = row_cache_paths(args.row)
    params = load_tree(tpath)
    dparams = load_tree(dpath)

    succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                    n_states=sp["n_states"], branch_frac=0.2)
    prompt = sample_corpus2(succ2, probs2, 1, args.ctx, seed=999)
    lens = np.full((1,), args.ctx, np.int32)
    s_max = args.ctx + args.gen + 70 + 16

    ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16), gamma=4,
                        attn_impl=args.attn, draft_head="int8",
                        draft_compute="int8")
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)
    van = eng.vanilla_generate(prompt, lens, max_gen_len=args.gen,
                               s_max=s_max)["output_ids"]
    tree = eng.tree_spec_generate(prompt, lens, max_gen_len=args.gen,
                                  s_max=s_max)["output_ids"]
    del eng

    n = args.gen - 2
    a, b = van[0, :n], tree[0, :n]
    d = np.nonzero(a != b)[0]
    i = int(d[0]) if len(d) else -1
    print(f"first diff at {i} of {n} "
          f"({len(d)} total diffs)" if i >= 0 else "LOSSLESS on this prompt")
    if i < 0:
        return
    print(f"  van[{i}]={a[i]} tree[{i}]={b[i]}  "
          f"context: van {a[max(0, i-3):i+3]} tree {b[max(0, i-3):i+3]}")

    from longspec_tpu.models import llama as M
    full = np.concatenate([prompt[0], np.asarray(a[:i])])[None]
    flens = np.asarray([full.shape[1]], np.int32)
    # NOTE: no "dense" replay here — a dense [S, S] mask at 32k is 138GB
    for impl in ("chunked", "pallas"):
        kv_k, kv_v = M.alloc_kv_cache(cfg, 1, full.shape[1] + 8, jnp.bfloat16)
        h, _, _ = M.forward_prefill(params, cfg, jnp.asarray(full), flens,
                                    kv_k, kv_v, attn_impl=impl)
        lg = np.asarray(M.logits_at(params, h[0, -1]))
        top2 = np.argsort(lg)[-2:][::-1]
        print(f"{impl:8s} top2={top2} margin={lg[top2[0]] - lg[top2[1]]:.3e} "
              f"van_emitted={a[i]} tree_emitted={b[i]}")
        del kv_k, kv_v, h


if __name__ == "__main__":
    main()
