#!/usr/bin/env python
"""Teacher-forced accuracy of a cached bench target by position band.

Diagnoses the hard_32k accept collapse (round-2): if the seq-16384-trained
target's next-token accuracy drops past position ~16384, the failure is
position generalization of the TARGET, not the draft or the engine.

Usage: python scripts/probe_position_gen.py [--tag hard256_s16384]
           [--ctx 32768] [--bands 4096]
Prints one JSON line: {"band_start": acc, ...}.
"""
import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", type=str, default="hard_32k",
                    help="bench row whose cached target to probe")
    ap.add_argument("--n-states", type=int, default=256)
    ap.add_argument("--ctx", type=int, default=32768)
    ap.add_argument("--band", type=int, default=4096)
    ap.add_argument("--rows", type=int, default=2)
    ap.add_argument("--window", type=int, default=0,
                    help="eval with sliding-window attention (0 = full): "
                    "diagnoses span dilution vs rope-phase failure")
    ap.add_argument("--sinks", type=int, default=0)
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp
    from longspec_tpu.models import llama as M
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2
    from bench import load_tree, row_cache_paths, big_model_config

    cfg = big_model_config()
    if args.window:
        cfg = dataclasses.replace(cfg, sliding_window=args.window,
                                  attn_sinks=args.sinks)
    params = load_tree(row_cache_paths(args.row)[0])
    succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                    n_states=args.n_states, branch_frac=0.2)
    toks = sample_corpus2(succ2, probs2, args.rows, args.ctx, seed=999)
    toks_j = jnp.asarray(toks)

    @jax.jit
    def hidden_fn(params, tokens):
        h = M.forward_train(params, cfg, tokens, attn_impl="chunked",
                            remat=True)
        return h

    h = hidden_fn(params, toks_j)          # [rows, ctx, H] bf16
    accs = {}
    for start in range(0, args.ctx - args.band + 1, args.band):
        sl = h[:, start:start + args.band - 1]
        logits = M.logits_at(params, sl)   # [rows, band-1, V]
        pred = np.asarray(jnp.argmax(logits, -1))
        gold = toks[:, start + 1:start + args.band]
        accs[str(start)] = round(float((pred == gold).mean()), 4)
        print(f"band {start:>6}: acc {accs[str(start)]}", file=sys.stderr)
    print(json.dumps(accs))


if __name__ == "__main__":
    main()
