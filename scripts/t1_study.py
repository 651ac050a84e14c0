"""T=1 acceptance study (round-4 verdict item 6).

Round-3 hard_32k: T=0 tree accept 6.34 -> T=1 accept 3.11 (t1_speedup 1.90
vs the reference's ~2.5x). Hypothesis: i.i.d.-from-q proposals (the exact
law) waste tree slots on duplicate samples, while the reference proposes
top-k children (distinct, but only approximately target-law).

Measures tree throughput/accept at T=1 on a row's committed models for:
  * iid, sharpness 1.0   (round-3 behavior; exact)
  * iid, sharpness 0.5 / 0.25 (proposals from sharper q'; STILL exact —
    the verifier uses the same q' in its accept ratios)
  * topk                 (reference parity; approximate law)
plus the T=0 tree and T=1 vanilla denominator, one JSON line each.
"""
import argparse, dataclasses, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig
from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

ap = argparse.ArgumentParser()
ap.add_argument("--row", type=str, default="hard_32k")
ap.add_argument("--gen", type=int, default=256)
ap.add_argument("--tree", type=str, default="4,16,16,16,16,16,16")
a = ap.parse_args()

cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths(a.row)
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
sp = BN.SPECS[a.row]
ctx = sp["ctx"]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)
tree = tuple(int(x) for x in a.tree.split(","))
succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                n_states=sp["n_states"], branch_frac=0.2)
prompt = jnp.asarray(sample_corpus2(succ2, probs2, 1, ctx, seed=999),
                     jnp.int32)
lens = jnp.asarray(np.full((1,), ctx, np.int32))

CONFIGS = [
    ("t0_tree", dict(temperature=0.0), "tree"),
    ("t1_vanilla", dict(temperature=1.0), "vanilla"),
    ("t1_iid_s1.0", dict(temperature=1.0), "tree"),
    ("t1_iid_s0.5", dict(temperature=1.0, proposal_sharpness=0.5), "tree"),
    ("t1_iid_s0.25", dict(temperature=1.0, proposal_sharpness=0.25), "tree"),
    ("t1_topk", dict(temperature=1.0, t_proposals="topk"), "tree"),
]

for name, kw, method in CONFIGS:
    ecfg = EngineConfig(tree_shape=tree, gamma=4, attn_impl=sp.get(
        "attn_best", "chunked"), draft_head="int8", draft_compute="int8",
        decode_dtype="fp32", uniform_decode_shape=True, **kw)
    eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
    fn = (eng.tree_spec_generate if method == "tree"
          else eng.vanilla_generate)
    out = fn(prompt, lens, max_gen_len=a.gen, seed=11)
    out = fn(prompt, lens, max_gen_len=a.gen, seed=12)  # warm numbers
    tok_s = out["new_tokens"] / out["elapsed"]
    accept = ((out["count"] + out["num"]) / max(out["num"], 1)
              if method == "tree" else 1.0)
    print(f'{{"name": "{name}", "tok_s": {tok_s:.2f}, '
          f'"accept": {accept:.3f}, "gen": {a.gen}}}', flush=True)
    del eng, out
