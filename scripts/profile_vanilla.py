"""Dissect the 32k vanilla decode step on the real chip.

Measured row: 24.7 ms/step (pallas, window 12288) vs ~8 ms roofline
(5.1GB params + ~0.9GB windowed KV at 800GB/s). At 8k full attention the
step is near roofline (10.5 ms), so something scales with CONTEXT beyond
the window. Hypotheses, each isolated by one knob below:
  * s_max (cache buffer length): XLA copying the [L,B,Hkv,S,D] cache in the
    while-loop body (failed donation / defensive copy) costs O(s_max).
  * decode_dtype fp32 islands.
  * attention impl (pallas chunk skipping vs XLA chunked).
Prints one JSON line per config: ms/token over `gen` tokens, timed inside
the engine's own loop (prefill excluded).
"""
import argparse, dataclasses, itertools, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig
from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=32768)
ap.add_argument("--gen", type=int, default=64)
ap.add_argument("--row", type=str, default="hard_32k")
ap.add_argument("--attn", type=str, default="pallas,chunked",
                help="comma list of attn impls to sweep")
ap.add_argument("--dd", type=str, default="fp32,native",
                help="comma list of decode dtypes to sweep")
ap.add_argument("--uni", type=str, default="1,0",
                help="comma list of uniform_decode_shape values")
ap.add_argument("--smax-extra", type=str, default="512,16384",
                help="comma list of s_max slack values")
a = ap.parse_args()

cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths(a.row)
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
sp = BN.SPECS[a.row]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)
succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                n_states=sp["n_states"], branch_frac=0.2)
prompt = jnp.asarray(sample_corpus2(succ2, probs2, 1, a.ctx, seed=999),
                     jnp.int32)
lens = jnp.asarray(np.full((1,), a.ctx, np.int32))

for attn, dd, uni, smax_extra in itertools.product(
        a.attn.split(","), a.dd.split(","),
        tuple(bool(int(x)) for x in a.uni.split(",")),
        tuple(int(x) for x in a.smax_extra.split(","))):
    ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16, 16),
                        gamma=4, temperature=0.0,
                        attn_impl=attn, draft_head="int8",
                        draft_compute="int8", decode_dtype=dd,
                        uniform_decode_shape=uni)
    eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
    s_max = a.ctx + a.gen + ecfg.tree_size + smax_extra
    out = eng.vanilla_generate(prompt, lens, max_gen_len=a.gen, s_max=s_max)
    out = eng.vanilla_generate(prompt, lens, max_gen_len=a.gen, s_max=s_max)
    ms = 1000.0 * out["elapsed"] / max(int(out["num"]), 1)
    print(f'{{"attn": "{attn}", "decode_dtype": "{dd}", '
          f'"uniform": {str(uni).lower()}, "s_max": {s_max}, '
          f'"ms_per_tok": {ms:.2f}}}', flush=True)
    del eng, out
