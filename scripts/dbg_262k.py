"""Bisect the long_262k TPU worker crash: stage-by-stage drive of the exact
bench row config (kv_ring 22528, prefill_seg 8192, int8 weights, chunked)."""
import argparse, dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=262144)
ap.add_argument("--gen", type=int, default=1)
ap.add_argument("--kv-ring", type=int, default=22528)
ap.add_argument("--method", type=str, default="vanilla")
a = ap.parse_args()

import jax
cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths("long_262k")
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
print("models loaded", flush=True)
sp = BN.SPECS["long_262k"]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4,
                             ring_size=sp["draft_ring"])
from longspec_tpu.ops.quantparams import quantize_target_params
params = jax.jit(quantize_target_params)(params)
ecfg = EngineConfig(tree_shape=tuple(map(int, sp["tree_best"].split(","))),
                    gamma=4, temperature=0.0, attn_impl="chunked",
                    draft_head="int8", draft_compute="int8",
                    prefill_seg=sp["prefill_seg"], kv_ring=a.kv_ring)
eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
print("engine built", flush=True)
succ2, probs2 = __import__("longspec_tpu.train.synthetic", fromlist=["x"]).make_markov2_lm(cfg.vocab_size, seed=7,
                                   n_states=sp["n_states"], branch_frac=0.2)
prompt = __import__("longspec_tpu.train.synthetic", fromlist=["x"]).sample_corpus2(succ2, probs2, 1, a.ctx, seed=999)
lens = np.full((1,), a.ctx, np.int32)
s_max = a.ctx + a.gen + ecfg.tree_size + 16
print(f"running {a.method} ctx={a.ctx} gen={a.gen}...", flush=True)
t = time.time()
fn = {"vanilla": eng.vanilla_generate, "tree": eng.tree_spec_generate}[a.method]
out = fn(prompt, lens, max_gen_len=a.gen, s_max=s_max)
print("OK", {k: v for k, v in out.items() if k in ("num", "count", "elapsed")},
      f"wall={time.time()-t:.1f}s", flush=True)
