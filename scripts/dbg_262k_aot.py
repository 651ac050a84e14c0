"""AOT-split the 262k crash: lower+compile the segmented prefill, then run."""
import argparse, dataclasses, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig
from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=262144)
ap.add_argument("--kv-ring", type=int, default=22528)
ap.add_argument("--seg", type=int, default=8192)
a = ap.parse_args()

cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths("long_262k")
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
sp = BN.SPECS["long_262k"]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4,
                             ring_size=sp["draft_ring"])
from longspec_tpu.ops.quantparams import quantize_target_params
params = jax.jit(quantize_target_params)(params)
ecfg = EngineConfig(tree_shape=tuple(map(int, sp["tree_best"].split(","))),
                    gamma=4, temperature=0.0, attn_impl="chunked",
                    draft_head="int8", draft_compute="int8",
                    prefill_seg=a.seg, kv_ring=a.kv_ring)
eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
print("engine built", flush=True)
succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                n_states=sp["n_states"], branch_frac=0.2)
prompt = jnp.asarray(sample_corpus2(succ2, probs2, 1, a.ctx, seed=999),
                     jnp.int32)
lens = jnp.asarray(np.full((1,), a.ctx, np.int32))
state = eng.init_state(1, a.ctx + 80 + ecfg.tree_size + 16, jnp.bfloat16)
rng = jax.random.PRNGKey(0)
fn = jax.jit(functools.partial(eng._prefill_segmented_impl, seg=a.seg),
             donate_argnums=(4,))
t = time.time()
lowered = fn.lower(eng.params, eng.draft_params, prompt, lens, state, rng)
print(f"lowered in {time.time()-t:.1f}s", flush=True)
t = time.time()
compiled = lowered.compile()
print(f"compiled in {time.time()-t:.1f}s", flush=True)
mem = compiled.memory_analysis()
print("mem:", mem, flush=True)
t = time.time()
st2, t0, lg = compiled(eng.params, eng.draft_params, prompt, lens, state, rng)
print("t0:", np.asarray(t0), f"executed in {time.time()-t:.1f}s", flush=True)
