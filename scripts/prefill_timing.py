"""Time the segmented-prefill stages at a given ctx on the real chip:
per-dispatch wall clock for the grouped prefill under each attn impl —
the number that set the 262k tunnel-kill and that the pallas ring kernel
+ gather ring writes are meant to crush."""
import argparse, dataclasses, sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig
from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=131072)
ap.add_argument("--attns", type=str, default="chunked,pallas")
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
succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                n_states=sp["n_states"], branch_frac=0.2)
prompt = jnp.asarray(sample_corpus2(succ2, probs2, 1, a.ctx, seed=999),
                     jnp.int32)
lens = jnp.asarray(np.full((1,), a.ctx, np.int32))

for attn in a.attns.split(","):
    ecfg = EngineConfig(tree_shape=(4, 16), gamma=4, temperature=0.0,
                        attn_impl=attn, draft_head="int8",
                        draft_compute="int8", prefill_seg=sp["prefill_seg"],
                        kv_ring=sp["kv_ring"])
    eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
    state = eng.init_state(1, a.ctx + 256, jnp.bfloat16)
    t = time.time()
    st, t0, _ = eng._prefill_segmented_grouped(
        eng.params, eng.draft_params, prompt, lens, state,
        jax.random.PRNGKey(0), seg=sp["prefill_seg"], group=8)
    np.asarray(t0)
    wall = time.time() - t
    n_seg = a.ctx // sp["prefill_seg"]
    print(f'{{"attn": "{attn}", "ctx": {a.ctx}, "n_seg": {n_seg}, '
          f'"prefill_s": {wall:.1f}, "per_seg_s": {wall/n_seg:.2f}}}',
          flush=True)
    del eng, state, st
