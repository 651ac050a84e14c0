"""Dissect the real vanilla decode loop by ablating engine components.

Unlike dissect_step.py (standalone fori_loop harness — its numbers did not
reproduce the engine's own loop timing), this drives SpecEngine.vanilla_
generate itself, so donation/segment structure is exactly the measured row:

  real        the engine as measured (uniform verify-shaped step)
  nocommit    _commit_rows stubbed to identity: the cache is never written
              back (output garbage after the first token — timing only).
              real - nocommit = the true cost of the commit scatter.
  ctx128      same engine, 128-token prompt: weight-read + dispatch floor
              (no O(ctx) KV read, same program shapes).

One JSON line each, at two s_max slacks to expose any remaining O(s_max).
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
ap.add_argument("--ctx", type=int, default=32768)
ap.add_argument("--gen", type=int, default=128)
ap.add_argument("--row", type=str, default="hard_32k")
ap.add_argument("--attn", type=str, default="pallas")
ap.add_argument("--uniform", type=int, default=1)
ap.add_argument("--smax-extra", type=str, default="512,16384")
a = ap.parse_args()


class NoCommitEngine(SpecEngine):
    def _commit_rows(self, st, new_k, new_v, path_idx_c):
        return st.kv_k, st.kv_v


cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths(a.row)
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
sp = BN.SPECS[a.row]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)
succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7,
                                n_states=sp["n_states"], branch_frac=0.2)
corpus = np.asarray(sample_corpus2(succ2, probs2, 1, a.ctx, seed=999))

for extra in (int(x) for x in a.smax_extra.split(",")):
    for variant, klass, ctx in (("real", SpecEngine, a.ctx),
                                ("nocommit", NoCommitEngine, a.ctx),
                                ("ctx128", SpecEngine, 128)):
        ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16, 16), gamma=4,
                            temperature=0.0, attn_impl=a.attn,
                            draft_head="int8", draft_compute="int8",
                            decode_dtype="fp32",
                            uniform_decode_shape=bool(a.uniform))
        eng = klass(params, dparams, cfg_d, dcfg_d, ecfg)
        prompt = jnp.asarray(corpus[:, :ctx], jnp.int32)
        lens = jnp.asarray(np.full((1,), ctx, np.int32))
        s_max = a.ctx + a.gen + ecfg.tree_size + extra  # FIXED across ctx
        out = eng.vanilla_generate(prompt, lens, max_gen_len=a.gen,
                                   s_max=s_max)
        out = eng.vanilla_generate(prompt, lens, max_gen_len=a.gen,
                                   s_max=s_max)
        ms = 1000.0 * out["elapsed"] / max(int(out["num"]), 1)
        print(f'{{"variant": "{variant}", "attn": "{a.attn}", '
              f'"uniform": {a.uniform}, "s_max": {s_max}, "ctx": {ctx}, '
              f'"ms_per_tok": {ms:.2f}}}', flush=True)
        del eng, out
