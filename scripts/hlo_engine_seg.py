"""Compile the engine's REAL vanilla segment (as _run jits it) and report
full-cache copies + peak temps — the ground truth for the deferred-commit
aliasing question."""
import argparse, dataclasses, functools, re, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=32768)
ap.add_argument("--method", type=str, default="vanilla")
a = ap.parse_args()

cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths("hard_32k")
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
sp = BN.SPECS["hard_32k"]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)
ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16, 16), gamma=4,
                    temperature=0.0, attn_impl="pallas", draft_head="int8",
                    draft_compute="int8", decode_dtype="fp32",
                    uniform_decode_shape=True)
eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
st = eng.init_state(1, a.ctx + 64 + ecfg.tree_size + 512)
st = st._replace(cache_lens=jnp.full((1,), a.ctx, jnp.int32))
rng = jax.random.PRNGKey(0)
t0 = jnp.full((1,), 7, jnp.int32)

if a.method == "vanilla":
    carry = eng._vanilla_carry(st, t0, 64, rng)
    fn = jax.jit(functools.partial(eng._vanilla_segment, max_gen_len=64),
                 donate_argnums=(1,))
else:
    carry = eng._spec_carry(st, t0, 64, rng, ecfg.tree_depth + 1, defer=True)
    fn = jax.jit(functools.partial(eng._spec_segment, eng._tree_round),
                 donate_argnums=(2,))
    comp = fn.lower(eng.params, eng._decode_draft_params, carry,
                    jnp.int32(8)).compile()
if a.method == "vanilla":
    comp = fn.lower(eng.params, carry, jnp.int32(8)).compile()

txt = comp.as_text()
n_copy = 0
for line in txt.splitlines():
    if "copy(" in line and re.search(r"\[(?:\d+,)*3\d{4}", line):
        n_copy += 1
        print(line.strip()[:180])
mem = comp.memory_analysis()
print(f"cache-sized copies: {n_copy}")
print("peak temp bytes:", getattr(mem, "temp_size_in_bytes", None))
