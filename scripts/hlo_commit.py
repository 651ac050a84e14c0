"""Compile the commit-only decode-loop body on the TPU and print every HLO
op that touches an O(s_max) buffer — finds where the full-cache copy that
dissect_step measured (commit-only ~12.5 ms) actually comes from."""
import argparse, dataclasses, re, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=32768)
ap.add_argument("--variant", type=str, default="commit",
                help="commit | full | nocommit")
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
st0 = eng.init_state(1, a.ctx + 64 + ecfg.tree_size + 512)
st0 = st0._replace(cache_lens=jnp.full((1,), a.ctx, jnp.int32))


def step(p, st):
    toks = jnp.full((1, 1), 7, jnp.int32)
    toks_u, pos_u, vmask = eng._uniform_args(st, toks)
    if a.variant == "commit":
        nk = jnp.zeros((cfg.num_layers, 1, toks_u.shape[1],
                        cfg.num_kv_heads, cfg.head_dim_), jnp.bfloat16)
        nv = nk
        sig = jnp.float32(0)
    else:
        lg, nk, nv = eng._verify_forward(p, st, toks_u, pos_u, vmask)
        sig = lg[0, 0, 0]
    if a.variant in ("commit", "full"):
        kv_k, kv_v = eng._commit_rows(st, nk, nv, jnp.zeros((1, 1), jnp.int32))
        st = st._replace(kv_k=kv_k, kv_v=kv_v, cache_lens=st.cache_lens + 1)
    return st, sig


def loop(p, st, n):
    def body(i, c):
        st, acc = c
        st, sig = step(p, st)
        return (st, acc + sig)
    return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))


f = jax.jit(loop, donate_argnums=(1,), static_argnums=(2,))
lowered = f.lower(eng.params, st0, 8)
comp = lowered.compile()
txt = comp.as_text()
print(f"HLO chars: {len(txt)}")
# any op whose output shape has a dim >= 30000 (the cache S dim)
big = re.compile(r"^\s*(?:ROOT\s+)?%?\S+ = \S*\[(?:\d+,)*\d{5,}(?:,\d+)*\]")
hits = {}
for line in txt.splitlines():
    if big.match(line):
        op = line.strip().split(" = ")[1].split("(")[0]
        kind = op.split("[")[0].split(".")[0].split("(")[0]
        kind = re.sub(r"\d+$", "", kind.split()[-1]) if " " in op else kind
        hits.setdefault(kind[:60], []).append(line.strip()[:160])
for k, v in sorted(hits.items(), key=lambda kv: -len(kv[1])):
    print(f"== {k}  x{len(v)}")
    for s in v[:6]:
        print("   ", s)
mem = comp.memory_analysis()
print("peak bytes:", getattr(mem, "temp_size_in_bytes", None),
      "args:", getattr(mem, "argument_size_in_bytes", None))
