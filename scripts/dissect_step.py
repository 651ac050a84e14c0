"""Dissect the uniform vanilla/verify decode step into components.

profile_vanilla at head (post stacked-read fix) still shows ms/tok scaling
with ALLOCATED cache rows (s_max): pallas fp32 uniform 19.2 -> 22.3 ms/tok
for s_max 33429 -> 49301 although the kernel clamps its grid to n_used
chunks. This script times each component of the step separately inside ONE
jitted fori_loop dispatch (the ~25ms tunnel latency amortizes over `iters`
steps), at two s_max values, so the O(s_max) term can be attributed:

  full      verify_forward + commit + bookkeeping  (the real step)
  nocommit  verify_forward only (logits consumed; cache never written)
  nokv      verify_forward with cache_lens=128 (k_hi tiny: weight reads +
            suffix only — the weight-bandwidth floor)
  commit    commit only (gather+scatter of 1 row into the cache per layer)

Each prints one JSON line; diff across s_max isolates the scaling term.
"""
import argparse, dataclasses, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
import bench as BN
from longspec_tpu.config import DraftConfig
from longspec_tpu.engine.engine import SpecEngine, EngineConfig

ap = argparse.ArgumentParser()
ap.add_argument("--ctx", type=int, default=32768)
ap.add_argument("--iters", type=int, default=64)
ap.add_argument("--row", type=str, default="hard_32k")
ap.add_argument("--attn", type=str, default="pallas")
ap.add_argument("--smax-extra", type=str, default="512,16384")
ap.add_argument("--parts", type=str, default="full,nocommit,nokv,commit")
a = ap.parse_args()

cfg = BN.big_model_config()
dcfg = DraftConfig(window=512)
tpath, dpath = BN.row_cache_paths(a.row)
params, dparams = BN.load_tree(tpath), BN.load_tree(dpath)
sp = BN.SPECS[a.row]
cfg_d = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
dcfg_d = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)

for extra in (int(x) for x in a.smax_extra.split(",")):
    ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16, 16), gamma=4,
                        temperature=0.0, attn_impl=a.attn,
                        draft_head="int8", draft_compute="int8",
                        decode_dtype="fp32", uniform_decode_shape=True)
    eng = SpecEngine(params, dparams, cfg_d, dcfg_d, ecfg)
    s_max = a.ctx + 64 + ecfg.tree_size + extra
    st0 = eng.init_state(1, s_max)
    s_alloc = st0.kv_k.shape[3]
    # fill the cache with plausible bf16 rows and pretend ctx is cached
    key = jax.random.PRNGKey(0)
    st0 = st0._replace(
        kv_k=(jax.random.normal(key, st0.kv_k.shape, jnp.bfloat16) * 0.3),
        kv_v=(jax.random.normal(key, st0.kv_v.shape, jnp.bfloat16) * 0.3),
        cache_lens=jnp.full((1,), a.ctx, jnp.int32))

    def step(p, st, variant):
        toks = jnp.full((1, 1), 7, jnp.int32)
        if variant == "nokv":
            st_r = st._replace(cache_lens=jnp.full((1,), 128, jnp.int32))
        else:
            st_r = st
        toks_u, pos_u, vmask = eng._uniform_args(st_r, toks)
        if variant == "commit":
            nk = jnp.zeros((cfg.num_layers, 1, toks_u.shape[1],
                            cfg.num_kv_heads, cfg.head_dim_), jnp.bfloat16)
            nv = nk
            sig = jnp.float32(0)
        else:
            lg, nk, nv = eng._verify_forward(p, st_r, toks_u, pos_u,
                                             vmask)
            sig = lg[0, 0, 0]
        if variant in ("full", "commit"):
            kv_k, kv_v = eng._commit_rows(st, nk, nv,
                                          jnp.zeros((1, 1), jnp.int32))
            st = st._replace(kv_k=kv_k, kv_v=kv_v,
                             cache_lens=st.cache_lens + 1)
        return st, sig

    for variant in a.parts.split(","):
        def loop(p, st, n, _v=variant):
            def body(i, c):
                st, acc = c
                st, sig = step(p, st, _v)
                return (st, acc + sig)
            return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
        f = jax.jit(loop, donate_argnums=(1,), static_argnums=(2,))
        st = jax.tree_util.tree_map(lambda x: x.copy(), st0)
        st, acc = f(eng.params, st, 2)          # compile + warm
        np.asarray(acc)
        st = jax.tree_util.tree_map(lambda x: x.copy(), st0)
        t0 = time.perf_counter()
        st, acc = f(eng.params, st, a.iters)
        np.asarray(acc)
        dt = time.perf_counter() - t0
        print(f'{{"variant": "{variant}", "attn": "{a.attn}", '
              f'"s_alloc": {s_alloc}, '
              f'"ms_per_iter": {1000.0 * dt / a.iters:.2f}}}', flush=True)
        del st
    del eng, st0
