"""Bit-exact cache forensics for a lossless-gate failure.

Runs the vanilla and tree arms of a bench row side by side (same engine
law), finds the first output divergence, then compares the two arms'
COMMITTED KV cache rows bit-for-bit over the agreed prefix. Distinguishes
the two failure classes:

  * caches identical up to the divergence -> the verify forward computed
    materially different logits than the vanilla append at the same state
    (kernel/law bug: fix the shared code path);
  * caches differ bitwise somewhere earlier -> the arms' cache-row
    ROUNDINGS drifted (t=1 vs t=N forwards rounding fresh K/V on opposite
    sides of a bf16/int8 boundary), and a small-margin position eventually
    flipped (fix: coarser deterministic commit grid, or accept as
    measurement-class).

Usage: python scripts/bitdiff_arms.py --row hard_8k --attn pallas --gen 256
"""
import argparse
import functools
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

import numpy as np
import collections

_HostState = collections.namedtuple("_HostState", ["kv_k", "kv_v"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--row", type=str, default="hard_8k")
    ap.add_argument("--attn", type=str, default="pallas")
    ap.add_argument("--gen", type=int, default=256)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--decode-dtype", type=str, default="fp32",
                    choices=["fp32", "native"])
    ap.add_argument("--uniform", type=int, default=1,
                    help="EngineConfig.uniform_decode_shape (1/0)")
    args = ap.parse_args()

    import jax
    if args.smoke:
        import jax._src.xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import dataclasses
    from bench import SPECS, big_model_config, row_cache_paths, load_tree
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2
    from longspec_tpu.config import ModelConfig, DraftConfig, EngineConfig
    from longspec_tpu.engine.engine import SpecEngine

    sp = SPECS[args.row]
    if args.smoke:
        cfg = ModelConfig(vocab_size=503, hidden_size=128,
                          intermediate_size=256, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=32,
                          max_position_embeddings=4096, eos_token_id=1)
        dcfg = DraftConfig(window=64)
        ctx, n_states = 192, cfg.vocab_size - 2
        tpath = os.path.join(ROOT, ".bench_cache", "target_v5_smoke2_2x128x256.npz")
        dpath = os.path.join(ROOT, ".bench_cache", "draft_v5_smoke2_2x128x256.npz")
    else:
        cfg = big_model_config()
        dcfg = DraftConfig(window=512)
        ctx, n_states = sp["ctx"], sp["n_states"]
        tpath, dpath = row_cache_paths(args.row)
    if sp.get("window") and not args.smoke:
        cfg = dataclasses.replace(cfg, sliding_window=sp["window"], attn_sinks=4)
        dcfg = dataclasses.replace(dcfg, ca_window=sp["window"], ca_anchors=4)
    tree_shape = tuple(int(x) for x in
                       sp.get("tree_best", "4,16,16,16,16").split(","))
    if args.smoke:
        tree_shape = (2, 3)
    ecfg = EngineConfig(tree_shape=tree_shape, gamma=4, temperature=0.0,
                        attn_impl=args.attn, draft_head="int8",
                        draft_compute="int8",
                        decode_dtype=args.decode_dtype,
                        uniform_decode_shape=bool(args.uniform))
    params = load_tree(tpath)
    dparams = load_tree(dpath)
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg)

    succ2, probs2 = make_markov2_lm(cfg.vocab_size, seed=7, n_states=n_states,
                                    branch_frac=0.2)
    prompt = sample_corpus2(succ2, probs2, 1, ctx, seed=999)
    lens = jnp.asarray(np.full((1,), ctx, np.int32))
    gen = args.gen if not args.smoke else 48
    s_max = ctx + gen + ecfg.tree_size + 16
    plen = ctx

    def run_arm(method):
        # drive THE production path (engine._run: donated prefill, donated
        # decode segments, deferred commit + final flush) via the public
        # API — a hand-rolled non-donated drive compiles DIFFERENT
        # programs, and under --xla_allow_excess_precision differently-
        # compiled programs can compute measurably different functions
        # (round-5 finding: the hand-rolled arms diverged at token 150
        # while the bench's production arms were token-exact at the same
        # commit). return_state=True hands back the flushed final cache.
        fn = (eng.vanilla_generate if method == "vanilla"
              else eng.tree_spec_generate)
        res = fn(np.asarray(prompt), np.asarray(lens), max_gen_len=gen,
                 s_max=s_max, return_state=True)
        st, out = res["state"], np.asarray(res["output_ids"])
        # pull the caches to HOST and drop every device buffer before the
        # other arm runs — holding two full decode states on the chip next
        # to the 5GB params OOM'd the 11:25 r3c run (RESOURCE_EXHAUSTED)
        kv_k = np.asarray(jax.device_get(st.kv_k))
        kv_v = np.asarray(jax.device_get(st.kv_v))
        del st, res
        import gc
        gc.collect()
        return _HostState(kv_k, kv_v), out

    st_v, out_v = run_arm("vanilla")
    st_t, out_t = run_arm("tree")
    n = min(gen, out_v.shape[1], out_t.shape[1]) - 2
    a, b = out_v[0, :n], out_t[0, :n]
    d = np.nonzero(a != b)[0]
    div = int(d[0]) if len(d) else -1
    print(f"tokens compared: {n}, first divergence: {div}")
    if div < 0:
        print("no divergence — arms agree; comparing full caches anyway")
        div = n  # compare every pre-end committed row

    # committed rows for generated tokens 0..div-1 live at plen..plen+div-1
    for name, cv, ct in (("K", st_v.kv_k, st_t.kv_k),
                         ("V", st_v.kv_v, st_t.kv_v)):
        av = np.asarray(jax.device_get(cv))
        at = np.asarray(jax.device_get(ct))
        rows_v = av[:, :, :, plen:plen + div, :]
        rows_t = at[:, :, :, plen:plen + div, :]
        eq = (rows_v.view(np.uint16) == rows_t.view(np.uint16)
              if rows_v.dtype.itemsize == 2 else rows_v == rows_t)
        if bool(np.all(eq)):
            print(f"{name}: all {div} committed rows bit-identical")
        else:
            ne = np.argwhere(~np.all(eq, axis=(1, 2, 4)))
            # earliest differing POSITION (the previous lexsort keyed on
            # layer only, so "first" was an arbitrary slice)
            order = np.lexsort((ne[:, 0], ne[:, 1]))
            first = ne[order][0] if len(ne) else None
            per_pos = np.sort(np.unique(ne[:, 1]))
            print(f"{name}: {len(ne)} (layer,pos) slices differ; "
                  f"first (layer={first[0]}, pos={int(first[1])}); "
                  f"positions {per_pos[:10] + 0}...")
            l0, p0 = int(first[0]), int(first[1])
            dv = rows_v[l0, 0, :, p0, :].astype(np.float32)
            dt = rows_t[l0, 0, :, p0, :].astype(np.float32)
            print(f"  max abs diff at first slice: {np.max(np.abs(dv - dt))}")
            print(f"  n elements differing: {int(np.sum(dv != dt))} of {dv.size}")
            # magnitude PROFILE: is the drift ulp-class (split-dependent
            # rounding, amplifying through feedback) or wholesale (wrong
            # rows committed)? Print per-position max |diff| for the first
            # positions and quartiles over the window.
            d_all = np.abs(rows_v.astype(np.float32)
                           - rows_t.astype(np.float32))
            per_pos_max = d_all.max(axis=(0, 1, 2, 4))   # [div]
            head = ", ".join(f"{p}:{per_pos_max[p]:.2e}"
                             for p in range(min(div, 16)))
            print(f"  per-pos max diff [0..16): {head}")
            nz = per_pos_max[per_pos_max > 0]
            if len(nz):
                print(f"  diff>0 positions: {len(nz)}/{div}; "
                      f"p50={np.percentile(nz, 50):.2e} "
                      f"p90={np.percentile(nz, 90):.2e} "
                      f"max={nz.max():.2e} "
                      f"first>1e-2 at pos "
                      f"{int(np.argmax(per_pos_max > 1e-2)) if (per_pos_max > 1e-2).any() else -1}")
    # prompt rows must be identical (same prefill law) — sanity
    pv = np.asarray(jax.device_get(st_v.kv_k))[:, :, :, :plen, :]
    pt = np.asarray(jax.device_get(st_t.kv_k))[:, :, :, :plen, :]
    same = bool(np.all(pv.view(np.uint16) == pt.view(np.uint16)
                       if pv.dtype.itemsize == 2 else pv == pt))
    print(f"prompt-prefix K rows identical: {same}")


if __name__ == "__main__":
    main()
