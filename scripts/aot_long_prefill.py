"""AOT-compile the long-row segmented prefill graph (shape-only inputs) and
print the HBM verdict — an iteration loop for HBM/layout fixes that needs no
chip time and no multi-GB host buffers.

Usage: python scripts/aot_long_prefill.py [--ctx 131072] [--seg 8192]
       [--no-quant-weights] [--gen 128]
"""
import argparse
import dataclasses
import functools
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp

from bench import big_model_config
from longspec_tpu.config import DraftConfig, EngineConfig
from longspec_tpu.models import llama as M
from longspec_tpu.models import glide as G
from longspec_tpu.engine.engine import SpecEngine
from longspec_tpu.ops.quantparams import quantize_target_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=131072)
    ap.add_argument("--seg", type=int, default=8192)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--no-quant-weights", action="store_true")
    ap.add_argument("--attn", type=str, default="pallas")
    args = ap.parse_args()

    cfg = dataclasses.replace(big_model_config(), sliding_window=12288,
                              attn_sinks=4)
    dcfg = DraftConfig(window=512, ca_window=12288, ca_anchors=4,
                       ring_size=1024)
    ecfg = EngineConfig(tree_shape=(4, 16, 16, 16, 16, 16), gamma=4,
                        temperature=0.0, attn_impl=args.attn,
                        kv_quant="int8", prefill_seg=args.seg)

    p_sds = jax.eval_shape(
        lambda: M.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    if not args.no_quant_weights:
        p_sds = jax.eval_shape(quantize_target_params, p_sds)
    d_sds = jax.eval_shape(
        lambda: G.init_draft_params(jax.random.PRNGKey(1), cfg, jnp.bfloat16))

    # tiny real params only to satisfy __init__ (prefill reads shapes from
    # ARGS; self supplies cfg/ecfg only)
    eng = SpecEngine(p_sds, d_sds, cfg, dcfg, ecfg)

    b = 1
    s_max = args.ctx + args.gen + ecfg.tree_size + 16
    state_sds = jax.eval_shape(
        functools.partial(eng.init_state, b, s_max, jnp.bfloat16))
    tok_sds = jax.ShapeDtypeStruct((b, args.ctx), jnp.int32)
    len_sds = jax.ShapeDtypeStruct((b,), jnp.int32)
    rng_sds = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    fn = jax.jit(functools.partial(eng._prefill_segmented_impl, seg=args.seg),
                 donate_argnums=(4,))
    lo = fn.lower(p_sds, d_sds, tok_sds, len_sds, state_sds, rng_sds)
    try:
        lo.compile()
        print("COMPILE OK")
    except Exception as e:
        msg = str(e)
        with open("/tmp/aot_full.log", "w") as f:
            f.write(msg)
        for marker in ("Ran out of memory", "Used "):
            i = msg.find(marker)
            if i >= 0:
                print(msg[i:i + 200].splitlines()[0])
                break
        print("full message: /tmp/aot_full.log")
        sys.exit(1)


if __name__ == "__main__":
    main()
