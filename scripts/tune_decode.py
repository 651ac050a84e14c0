#!/usr/bin/env python
"""Tune the Pallas flash-decode kernel against the XLA chunked path on TPU.

Round-1 finding (ROADMAP): pallas flash_decode was ~9% slower than the XLA
chunked path for b=1 single-token decode at 8k — suspected sequential-grid
overhead (many tiny chunk steps). This sweeps the chunk size for the decode
(t=1) and tree-verify (t=69) shapes at 8k and 32k context and prints a JSON
table, so the engine default can be set from data.

Usage (real TPU): python scripts/tune_decode.py [--iters 50]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

import numpy as np  # noqa: E402


def bench(fn_once, q0, iters):
    """Time `iters` chained on-device invocations inside ONE dispatch (the
    relay's per-dispatch latency would otherwise dominate ms-level ops)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q):
        def body(c, _):
            o, _ = fn_once(c)
            # data dependency on o, magnitude pinned to q0's scale
            return (q0 + o.astype(q0.dtype) * 1e-6), None
        c, _ = jax.lax.scan(body, q, None, length=iters)
        return c
    np.asarray(run(q0)[0, 0, 0, 0])  # compile + settle
    t0 = time.perf_counter()
    np.asarray(run(q0)[0, 0, 0, 0])  # host readback barrier (relay-safe)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from longspec_tpu.ops.pallas_decode import flash_decode
    from longspec_tpu.ops.attention import attend_prefix_chunked

    b, h, hkv, d = args.batch, 32, 8, 128
    rng = np.random.default_rng(0)
    rows = []
    for s in (8192, 32768):
        k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
        ks = k.transpose(0, 2, 1, 3)  # [B, S, Hkv, D] chunked-path layout
        vs = v.transpose(0, 2, 1, 3)
        k_hi = jnp.full((b,), s - 8, jnp.int32)
        for t in (1, 69):
            q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
            q_pos = jnp.broadcast_to(jnp.arange(s - 8, s - 8 + t)[None], (b, t))
            for chunk in (256, 512, 1024, 2048, 4096):
                ms = bench(lambda qq, chunk=chunk: flash_decode(
                    qq, k, v, k_hi, q_pos, None, 0, chunk=chunk),
                    q, args.iters)
                rows.append({"impl": f"pallas_c{chunk}", "s": s, "t": t,
                             "ms": round(ms, 4)})
                print(json.dumps(rows[-1]), flush=True)
            for chunk in (1024, 2048, 4096):
                ms = bench(lambda qq, chunk=chunk: attend_prefix_chunked(
                    qq, ks, vs, k_hi, q_pos, None, 0, chunk=chunk),
                    q, args.iters)
                rows.append({"impl": f"chunked_c{chunk}", "s": s, "t": t,
                             "ms": round(ms, 4)})
                print(json.dumps(rows[-1]), flush=True)
    best = {}
    for r in rows:
        key = (r["s"], r["t"])
        if key not in best or r["ms"] < best[key]["ms"]:
            best[key] = r
    print("BEST:", json.dumps({f"s{k[0]}_t{k[1]}": v for k, v in best.items()}))


if __name__ == "__main__":
    main()
