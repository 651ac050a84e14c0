"""Serving CLI: load a target+draft checkpoint pair and expose the
continuous-batching speculative server over an OpenAI-compatible HTTP
endpoint.

    python -m longspec_tpu.cli.serve \
        --target-path /ckpts/vicuna-7b-16k --draft-path /ckpts/longspec-draft \
        --n-slots 4 --s-max 16384 --port 8000

Clients then POST /v1/completions (the bundled
`longspec_tpu.data.api_client.CompletionClient` or any OpenAI SDK). The
reference has no serving surface (its CLIs decode one fixed batch,
`longspec/test/inference_long-bench.py:228-247`); this completes the
deployment loop for the TPU stack.
"""
from __future__ import annotations

import argparse

from .infer import load_engine


def get_args(argv=None):
    from .infer import get_args as infer_args
    base = infer_args(["--target-path", "x", "--draft-path", "x",
                       "--data-path", "x"])  # defaults template
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--target-path", required=True)
    p.add_argument("--draft-path", required=True)
    # engine knobs shared with the infer CLI
    for name, d in (("--attn-impl", base.attn_impl), ("--window", base.window),
                    ("--gamma", base.gamma), ("--temperature", base.temperature),
                    ("--draft-ring", base.draft_ring),
                    ("--draft-head", base.draft_head),
                    ("--draft-compute", base.draft_compute),
                    ("--beam-topk", base.beam_topk),
                    ("--kv-quant", base.kv_quant)):
        p.add_argument(name, default=d, type=type(d))
    p.add_argument("--tree-shape", default=base.tree_shape, type=int, nargs="+")
    p.add_argument("--rope-scaling", default=None,
                   help="type:factor, e.g. yarn:4.0")
    p.add_argument("--sp", default=0, type=int)
    # serving knobs
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8000, type=int)
    p.add_argument("--n-slots", default=4, type=int,
                   help="concurrent decode slots (static batch)")
    p.add_argument("--s-max", default=16384, type=int,
                   help="KV rows per slot (prompt + generation budget)")
    p.add_argument("--max-new-cap", default=1024, type=int)
    p.add_argument("--policy", default="fifo",
                   choices=["fifo", "priority", "sjf", "packed"])
    p.add_argument("--default-max-tokens", default=128, type=int)
    p.add_argument("--kv", default="slots", choices=["slots", "paged"],
                   help="paged: target KV in shared page pools — per-request"
                   " footprint is its used pages, not a full s-max slot")
    p.add_argument("--page", default=256, type=int,
                   help="KV rows per page (kv=paged)")
    p.add_argument("--pool-pages", default=0, type=int,
                   help="total physical pages (0 = full slot capacity, i.e."
                   " no overcommit)")
    p.add_argument("--paging", default="reserved",
                   choices=["reserved", "elastic"],
                   help="elastic (kv=paged): reserve prompt-only at "
                   "admission, top up per segment, preempt the youngest "
                   "request by hibernation-swap under pool pressure")
    p.add_argument("--per-row-temperature", action="store_true",
                   help="compile traced per-row temps so each request may "
                   "set its own `temperature` in the HTTP body")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if args.kv == "paged":
        # the engine must be BUILT paged: page tables thread through the
        # jitted rounds as DecodeState.tables
        from ..ops.pallas_paged import PagedAttn
        args.attn_impl = PagedAttn(args.page)
    eng, tokenizer, cfg = load_engine(args)
    from ..serve import SpecServer
    from ..serve.http import HttpFrontend
    srv = SpecServer(eng, n_slots=args.n_slots, s_max=args.s_max,
                     max_new_cap=args.max_new_cap, policy=args.policy,
                     kv=args.kv, pool_pages=args.pool_pages or None,
                     paging=args.paging)
    fe = HttpFrontend(
        srv, host=args.host, port=args.port,
        model_name=args.target_path.rstrip("/").rsplit("/", 1)[-1],
        encode=lambda s: tokenizer(s, add_special_tokens=True)["input_ids"],
        decode=lambda ts: tokenizer.decode(list(ts)),
        chat_template=lambda m: tokenizer.apply_chat_template(
            m, add_generation_prompt=True),
        default_max_tokens=args.default_max_tokens).start()
    print(f"serving {fe.model_name} on http://{args.host}:{fe.port} "
          f"({args.n_slots} slots x {args.s_max} rows, policy={args.policy}, "
          f"kv={args.kv})")
    fe.wait()


if __name__ == "__main__":
    main()
