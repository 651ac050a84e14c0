"""LongBench / LongCoT inference benchmark CLI.

TPU-native equivalent of the reference entry points
(`longspec/test/inference_long-bench.py`, `inference_qwq.py`): load a
target+draft checkpoint pair, build per-task prompts, filter to the model's
context budget, run one of {vanilla, seq, tree, magicdec}, and report the
harness metrics mean_accept = (counts+nums)/nums and tok/s =
(counts+nums)/time (`inference_long-bench.py:257-260`).

Offline-first: checkpoints and task data are local paths (a zero-egress TPU
pod cannot reach HF hub); `--data-path` takes a jsonl with LongBench-style
records {context, input, ...}.

Usage:
  python -m longspec_tpu.cli.infer --target-path /ckpt/target \
      --draft-path /ckpt/draft --task gov_report --data-path gov_report.jsonl \
      --method tree --tree-shape 4 16 16 16 16 --max-gen-len 1024
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Per-task prompt templates with the same fields/roles as the reference's
# dataset2prompt (`inference_long-bench.py:8-39`).
TASK_PROMPTS = {
    "gov_report": ("<s>system\nYou are a helpful assistant</s>\n<s>user\n"
                   "You are given a report by a government agency. Write a "
                   "one-page summary of the report.\n\nReport:\n{context}\n\n"
                   "Now, write a one-page summary of the report.</s>\n"
                   "<s>assistant\nSummary:"),
    "qmsum": ("<s>system\nYou are a helpful assistant</s>\n<s>user\nYou are "
              "given a meeting transcript and a query containing a question "
              "or instruction. Answer the query in one or more sentences.\n\n"
              "Transcript:\n{context}\n\nNow, answer the query based on the "
              "above meeting transcript in one or more sentences.\n\n"
              "Query: {input}</s>\n<s>assistant\nAnswer:"),
    "multi_news": ("<s>system\nYou are a helpful assistant</s>\n<s>user\nYou "
                   "are given several news passages. Write a one-page summary "
                   "of all news. \n\nNews:\n{context}\n\nNow, write a "
                   "one-page summary of all the news.</s>\n"
                   "<s>assistant\nSummary:"),
    "lcc": ("<s>system\nYou are a helpful assistant</s>\n<s>user\nPlease "
            "complete the code given below. \n{context}Now, complete the "
            "code given.</s>\n<s>assistant\n"),
    "repobench-p": ("<s>system\nYou are a helpful assistant</s>\n<s>user\n"
                    "Please complete the code given below. \n{context}Now, "
                    "complete the code given.</s>\n<s>assistant\n"),
    # QwQ long chain-of-thought (ref inference_qwq.py:58-59, ChatML)
    "aime": ("<|im_start|>user\n{problem}<|im_end|>\n"
             "<|im_start|>assistant\n"),
}

# Context budgets per model preset (ref `inference_long-bench.py:95-102`,
# minus the same 2000-token generation margin).
CONTEXT_LENGTH = {
    "longchat7b": 32768, "longchat13b": 16384, "vicuna7b": 16384,
    "vicuna13b": 16384, "llama8b": 262000, "qwq32b": 32768,
}


def get_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", default="vicuna7b",
                   choices=sorted(CONTEXT_LENGTH))
    p.add_argument("--target-path", required=True,
                   help="local HF checkpoint dir (safetensors) for the target")
    p.add_argument("--draft-path", required=True,
                   help="draft weights (.npz export or HF dir)")
    p.add_argument("--method", default="tree",
                   choices=["vanilla", "seq", "tree", "magicdec"])
    p.add_argument("--task", default="lcc", choices=sorted(TASK_PROMPTS))
    p.add_argument("--data-path", required=True, help="task jsonl")
    p.add_argument("--test-length", default=1, type=int,
                   help="number of prompts to run")
    p.add_argument("--max-gen-len", default=1024, type=int)
    p.add_argument("--temperature", default=0.0, type=float)
    p.add_argument("--gamma", default=4, type=int)
    p.add_argument("--tree-shape", nargs="+", type=int,
                   default=[4, 16, 16, 16, 16])
    p.add_argument("--window", default=512, type=int)
    p.add_argument("--rope-scaling", default=None,
                   help="override rope scaling for context extension, "
                        "'type:factor' (e.g. linear:4, yarn:4, dynamic:2)")
    p.add_argument("--attn-impl", default="chunked",
                   choices=["dense", "chunked", "pallas", "sp"])
    p.add_argument("--sp", default=0, type=int,
                   help="sequence-parallel degree: shard the KV cache over "
                        "this many devices (forces --attn-impl sp)")
    p.add_argument("--draft-ring", default=0, type=int,
                   help="draft KV ring-buffer rows (0 = full-length buffer); "
                        "O(window) draft memory at any context")
    p.add_argument("--draft-head", default="int8",
                   choices=["bf16", "int8", "int4"],
                   help="draft beam-scoring head precision (proposals only; "
                        "verification stays full precision)")
    p.add_argument("--draft-compute", default="int8",
                   choices=["bf16", "int8", "int4"],
                   help="draft-layer matmul precision at decode time")
    p.add_argument("--beam-topk", default="exact", choices=["exact", "approx"])
    p.add_argument("--kv-quant", default="none", choices=["none", "int8"],
                   help="target KV cache storage (ops/quantkv.py): int8 "
                        "halves decode HBM reads and doubles context per "
                        "chip; spec output stays token-exact vs vanilla on "
                        "the same cache")
    p.add_argument("--target-quant", default="none",
                   choices=["none", "int8"],
                   help="target WEIGHT storage (ops/quantparams.py): int8 "
                        "layer kernels halve the weight HBM read that "
                        "dominates vanilla decode (W8A16). A quantized "
                        "target is a (slightly) different model function; "
                        "spec-vs-vanilla exactness holds on the same "
                        "quantized weights")
    p.add_argument("--batch", default=1, type=int)
    p.add_argument("--decode-window", default=0, type=int,
                   help="decode-time sliding window over the target cache "
                        "(+4 sink rows, StreamingLLM-style); 0 = the "
                        "checkpoint's own attention")
    p.add_argument("--prefill-seg", default=0, type=int,
                   help="segmented prompt prefill: O(seg) activation "
                        "memory at any context (needed for 131k+ prompts "
                        "on one chip; required with --kv-ring)")
    p.add_argument("--kv-ring", default=0, type=int,
                   help="O(window) TARGET KV ring cache rows "
                        "(ops/ring_cache.py): with --decode-window, a "
                        "262k-token decode fits one 16GB chip. Needs "
                        "--prefill-seg")
    p.add_argument("--out-dir", default="longbench_results")
    return p.parse_args(argv)


def load_engine(args):
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from ..config import DraftConfig, EngineConfig
    from ..models.convert import load_hf_checkpoint
    from ..models.glide import init_draft_params
    from ..train.checkpoint import load_draft
    from ..engine.engine import SpecEngine

    tokenizer = AutoTokenizer.from_pretrained(args.target_path)
    cfg, params = load_hf_checkpoint(args.target_path, jnp.bfloat16)
    if getattr(args, "target_quant", "none") == "int8":
        from ..ops.quantparams import quantize_target_params
        params = quantize_target_params(params)
    if args.rope_scaling:
        import dataclasses
        from ..config import RopeScaling
        rtype, _, fac = args.rope_scaling.partition(":")
        cfg = dataclasses.replace(
            cfg, rope_scaling=RopeScaling(
                rope_type=rtype, factor=float(fac or 1.0),
                original_max_position_embeddings=cfg.max_position_embeddings),
            max_position_embeddings=int(cfg.max_position_embeddings
                                        * float(fac or 1.0)))
    if os.path.isdir(args.draft_path) and not os.path.exists(
            os.path.join(args.draft_path, "draft_model_weights.npz")):
        from ..models.convert import load_safetensors_dir, \
            draft_params_from_hf_state_dict
        sd = load_safetensors_dir(args.draft_path)
        dparams = draft_params_from_hf_state_dict(sd, cfg, jnp.bfloat16)
    else:
        dparams = load_draft(args.draft_path)
    if getattr(args, "decode_window", 0):
        import dataclasses
        cfg = dataclasses.replace(cfg, sliding_window=args.decode_window,
                                  attn_sinks=4)
    attn_impl = "sp" if args.sp else args.attn_impl
    ecfg = EngineConfig(tree_shape=tuple(args.tree_shape), gamma=args.gamma,
                        temperature=args.temperature,
                        attn_impl=attn_impl, draft_head=args.draft_head,
                        draft_compute=args.draft_compute,
                        beam_topk=args.beam_topk,
                        kv_quant=getattr(args, "kv_quant", "none"),
                        prefill_seg=getattr(args, "prefill_seg", 0) or None,
                        kv_ring=getattr(args, "kv_ring", 0) or None,
                        per_row_temperature=getattr(
                            args, "per_row_temperature", False))
    dcfg = DraftConfig(window=args.window,
                       ring_size=args.draft_ring or None)
    if getattr(args, "decode_window", 0):
        import dataclasses
        dcfg = dataclasses.replace(dcfg, ca_window=args.decode_window,
                                   ca_anchors=4)
    mesh = None
    if attn_impl == "sp":
        from ..parallel import shardings as sh
        import jax
        n = args.sp or len(jax.devices())
        mesh = sh.make_mesh(dp=1, sp=n, tp=1)
    eng = SpecEngine(params, dparams, cfg, dcfg, ecfg, mesh=mesh)
    return eng, tokenizer, cfg


def main(argv=None):
    args = get_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    eng, tokenizer, cfg = load_engine(args)
    ctx_budget = CONTEXT_LENGTH[args.model_name] - 2000

    prompt_fmt = TASK_PROMPTS[args.task]
    records = [json.loads(l) for l in open(args.data_path) if l.strip()]
    prompts = []
    for r in records:
        text = prompt_fmt.format(**{k: r.get(k, "") for k in
                                    ("context", "input", "problem")})
        ids = tokenizer(text, return_tensors="np").input_ids[0]
        # same filter as the reference: 1200 < len <= budget
        # (`inference_long-bench.py:117-128`)
        if args.task == "aime" or 1200 < len(ids) <= ctx_budget:
            prompts.append(ids[:ctx_budget])
        if len(prompts) >= args.test_length:
            break
    if not prompts:
        print("no prompts pass the length filter", file=sys.stderr)
        return 1

    fn = {"vanilla": eng.vanilla_generate, "seq": eng.spec_generate,
          "tree": eng.tree_spec_generate,
          "magicdec": eng.magicdec_generate}[args.method]

    counts = nums = 0
    elapsed = 0.0
    out_path = os.path.join(args.out_dir, f"{args.task}_{args.method}.jsonl")
    with open(out_path, "w") as f:
        for i, ids in enumerate(prompts):
            batch = np.asarray(ids, np.int32)[None].repeat(args.batch, 0)
            lens = np.full((args.batch,), len(ids), np.int32)
            if i == 0 and args.method == "tree":
                # warm-up compile round (ref `inference_long-bench.py:228-241`)
                fn(batch, lens, max_gen_len=2)
            r = fn(batch, lens, max_gen_len=args.max_gen_len)
            counts += r["count"]
            nums += r["num"]
            elapsed += r["elapsed"]
            stop_ids = {cfg.eos_token_id, *cfg.extra_eos_token_ids}
            text = tokenizer.decode([t for t in r["output_ids"][0]
                                     if t not in stop_ids])
            f.write(json.dumps({"i": i, "output": text,
                                "count": int(r["count"]),
                                "num": int(r["num"]),
                                "elapsed": r["elapsed"]}) + "\n")
            print(f"[{i}] accept={(r['count']+r['num'])/max(r['num'],1):.2f} "
                  f"tok/s={(r['count']+r['num'])/max(r['elapsed'],1e-9):.1f}")

    mean_accept = (counts + nums) / max(nums, 1)
    tok_s = (counts + nums) / max(elapsed, 1e-9)
    print(json.dumps({"task": args.task, "method": args.method,
                      "mean_accept": round(mean_accept, 4),
                      "tok_s": round(tok_s, 2), "prompts": len(prompts)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
