"""YAML-driven draft training CLI.

TPU-native equivalent of the reference trainer entry
(`deepspeed … trainer_base_ds_mul_fs_tp.py -cp conf/exp -cn <cfg>`,
`longspec/train/README.md:60`): one experiment YAML composes base configs,
instantiates the collator via `_target_`, and drives `train.loop.train`.

Usage:
  python -m longspec_tpu.cli.train configs/exp/draft_sft.yaml \
      [key=value overrides...]

Required YAML keys: target_path (HF dir) or synthetic target settings,
data.pattern + data.collator, training hyperparameters. See
`configs/exp/draft_sft.yaml`.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cfg_path, overrides = argv[0], argv[1:]

    from ..train.expconfig import load_config, instantiate
    from ..train import loop as L
    from ..config import ModelConfig, DraftConfig
    from ..models import llama as M
    from ..models import glide as G

    exp = load_config(cfg_path, overrides)

    if jax.process_count() > 1 or exp.get("distributed"):
        jax.distributed.initialize()

    # ---- model pair ----
    if exp.get("target_path"):
        from ..models.convert import load_hf_checkpoint
        cfg, target_params = load_hf_checkpoint(exp["target_path"],
                                                jnp.bfloat16)
    else:
        cfg = ModelConfig(**exp["model"])
        target_params = M.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if exp.get("target_quant") == "int8":
        # kbit-style frozen-base training (ref train/models/mixin.py:34-120,
        # prepare_model_for_kbit_training): layer kernels live int8 in HBM,
        # dequantized one layer at a time inside the teacher forward
        from ..ops.quantparams import quantize_target_params
        target_params = quantize_target_params(target_params)
    dcfg = DraftConfig(**exp.get("draft", {}))
    if exp.get("draft_path"):
        from ..train.checkpoint import load_draft
        draft_params = load_draft(exp["draft_path"])
    else:
        draft_params = G.init_draft_params(jax.random.PRNGKey(1), cfg,
                                           jnp.bfloat16)

    # ---- data ----
    data_cfg = exp["data"]
    collator = instantiate(data_cfg["collator"])
    from ..data.dataset import MultiMappingDataset, batches
    ds = MultiMappingDataset(data_cfg["pattern"],
                             **instantiate(data_cfg.get("dataset_kwargs", {})))

    dp_rank, dp_size = jax.process_index(), jax.process_count()

    def batch_iter(epoch):
        return batches(ds, collator, data_cfg.get("batch_size", 1),
                       seed=exp.get("seed", 0) + epoch,
                       dp_rank=dp_rank, dp_size=dp_size)

    # ---- optional mesh ----
    mesh = None
    if exp.get("tp_size", 1) > 1 or exp.get("dp_size", 1) > 1:
        from ..parallel import shardings as sh
        mesh = sh.make_mesh(dp=exp.get("dp_size", 1), tp=exp.get("tp_size", 1))

    tr = exp.get("training", {})
    L.train(cfg, dcfg, target_params, draft_params, batch_iter,
            output_dir=exp.get("output_dir", "runs/exp"),
            total_steps=tr.get("total_steps", 1000),
            lr=tr.get("lr", 5e-4),
            warmup_steps=tr.get("warmup_steps", 100),
            weight_decay=tr.get("weight_decay", 0.01),
            save_steps=tr.get("save_steps", 500),
            log_steps=tr.get("log_steps", 20),
            attn_impl=tr.get("attn_impl", "chunked"),
            anchor_offset=tr.get("anchor_offset", True),
            resume=tr.get("resume", True),
            accum_steps=tr.get("accum_steps", 1),
            offset_cap=tr.get("offset_cap", 30000),
            teacher_unroll=tr.get("teacher_unroll", False),
            teacher_pp=tr.get("teacher_pp", 0),
            pp_micro=tr.get("pp_micro", 2),
            lora_rank=tr.get("lora_rank", 0),
            lora_scale=tr.get("lora_scale", 1.0),
            mesh=mesh, seed=exp.get("seed", 0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
