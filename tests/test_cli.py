"""End-to-end CLI tests: YAML-driven draft training (tiny, CPU) and the
inference CLI's argument surface."""
import json
import os

import numpy as np
import pytest


def test_train_cli_end_to_end(tmp_path):
    # toy jsonl corpus
    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    with open(data / "corpus.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": "ab" * (i + 1),
                                "response": "cdef" * (i + 1)}) + "\n")
    cfg = tmp_path / "exp.yaml"
    cfg.write_text(f"""
exp_name: t
output_dir: {tmp_path}/run
model:
  vocab_size: 307
  hidden_size: 64
  intermediate_size: 128
  num_layers: 2
  num_heads: 4
  num_kv_heads: 2
  head_dim: 16
  max_position_embeddings: 2048
draft:
  window: 16
data:
  pattern: {data}/*.jsonl
  batch_size: 2
  collator:
    _target_: longspec_tpu.data.collators.SFTCollator
    encode:
      _target_: tests.test_aux.toy_encode
      _partial_: true
    seq_len: 64
training:
  total_steps: 4
  lr: 1.0e-3
  warmup_steps: 1
  save_steps: 2
  log_steps: 2
  attn_impl: dense
""")
    from longspec_tpu.cli.train import main
    assert main([str(cfg)]) == 0
    run = tmp_path / "run"
    assert (run / "latest").exists()
    assert (run / "checkpoint-last" / "draft_model_weights.npz").exists()
    rows = [json.loads(l) for l in open(run / "train.metrics.jsonl")]
    assert rows and np.isfinite(rows[-1]["train/loss"])

    # resume: restores the saved step and continues to total_steps
    from longspec_tpu.train.checkpoint import CheckpointManager
    meta0 = CheckpointManager(str(run)).restore()[1]
    assert meta0["step"] == 4
    assert main([str(cfg), "training.total_steps=6"]) == 0
    meta1 = CheckpointManager(str(run)).restore()[1]
    assert meta1["step"] == 6


def test_infer_cli_args():
    from longspec_tpu.cli.infer import get_args, TASK_PROMPTS, CONTEXT_LENGTH
    a = get_args(["--target-path", "/x", "--draft-path", "/y",
                  "--data-path", "/z.jsonl", "--task", "gov_report",
                  "--tree-shape", "2", "3", "3"])
    assert a.tree_shape == [2, 3, 3]
    assert a.method == "tree"
    assert "{context}" in TASK_PROMPTS["gov_report"]
    assert CONTEXT_LENGTH["vicuna7b"] == 16384
