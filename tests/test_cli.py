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


def test_train_cli_stage2_long_recipe(tmp_path):
    """Stage-2 long-data recipe shape (configs/exp/draft_long.yaml at tiny
    scale): LongDataCollator (labels = inputs, no prompt masking — ref
    LongDataNoMaskSFTCollator), anchor_offset off, teacher_unroll on,
    gradient accumulation, draft initialized from a stage-1 export."""
    data = tmp_path / "long"
    data.mkdir()
    with open(data / "docs.jsonl", "w") as f:
        for i in range(6):
            f.write(json.dumps({"text": "abcdef" * (20 + i)}) + "\n")
    # a "stage-1" draft export to chain from
    import jax
    from longspec_tpu.config import tiny_test
    from longspec_tpu.models import glide as G
    from longspec_tpu.train.checkpoint import export_draft, load_draft
    cfg0 = tiny_test(vocab_size=307, num_layers=2)
    d0 = G.init_draft_params(jax.random.PRNGKey(9), cfg0)
    stage1 = tmp_path / "stage1"
    export_draft(str(stage1 / "checkpoint-last"), d0)
    cfg = tmp_path / "exp2.yaml"
    cfg.write_text(f"""
exp_name: t2
output_dir: {tmp_path}/run2
draft_path: {stage1}/checkpoint-last
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
    _target_: longspec_tpu.data.collators.LongDataCollator
    encode:
      _target_: tests.test_aux.toy_encode
      _partial_: true
    seq_len: 96
training:
  total_steps: 4
  lr: 5.0e-6
  warmup_steps: 1
  save_steps: 2
  log_steps: 2
  attn_impl: dense
  anchor_offset: false
  teacher_unroll: true
  accum_steps: 2
""")
    from longspec_tpu.cli.train import main
    assert main([str(cfg)]) == 0
    run = tmp_path / "run2"
    out = run / "checkpoint-last" / "draft_model_weights.npz"
    assert out.exists()
    # training moved the stage-1 init (loss was finite and steps applied)
    d1 = load_draft(str(out))
    moved = jax.tree_util.tree_reduce(
        lambda a, x: a or bool(np.any(x[0] != x[1])),
        jax.tree_util.tree_map(lambda a, b: (np.asarray(a, np.float32),
                                             np.asarray(b, np.float32)),
                               d0, d1), False)
    assert moved
    rows = [json.loads(l) for l in open(run / "train.metrics.jsonl")]
    assert rows and np.isfinite(rows[-1]["train/loss"])


def test_train_cli_stage3_longcot_recipe(tmp_path):
    """Stage-3 LongCoT recipe shape (configs/exp/draft_longcot.yaml at tiny
    scale): ChatML prompt-masked {problem, qwq} rows through LongCoTCollator
    (ref LongCoTDataSFTCollator)."""
    data = tmp_path / "longcot"
    data.mkdir()
    with open(data / "cot.jsonl", "w") as f:
        for i in range(6):
            f.write(json.dumps({"problem": "ab" * (i + 2),
                                "qwq": "cdefcd" * (10 + i)}) + "\n")
    cfg = tmp_path / "exp3.yaml"
    cfg.write_text(f"""
exp_name: t3
output_dir: {tmp_path}/run3
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
    _target_: longspec_tpu.data.collators.LongCoTCollator
    encode:
      _target_: tests.test_aux.toy_encode
      _partial_: true
    seq_len: 96
training:
  total_steps: 3
  lr: 5.0e-6
  warmup_steps: 1
  save_steps: 3
  log_steps: 1
  attn_impl: dense
  anchor_offset: false
  teacher_unroll: true
""")
    from longspec_tpu.cli.train import main
    assert main([str(cfg)]) == 0
    run = tmp_path / "run3"
    assert (run / "checkpoint-last" / "draft_model_weights.npz").exists()
    rows = [json.loads(l) for l in open(run / "train.metrics.jsonl")]
    assert rows and np.isfinite(rows[-1]["train/loss"])
