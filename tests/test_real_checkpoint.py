"""Real-checkpoint end-to-end tests: tiny HF-format checkpoint directories
(config.json + safetensors + tokenizer) written to disk, then driven through
the PUBLIC CLI entry points — the reference's primary deliverable
(`inference_long-bench.py:104-260`: load an HF target + draft dir, run a
task, report mean_accept/tok_s).

Round-1 gap this closes: both CLIs' `load_hf_checkpoint` call sites were
untested (and had a swapped tuple unpack); every real-checkpoint invocation
crashed while the synthetic-model test branch stayed green.
"""
import json
import os

import numpy as np
import pytest


VOCAB = 211


def _write_tokenizer(path: str):
    """Tiny offline word-level tokenizer: ids 2..V-1 are words 't2'..'tN'."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "</s>": 1}
    vocab.update({f"t{i}": i for i in range(2, VOCAB)})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   eos_token="</s>", pad_token="<unk>")
    fast.save_pretrained(path)


def _write_hf_checkpoint(path: str, family: str):
    """Tiny random-weight HF checkpoint dir in the given family's geometry."""
    import torch
    if family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM
        cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          max_position_embeddings=2048, rope_theta=10000.0,
                          # Llama-3.x style LIST eos (regression: first id
                          # becomes the primary, the rest extra stop ids)
                          eos_token_id=[1, 5], pad_token_id=0,
                          tie_word_embeddings=False)
        torch.manual_seed(0)
        model = LlamaForCausalLM(cfg)
    else:
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(vocab_size=VOCAB, hidden_size=64,
                          intermediate_size=128, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          max_position_embeddings=2048, rope_theta=10000.0,
                          eos_token_id=1, pad_token_id=0,
                          tie_word_embeddings=False)
        torch.manual_seed(1)
        model = Qwen2ForCausalLM(cfg)
    model.eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    _write_tokenizer(path)
    return model


def _write_draft(path: str, target_dir: str):
    import jax
    from longspec_tpu.models.convert import load_hf_checkpoint
    from longspec_tpu.models.glide import init_draft_params
    from longspec_tpu.train.checkpoint import export_draft
    cfg, _ = load_hf_checkpoint(target_dir)
    dparams = init_draft_params(jax.random.PRNGKey(7), cfg)
    export_draft(path, dparams, config_dict={"window": 16})
    return cfg


@pytest.fixture(scope="module")
def llama_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("llama_hf")
    target = str(d / "target")
    draft = str(d / "draft")
    _write_hf_checkpoint(target, "llama")
    cfg = _write_draft(draft, target)
    return target, draft, cfg


def test_infer_cli_tree_end_to_end(llama_ckpt, tmp_path, capsys):
    """`cli.infer.main` from an on-disk HF checkpoint through tree decode:
    loads tokenizer/target/draft, runs warm-up + generation, writes the
    per-prompt jsonl and prints harness metrics."""
    target, draft, cfg = llama_ckpt
    assert cfg.eos_token_id == 1  # list eos: first id is primary
    assert cfg.extra_eos_token_ids == (5,)  # rest stop generation too
    data = tmp_path / "aime.jsonl"
    words = " ".join(f"t{2 + (i * 7) % (VOCAB - 2)}" for i in range(40))
    with open(data, "w") as f:
        f.write(json.dumps({"problem": words}) + "\n")

    from longspec_tpu.cli.infer import main
    rc = main(["--target-path", target, "--draft-path", draft,
               "--task", "aime", "--data-path", str(data),
               "--method", "tree", "--tree-shape", "2", "3", "3",
               "--max-gen-len", "12", "--window", "16",
               "--attn-impl", "dense",
               "--out-dir", str(tmp_path / "out")])
    assert rc == 0
    rows = [json.loads(l) for l in
            open(tmp_path / "out" / "aime_tree.jsonl")]
    assert len(rows) == 1 and rows[0]["num"] >= 1
    assert isinstance(rows[0]["output"], str)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["task"] == "aime" and summary["mean_accept"] >= 1.0
    assert summary["tok_s"] > 0


def test_infer_cli_length_filter(llama_ckpt, tmp_path, capsys):
    """Non-aime tasks keep the reference's 1200 < len <= budget filter
    (`inference_long-bench.py:117-128`): a short context is rejected."""
    target, draft, _ = llama_ckpt
    data = tmp_path / "gov.jsonl"
    with open(data, "w") as f:
        f.write(json.dumps({"context": "t2 t3 t4", "input": ""}) + "\n")
    from longspec_tpu.cli.infer import main
    rc = main(["--target-path", target, "--draft-path", draft,
               "--task", "gov_report", "--data-path", str(data),
               "--method", "tree", "--max-gen-len", "4",
               "--out-dir", str(tmp_path / "out2")])
    assert rc == 1  # no prompts pass the filter


def test_qwen2_checkpoint_loads_and_decodes(tmp_path):
    """Qwen2-geometry HF dir (attention bias) through load_engine + one tree
    generation; prefill logits cross-checked against the HF torch model."""
    import torch
    import jax.numpy as jnp
    target = str(tmp_path / "target")
    draft = str(tmp_path / "draft")
    hf = _write_hf_checkpoint(target, "qwen2")
    _write_draft(draft, target)

    from longspec_tpu.cli.infer import get_args, load_engine
    args = get_args(["--target-path", target, "--draft-path", draft,
                     "--task", "aime", "--data-path", "/dev/null",
                     "--tree-shape", "2", "3", "--window", "16",
                     "--attn-impl", "dense"])
    eng, tokenizer, cfg = load_engine(args)
    assert cfg.attention_bias  # qwen2 family

    rng = np.random.default_rng(0)
    toks = rng.integers(2, VOCAB, (1, 10)).astype(np.int32)
    # prefill logits parity vs HF torch (bf16 load tolerance)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(toks)).logits[0, -1].numpy()
    from longspec_tpu.models import llama as M
    kv_k, kv_v = M.alloc_kv_cache(cfg, 1, 16, jnp.float32)
    h, _, _ = M.forward_prefill(eng.params, cfg, jnp.asarray(toks),
                                jnp.asarray([10]), kv_k, kv_v,
                                attn_impl="dense")
    mine = np.asarray(M.logits_at(eng.params, h[0, 9]), np.float32)
    assert np.argmax(mine) == np.argmax(hf_logits)
    corr = np.corrcoef(mine, hf_logits)[0, 1]
    assert corr > 0.98, corr

    out = eng.tree_spec_generate(toks, np.array([10], np.int32),
                                 max_gen_len=8)
    ids = out["output_ids"]
    assert ((ids >= 0) & (ids < VOCAB)).all()


def test_train_cli_hf_target(llama_ckpt, tmp_path):
    """`cli.train.main` with an HF `target_path` (the branch with the
    round-1 swapped unpack) runs steps and exports the draft."""
    target, _, _ = llama_ckpt
    data = tmp_path / "data"
    data.mkdir()
    with open(data / "corpus.jsonl", "w") as f:
        for i in range(4):
            f.write(json.dumps({"prompt": "ab" * (i + 1),
                                "response": "cdef" * (i + 1)}) + "\n")
    cfg = tmp_path / "exp.yaml"
    cfg.write_text(f"""
exp_name: hf_t
output_dir: {tmp_path}/run
target_path: {target}
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
    seq_len: 48
training:
  total_steps: 2
  lr: 1.0e-3
  warmup_steps: 1
  save_steps: 2
  log_steps: 1
  attn_impl: dense
""")
    from longspec_tpu.cli.train import main
    assert main([str(cfg)]) == 0
    run = tmp_path / "run"
    assert (run / "checkpoint-last" / "draft_model_weights.npz").exists()
    rows = [json.loads(l) for l in open(run / "train.metrics.jsonl")]
    assert rows and np.isfinite(rows[-1]["train/loss"])


def test_infer_cli_sp_ring_end_to_end(llama_ckpt, tmp_path, capsys):
    """CLI with --sp 8 (sequence-sharded KV over the virtual mesh) and
    --draft-ring (constant-memory draft cache): loads, decodes, reports —
    no ambient mesh context required."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    target, draft, _ = llama_ckpt
    data = tmp_path / "aime_sp.jsonl"
    words = " ".join(f"t{2 + (i * 5) % (VOCAB - 2)}" for i in range(48))
    with open(data, "w") as f:
        f.write(json.dumps({"problem": words}) + "\n")
    from longspec_tpu.cli.infer import main
    rc = main(["--target-path", target, "--draft-path", draft,
               "--task", "aime", "--data-path", str(data),
               "--method", "tree", "--tree-shape", "2", "3", "3",
               "--max-gen-len", "10", "--window", "16",
               "--sp", "8", "--draft-ring", "48",
               "--out-dir", str(tmp_path / "out_sp")])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mean_accept"] >= 1.0 and summary["tok_s"] > 0


def test_infer_cli_target_ring_end_to_end(llama_ckpt, tmp_path, capsys):
    """CLI long-context surface: --decode-window + --prefill-seg +
    --kv-ring (O(window) TARGET cache) on a real HF-format checkpoint —
    the flag combination the 262k-class deployment uses."""
    target, draft, _ = llama_ckpt
    data = tmp_path / "aime_ring.jsonl"
    words = " ".join(f"t{2 + (i * 5) % (VOCAB - 2)}" for i in range(60))
    with open(data, "w") as f:
        f.write(json.dumps({"problem": words}) + "\n")
    from longspec_tpu.cli.infer import main
    rc = main(["--target-path", target, "--draft-path", draft,
               "--task", "aime", "--data-path", str(data),
               "--method", "tree", "--tree-shape", "2", "3", "3",
               "--max-gen-len", "10", "--window", "8",
               "--decode-window", "24", "--prefill-seg", "16",
               "--kv-ring", "80",
               "--out-dir", str(tmp_path / "out_ring")])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mean_accept"] >= 1.0 and summary["tok_s"] > 0


def test_sharded_safetensors_checkpoint_loads(tmp_path):
    """Realistic released checkpoints ship MULTIPLE safetensors shards plus
    a model.safetensors.index.json — the loader must reassemble them into
    the same params a single-file save produces (verdict r4 item 8)."""
    import torch
    import jax.numpy as jnp
    from longspec_tpu.models.convert import load_hf_checkpoint

    one = str(tmp_path / "one")
    sharded = str(tmp_path / "sharded")
    model = _write_hf_checkpoint(one, "llama")
    model.save_pretrained(sharded, safe_serialization=True,
                          max_shard_size="50KB")
    _write_tokenizer(sharded)
    import os as _os
    shards = [f for f in _os.listdir(sharded) if f.endswith(".safetensors")]
    assert len(shards) > 1, shards
    assert "model.safetensors.index.json" in _os.listdir(sharded)

    cfg1, p1 = load_hf_checkpoint(one, jnp.float32)
    cfg2, p2 = load_hf_checkpoint(sharded, jnp.float32)
    assert cfg1 == cfg2
    import jax
    leaves1 = jax.tree_util.tree_leaves_with_path(p1)
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    for path, v in leaves1:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(leaves2[path]), str(path))


def test_tied_embeddings_checkpoint_logits_match_hf(tmp_path):
    """tie_word_embeddings=True checkpoints (Qwen2.5 small, Llama-3.2-1B)
    store no lm_head tensor — the loader must share the embedding and the
    forward must produce HF's logits."""
    import torch
    import jax
    import jax.numpy as jnp
    from transformers import LlamaConfig, LlamaForCausalLM
    from longspec_tpu.models.convert import load_hf_checkpoint
    from longspec_tpu.models import llama as M

    d = str(tmp_path / "tied")
    cfg_hf = LlamaConfig(vocab_size=VOCAB, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=2048,
                         eos_token_id=1, pad_token_id=0,
                         tie_word_embeddings=True)
    torch.manual_seed(3)
    model = LlamaForCausalLM(cfg_hf).eval().to(torch.float32)
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer(d)

    cfg, params = load_hf_checkpoint(d, jnp.float32)
    assert cfg.tie_word_embeddings and "lm_head" not in params
    rng = np.random.default_rng(5)
    toks = rng.integers(2, VOCAB, (1, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(toks)).logits.numpy()
    kv_k, kv_v = M.alloc_kv_cache(cfg, 1, 32, jnp.float32)
    h, _, _ = M.forward_prefill(params, cfg, jnp.asarray(toks),
                                jnp.full((1,), 24, jnp.int32), kv_k, kv_v)
    logits = M.logits_at(params, h)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=3e-4, rtol=2e-3)


def test_presplit_tp_checkpoint_merges(tmp_path):
    """The reference's pre-split per-rank TP format (`mp_{r}-of-{w}` dirs,
    `train/models/mixin.py:123-145`): column-parallel tensors split on the
    output dim, row-parallel on the input dim, the rest replicated. The
    loader must reassemble the full model bit-exactly."""
    import json as _json
    import os as _os
    import shutil
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file, load_file
    from longspec_tpu.models.convert import load_hf_checkpoint

    one = str(tmp_path / "one")
    _write_hf_checkpoint(one, "llama")
    sd = load_file(_os.path.join(one, "model.safetensors"))

    split = str(tmp_path / "presplit")
    w = 2
    dim0 = ("q_proj.weight", "k_proj.weight", "v_proj.weight",
            "gate_proj.weight", "up_proj.weight", "lm_head.weight",
            "embed_tokens.weight")
    dim1 = ("o_proj.weight", "down_proj.weight")
    for r in range(w):
        d = _os.path.join(split, f"mp_{r}-of-{w}")
        _os.makedirs(d)
        shard = {}
        for k, v in sd.items():
            # ascontiguousarray: save_file writes the base buffer of a
            # strided view verbatim (silent corruption otherwise)
            if k.endswith(dim0):
                shard[k] = np.ascontiguousarray(
                    np.array_split(v, w, axis=0)[r])
            elif k.endswith(dim1):
                shard[k] = np.ascontiguousarray(
                    np.array_split(v, w, axis=1)[r])
            else:
                shard[k] = v
        save_file(shard, _os.path.join(d, "model.safetensors"))
        shutil.copy(_os.path.join(one, "config.json"),
                    _os.path.join(d, "config.json"))

    cfg1, p1 = load_hf_checkpoint(one, jnp.float32)
    cfg2, p2 = load_hf_checkpoint(split, jnp.float32)
    assert cfg1 == cfg2
    leaves1 = jax.tree_util.tree_leaves_with_path(p1)
    leaves2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    for path, v in leaves1:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(leaves2[path]), str(path))


def test_presplit_checkpoint_rejects_incomplete(tmp_path):
    import os as _os
    import pytest as _pytest
    from longspec_tpu.models.convert import presplit_rank_dirs
    p = str(tmp_path / "bad")
    _os.makedirs(_os.path.join(p, "mp_0-of-2"))
    with _pytest.raises(ValueError, match="incomplete"):
        presplit_rank_dirs(p)
