"""Unit tests for the auxiliary subsystems: data pipeline, checkpointing,
observability, experiment config, evaluator."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def toy_encode(text):
    return [ord(c) % 250 + 3 for c in text]


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

def test_sft_collator_masks_prompt():
    from longspec_tpu.data import SFTCollator
    from longspec_tpu.data.collators import IGNORE_INDEX
    c = SFTCollator(toy_encode, seq_len=32, pad_id=0, eos_id=2)
    b = c([{"prompt": "abc", "response": "de"},
           {"prompt": "x", "response": "yzw"}])
    assert b["input_ids"].shape == (2, 32)
    # prompt region ignored, response + eos labeled
    assert (b["labels"][0, :3] == IGNORE_INDEX).all()
    assert b["labels"][0, 3] == b["input_ids"][0, 3]
    assert b["input_ids"][0, 5] == 2  # eos appended
    assert b["lengths"].tolist() == [6, 5]


def test_longdata_collator_no_mask():
    from longspec_tpu.data import LongDataCollator
    c = LongDataCollator(toy_encode, seq_len=16, pad_id=0)
    b = c([{"text": "hello"}])
    assert (b["labels"][0, :5] == b["input_ids"][0, :5]).all()


def test_sharegpt_collator_masks_user_turns():
    from longspec_tpu.data import ShareGPTCollator
    from longspec_tpu.data.collators import IGNORE_INDEX
    c = ShareGPTCollator(toy_encode, seq_len=256, pad_id=0)
    conv = [{"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
            {"role": "user", "content": "more?"},
            {"role": "assistant", "content": "sure"}]
    b = c([{"conversations": conv}])
    ids, lab = b["input_ids"][0], b["labels"][0]
    L = int(b["lengths"][0])
    assert L > 0
    # labeled positions mirror input ids exactly
    m = lab != IGNORE_INDEX
    assert m.any()
    assert (lab[m] == ids[m]).all()
    # the system prompt + first user turn are fully masked
    n_sys = len(toy_encode(c.system_prompt))
    n_u1 = len(toy_encode(c.user_template.format(content="hi")))
    assert (lab[:n_sys + n_u1] == IGNORE_INDEX).all()
    # the first assistant turn is fully labeled
    n_a1 = len(toy_encode(c.assistant_template.format(content="yo")))
    assert (lab[n_sys + n_u1:n_sys + n_u1 + n_a1] != IGNORE_INDEX).all()
    # exactly the two assistant turns carry labels
    n_a2 = len(toy_encode(c.assistant_template.format(content="sure")))
    assert int(m.sum()) == n_a1 + n_a2
    with pytest.raises(ValueError):
        c([{"conversations": [{"role": "tool", "content": "x"}]}])


def test_sharegpt_collator_truncates_at_seq_len():
    from longspec_tpu.data import ShareGPTCollator
    c = ShareGPTCollator(toy_encode, seq_len=40, pad_id=0)
    conv = [{"role": "user", "content": "u" * 30},
            {"role": "assistant", "content": "a" * 30}]
    b = c([{"conversations": conv}])
    assert int(b["lengths"][0]) == 40
    assert b["input_ids"].shape == (1, 40)


def test_dpo_collator_pairs_and_masking():
    from longspec_tpu.data import DPOCollator
    from longspec_tpu.data.collators import IGNORE_INDEX
    c = DPOCollator(toy_encode, seq_len=32, pad_id=0, eos_id=2)
    b = c([{"prompt": "pq", "chosen": "good", "reject": "bad"},
           {"prompt": "rr", "chosen": "yes", "reject": "no",
            "reject_prompt": "ssss"}])
    # [2B, S]: rows 0-1 chosen, rows 2-3 rejected
    assert b["input_ids"].shape == (4, 32)
    # prompt region masked on every row
    assert (b["labels"][0, :2] == IGNORE_INDEX).all()
    assert (b["labels"][2, :2] == IGNORE_INDEX).all()
    # per-side prompt override: reject row of example 2 uses reject_prompt
    assert int(b["lengths"][3]) == len(toy_encode("ssss")) + len(toy_encode("no")) + 1
    # completion + eos labeled
    assert b["labels"][0, 2] == b["input_ids"][0, 2]
    assert b["input_ids"][0, 2 + 4] == 2


def test_dpo_collator_never_all_masked():
    from longspec_tpu.data import DPOCollator
    from longspec_tpu.data.collators import IGNORE_INDEX
    # completion empty + no eos: the prompt fills the row; the guard must
    # keep >= 1 labeled token (the reference's NaN-loss FIXME class)
    c = DPOCollator(toy_encode, seq_len=8, pad_id=0)
    b = c([{"prompt": "p" * 12, "chosen": "", "reject": ""}])
    for i in range(2):
        assert (b["labels"][i] != IGNORE_INDEX).any()


def test_pack_documents():
    from longspec_tpu.data import pack_documents
    docs = [[5, 6, 7], [8, 9]]
    buf = pack_documents(docs, seq_len=4, pad_id=0, eos_id=2)
    assert buf.shape == (2, 4)
    assert buf[0].tolist() == [5, 6, 7, 2]
    assert buf[1].tolist() == [8, 9, 2, 0]


def test_mapping_dataset_and_batches(tmp_path):
    from longspec_tpu.data import MappingDataset, MultiMappingDataset, \
        add_id_aligner, SFTCollator
    from longspec_tpu.data.dataset import batches
    p1 = tmp_path / "a.jsonl"
    p1.write_text("\n".join(json.dumps({"q": f"q{i}", "a": f"a{i}"})
                            for i in range(6)))
    ds = MappingDataset(str(p1), aligners=[add_id_aligner],
                        template="Q: {q}\nA:", template_key="prompt",
                        kv_mapping={"prompt": "prompt", "a": "response",
                                    "id": "id"})
    assert len(ds) == 6 and ds[0]["prompt"].startswith("Q: q0")
    mds = MultiMappingDataset(str(tmp_path / "*.jsonl"),
                              template="Q: {q}\nA:", template_key="prompt",
                              kv_mapping={"prompt": "prompt", "a": "response"})
    assert len(mds) == 6
    coll = SFTCollator(toy_encode, seq_len=24)
    got = list(batches(mds, coll, batch_size=2, seed=1))
    assert len(got) == 3 and got[0]["input_ids"].shape == (2, 24)
    # dp sharding splits batches across ranks disjointly
    r0 = list(batches(mds, coll, 2, seed=1, dp_rank=0, dp_size=2))
    r1 = list(batches(mds, coll, 2, seed=1, dp_rank=1, dp_size=2))
    assert len(r0) + len(r1) == 3


# ---------------------------------------------------------------------------
# checkpoint
# ---------------------------------------------------------------------------

def test_checkpoint_rotation_and_resume(tmp_path):
    from longspec_tpu.train.checkpoint import CheckpointManager, load_draft
    cm = CheckpointManager(str(tmp_path))
    state = {"w": jnp.arange(4, dtype=jnp.bfloat16),
             "opt": {"m": jnp.ones((2,), jnp.float32)}}
    d1 = cm.save(state, step=1, draft_params={"w": jnp.ones((2,))})
    state2 = {"w": jnp.arange(4, dtype=jnp.bfloat16) * 2,
              "opt": {"m": jnp.ones((2,), jnp.float32) * 2}}
    d2 = cm.save(state2, step=2, draft_params={"w": jnp.ones((2,)) * 2})
    assert d1 != d2  # rotated tags
    got, meta = cm.restore()
    assert meta["step"] == 2
    np.testing.assert_array_equal(np.asarray(got["w"], np.float32),
                                  np.asarray(state2["w"], np.float32))
    assert got["w"].dtype == jnp.bfloat16
    # draft-only deploy artifact
    dp = load_draft(d2)
    np.testing.assert_allclose(np.asarray(dp["w"]), 2.0)
    # corrupt the latest -> falls back to the other tag
    os.remove(os.path.join(d2, "train_state.npz"))
    got, meta = cm.restore()
    assert meta["step"] == 1
    # best-checkpoint note (lower is better)
    assert cm.note_best(1.0, 1) and not cm.note_best(2.0, 2)


# ---------------------------------------------------------------------------
# observability
# ---------------------------------------------------------------------------

def test_metrics_writer_and_meter(tmp_path):
    from longspec_tpu.utils.logging import MetricsWriter, AverageMeter, \
        setup_logger
    setup_logger(str(tmp_path))
    mw = MetricsWriter(str(tmp_path), "r1", config={"lr": 1e-3})
    mw.log(1, {"loss": 2.0})
    mw.log(2, {"loss": 1.0})
    assert mw.summary()["loss/min"] == 1.0
    mw.close()
    rows = [json.loads(l) for l in open(mw.path)]
    assert rows[1]["loss"] == 1.0
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert abs(m.avg - 2.0) < 1e-9
    assert abs(m.gather() - 2.0) < 1e-9  # single process


# ---------------------------------------------------------------------------
# experiment config
# ---------------------------------------------------------------------------

def test_expconfig_compose_interp_instantiate(tmp_path):
    from longspec_tpu.train.expconfig import load_config, instantiate
    (tmp_path / "deepspeed").mkdir()
    (tmp_path / "exp").mkdir()
    (tmp_path / "deepspeed" / "base.yaml").write_text(
        "zero_stage: 1\nlr_schedule: cosine\n")
    (tmp_path / "exp" / "main.yaml").write_text("""
defaults:
  - deepspeed@ds_cfg: base
model_name: tiny
output_dir: out/${model_name}
lr: 5.0e-4
collator:
  _target_: longspec_tpu.data.collators.SFTCollator
  encode:
    _target_: tests.test_aux.toy_encode
    _partial_: true
  seq_len: 16
""")
    cfg = load_config(str(tmp_path / "exp" / "main.yaml"),
                      overrides=["--lr=1e-3", "ds_cfg.zero_stage=3"])
    assert cfg["output_dir"] == "out/tiny"
    assert cfg["lr"] == 1e-3
    assert cfg["ds_cfg"]["zero_stage"] == 3
    assert cfg["ds_cfg"]["lr_schedule"] == "cosine"
    coll = instantiate(cfg["collator"])
    out = coll([{"prompt": "ab", "response": "c"}])
    assert out["input_ids"].shape == (1, 16)


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

def test_evaluator_loss_only(tmp_path):
    from longspec_tpu.config import tiny_test, DraftConfig
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.train.evaluator import evaluate
    cfg = tiny_test()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(0)
    toks = rng.integers(2, cfg.vocab_size, (4, 24)).astype(np.int32)
    batches = [{"input_ids": toks[:2], "labels": toks[:2]},
               {"input_ids": toks[2:], "labels": toks[2:]}]
    out = evaluate(dparams, params, cfg, DraftConfig(window=8), batches,
                   attn_impl="dense", output_dir=str(tmp_path))
    assert np.isfinite(out["eval/loss"]) and out["eval/loss"] > 0
    assert (tmp_path / "eval_predictions.jsonl").exists()


# ---------------------------------------------------------------------------
# math answer scoring
# ---------------------------------------------------------------------------

def test_mathx_extract_and_equal():
    from longspec_tpu.utils.mathx import extract_answer, answers_equal, \
        score_generations
    assert extract_answer(r"... so the result is \boxed{042}.") == "042"
    assert answers_equal(extract_answer("The final answer is 1,234."), "1234")
    assert answers_equal("042", "42")
    assert answers_equal("1/2", "0.5")
    assert answers_equal(r"\frac{3}{4}", "0.75")
    assert not answers_equal("41", "42")
    recs = [{"output": r"\boxed{7}", "answer": "7"},
            {"output": "answer is 9", "answer": "8"}]
    assert score_generations(recs) == 0.5


def test_mathx_equivalence_core():
    """The deepseek/mathscale answer-equivalence semantics (T11): LaTeX
    normalization, percent leniency, tuples/matrices/set-unions
    element-wise, sympy symbolic equality (ref eval_utils.py math_equal,
    eval_script.py is_correct)."""
    from longspec_tpu.utils.mathx import math_equal
    checks = [
        (r"\dfrac{1}{2}", r"\frac{1}{2}", True),
        ("50%", "0.5", True),                       # percent leniency
        (r"\frac{\sqrt{2}}{2}", r"\frac{1}{\sqrt{2}}", True),
        ("(1, 2)", "(1.0, 2)", True),               # tuple element-wise
        ("(1, 2)", "(1, 3)", False),
        (r"\begin{pmatrix}1&2\\3&4\end{pmatrix}",
         r"\begin{bmatrix}1 & 2 \\ 3 & 4\end{bmatrix}", True),
        (r"\begin{pmatrix}1&2\\3&4\end{pmatrix}",
         r"\begin{pmatrix}1&2\\3&5\end{pmatrix}", False),
        (r"[0,1)\cup(2,3]", r"(2,3]\cup[0,1)", True),   # set, any order
        (r"[0,1)\cup(2,3]", r"(2,4]\cup[0,1)", False),
        ("2\\pi", "2*\\pi", True),
        ("x+1=2", "x=1", True),                     # equation difference law
        ("x+1=2", "x=5", False),
        ("2.50", "2.5", True),
        ("12 degrees", "12", True),                 # unit stripping
        (r"\sqrt{8}", r"2\sqrt{2}", True),          # sympy simplify
        (r"\sqrt{8}", r"3\sqrt{2}", False),
        ("x^2-1", "(x-1)(x+1)", True),
        (r"\frac{x}{2}", "x/2", True),
        ("1,234", "1234", True),
        (r"\text{12 cm}", "12", True),
    ]
    for p, g, want in checks:
        assert math_equal(p, g) == want, (p, g, want)


def test_phase_timer():
    from longspec_tpu.utils.profiling import PhaseTimer
    import jax.numpy as jnp
    pt = PhaseTimer()
    with pt.phase("a", sync_on=jnp.ones((2,))):
        pass
    with pt.phase("a"):
        pass
    rep = pt.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] >= 0


def test_markov2_language():
    """Order-2 hard-bench language: every transition follows the pair table,
    branching states emit each allowed successor, deterministic states only
    their single one."""
    from longspec_tpu.train.synthetic import make_markov2_lm, sample_corpus2
    ns = 16
    succ2, probs2 = make_markov2_lm(64, n_states=ns, branch_frac=0.5, seed=0)
    assert succ2.shape == (ns, ns, 4) and probs2.shape == (ns, ns, 4)
    assert succ2.min() >= 2 and succ2.max() < 2 + ns
    seqs = sample_corpus2(succ2, probs2, 8, 400, seed=1)
    assert seqs.min() >= 2 and seqs.max() < 2 + ns
    seen = {}
    for row in seqs:
        for t in range(2, len(row)):
            pi, ci = row[t - 2] - 2, row[t - 1] - 2
            allowed = set(succ2[pi, ci][probs2[pi, ci] > 0].tolist())
            assert row[t] in allowed, (t, row[t], allowed)
            seen.setdefault((pi, ci), set()).add(int(row[t]))
    # some branching pair visited often enough emitted >1 distinct successor
    assert any(len(v) > 1 for v in seen.values())
