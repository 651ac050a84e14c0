"""Post-processor suite: accumulate -> gather -> metrics contract
(ref `longspec/train/post_processors/*`)."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from longspec_tpu.train import postproc as PP


def test_loss_only_mean(tmp_path):
    pp = PP.SFTLossOnlyPostProcessor()
    for l in (1.0, 2.0, 3.0):
        pp({}, {"loss": l})
    metrics, preds = pp.get_results(str(tmp_path))
    assert metrics["loss"] == pytest.approx(2.0)
    assert preds == []
    assert json.load(open(tmp_path / "eval_predictions.metrics.json")) == \
        {"loss": 2.0}


def test_dpo_reward_accuracy(tmp_path):
    pp = PP.DPORewardPostProcessor()
    pp({"index": [1, 0], "prompt": ["p1", "p0"], "chosen": ["c1", "c0"],
        "reject": ["r1", "r0"]},
       {"batch_chosen_reward": jnp.asarray([2.0, -1.0]),
        "batch_rejected_reward": jnp.asarray([1.0, 0.0])})
    metrics, rows = pp.get_results(str(tmp_path))
    # example 1: chosen 2.0 > rejected 1.0 (correct); example 0: -1.0 < 0.0
    assert metrics["acc"] == pytest.approx(0.5)
    assert [r["index"] for r in rows] == [0, 1]  # sorted by dataset index


def test_dpo_eval_means():
    pp = PP.DPOEvalPostProcessor()
    pp({"index": [0], "prompt": ["p"], "chosen": ["c"], "reject": ["r"]},
       {"loss": 0.5, "chosen_reward": 1.0, "rejected_reward": -1.0})
    pp({"index": [1], "prompt": ["p"], "chosen": ["c"], "reject": ["r"]},
       {"loss": 1.5, "chosen_reward": 3.0, "rejected_reward": 1.0})
    metrics, rows = pp.get_results()
    assert metrics == {"loss": 1.0, "chosen_reward": 2.0,
                       "rejected_reward": 0.0}
    assert len(rows) == 2


def test_response_cls_accuracy():
    pp = PP.ResponseClsPostProcessor()
    pp({"index": [0, 1, 2], "label": [1, 0, -1]},
       {"pred": jnp.asarray([1, 1, 0])})
    metrics, _ = pp.get_results()
    assert metrics["acc"] == pytest.approx(0.5)  # -1 labels excluded
    assert metrics["num"] == 3


def test_dpo_loss_math():
    # equal policy/ref logps -> rewards 0, loss = -log sigmoid(0) = log 2
    z = jnp.zeros((4,))
    loss, cr, rr = PP.dpo_loss(z, z, z, z, beta=0.1)
    assert float(loss) == pytest.approx(np.log(2.0), rel=1e-6)
    assert float(cr) == 0.0 and float(rr) == 0.0
    # chosen strongly preferred by policy -> loss below log 2
    loss2, cr2, _ = PP.dpo_loss(z + 5.0, z - 5.0, z, z, beta=0.1)
    assert float(loss2) < float(loss)
    assert float(cr2) == pytest.approx(0.5)


def test_sequence_logp_matches_manual():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(1, 5, 7)).astype(np.float32))
    tokens = jnp.asarray([[1, 2, 3, 4, 5]])
    mask = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 0.0]])
    got = float(PP.sequence_logp(logits, tokens, mask)[0])
    lp = np.log(np.exp(np.asarray(logits[0]))
                / np.exp(np.asarray(logits[0])).sum(-1, keepdims=True))
    want = lp[0, 2] + lp[1, 3] + lp[2, 4]  # positions 1..3 (mask cuts t=4)
    assert got == pytest.approx(float(want), rel=1e-5)


def test_answer_cleaners():
    assert PP.clean_mcqa_answer("The answer is (B).") == "B"
    assert PP.clean_mcqa_answer("no letter here") == ""
    assert PP.clean_binary_answer("Yes, that's right") == "yes"
    assert PP.clean_binary_answer("yes or no?") == ""
    assert PP.clean_after_separator("thought Finish B", "Finish") == "B"


def test_code_eval_pass_and_fail(tmp_path):
    pp = PP.CodeEvalPostProcessor(timeout=10.0, num_workers=2)
    good = "```python\nx = int(input())\nprint(x * 2)\n```"
    bad = "```python\nprint('wrong')\n```"
    crash = "```python\nraise RuntimeError('boom')\n```"
    cases = {"inputs": ["3\n", "5\n"], "outputs": ["6", "10"]}
    pp({"index": [0, 1, 2], "test_cases": [cases, cases, cases]},
       {"response": [good, bad, crash]})
    metrics, rows = pp.get_results(str(tmp_path))
    assert metrics["strict_pass"] == pytest.approx(1 / 3)
    assert rows[0]["per_case"] == [True, True]
    assert rows[1]["per_case"] == [False, False]
    assert rows[2]["per_case"] == [False, False]


def test_extract_code_last_fence():
    text = "first\n```python\nprint(1)\n```\nthen\n```\nprint(2)\n```"
    assert PP.extract_code(text) == "print(2)"
    assert PP.extract_code("no fence") == "no fence"


def test_gather_objects_single_process():
    assert PP.gather_objects({"a": 1}) == [{"a": 1}]


def test_evaluate_with_post_processor(tmp_path):
    """The evaluator feeds (meta, outputs) per batch and the processor's
    metrics come back alongside eval/loss."""
    import jax
    from longspec_tpu.config import DraftConfig, tiny_test
    from longspec_tpu.models import llama as M
    from longspec_tpu.models import glide as G
    from longspec_tpu.train.evaluator import evaluate

    cfg = tiny_test(vocab_size=61, num_layers=1)
    tparams = M.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    dparams = G.init_draft_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    toks = np.random.default_rng(0).integers(2, cfg.vocab_size, (2, 2, 16))
    batches = [{"input_ids": toks[i], "labels": toks[i]} for i in range(2)]
    pp = PP.SFTLossOnlyPostProcessor()
    res = evaluate(dparams, tparams, cfg, DraftConfig(window=8), batches,
                   post_processor=pp)
    metrics, _ = pp.get_results()
    assert metrics["loss"] == pytest.approx(res["eval/loss"], rel=1e-6)
