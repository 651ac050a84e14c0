"""Eval post-processors: accumulate per-batch outputs, reduce across hosts,
emit metrics + prediction dumps.

TPU-native equivalent of the reference post-processor package
(`longspec/train/post_processors/dist_mixin.py:24-46`, `dpo.py:16-224`,
`code/code.py:36-141`): same accumulate -> gather -> metrics/dump contract,
but cross-host transport is a JAX all-gather over serialized bytes instead
of `torch.distributed.gather_object`, so it works on any backend that JAX
runs on (every host gets the full result; rank 0 writes files).

Processors plug into `train.evaluator.evaluate(post_processor=...)`: the
eval loop calls `pp(meta, outputs)` per batch and `pp.get_results(dir)` once
at the end, returning `(metrics, predictions)`.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# cross-host object gather
# ---------------------------------------------------------------------------

def gather_objects(obj: Any) -> List[Any]:
    """All-gather an arbitrary JSON-serializable object across hosts.

    Returns the per-process list `[obj_0, ..., obj_{P-1}]` on EVERY process
    (the reference gathers to rank 0 only, `dist_mixin.py:12-20`; symmetric
    all-gather is simpler under SPMD and lets any host compute metrics).
    Single-process: returns `[obj]` without touching the backend.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(json.dumps(obj).encode("utf-8"), dtype=np.uint8)
    n = np.asarray([payload.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    mat = np.asarray(multihost_utils.process_allgather(buf))
    return [
        json.loads(bytes(mat[p, : int(sizes[p])]).decode("utf-8"))
        for p in range(mat.shape[0])
    ]


def _to_list(x) -> list:
    if isinstance(x, (jnp.ndarray, np.ndarray)):
        return np.asarray(x).tolist()
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def _write_json(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2, ensure_ascii=False)


class PostProcessor:
    """Accumulate -> gather -> (metrics, predictions) contract
    (ref `evaluator.py:21-137` drives the same shape)."""

    def __call__(self, meta: Dict[str, Any], outputs: Dict[str, Any]) -> None:
        raise NotImplementedError

    def get_results(self, output_dir: Optional[str] = None
                    ) -> Tuple[Dict[str, float], List[dict]]:
        raise NotImplementedError

    # shared file-dump helper
    def _dump(self, output_dir: Optional[str], metrics: Dict[str, float],
              predictions: List[dict], prefix: str = "eval_predictions"):
        if output_dir and jax.process_index() == 0:
            _write_json(os.path.join(output_dir, f"{prefix}.json"), predictions)
            _write_json(os.path.join(output_dir, f"{prefix}.metrics.json"),
                        metrics)


class SFTLossOnlyPostProcessor(PostProcessor):
    """Mean loss across batches and hosts (ref `dist_mixin.py:24-46`)."""

    def __init__(self):
        self.losses: List[float] = []

    def __call__(self, meta, outputs) -> None:
        self.losses.append(float(outputs["loss"]))

    def get_results(self, output_dir=None):
        per_host = gather_objects(self.losses)
        flat = [l for host in per_host for l in host]
        metrics = {"loss": float(np.mean(flat)) if flat else float("nan")}
        self._dump(output_dir, metrics, [])
        return metrics, []


class DPOEvalPostProcessor(PostProcessor):
    """Chosen/rejected reward means + loss (ref `dpo.py:16-89`).

    Expects outputs with scalar `loss`, `chosen_reward`, `rejected_reward`
    and meta with `index`, `prompt`, `chosen`, `reject` lists.
    """

    def __init__(self):
        self.rows: List[dict] = []
        self.stats: List[dict] = []

    def __call__(self, meta, outputs) -> None:
        self.stats.append({
            "loss": float(outputs["loss"]),
            "chosen_reward": float(outputs["chosen_reward"]),
            "rejected_reward": float(outputs["rejected_reward"]),
        })
        for prompt, ch, rej, idx in zip(meta["prompt"], meta["chosen"],
                                        meta["reject"], _to_list(meta["index"])):
            self.rows.append({"input": prompt, "chosen": ch,
                              "rejected": rej, "index": idx})

    def get_results(self, output_dir=None):
        per_host = gather_objects({"rows": self.rows, "stats": self.stats})
        rows = sorted((r for h in per_host for r in h["rows"]),
                      key=lambda r: r["index"])
        stats = [s for h in per_host for s in h["stats"]]
        metrics = {
            k: float(np.mean([s[k] for s in stats])) if stats else float("nan")
            for k in ("loss", "chosen_reward", "rejected_reward")
        }
        self._dump(output_dir, metrics, rows)
        return metrics, rows


class DPORewardPostProcessor(PostProcessor):
    """Per-example rewards -> pairwise accuracy (ref `dpo.py:91-159`):
    acc = mean(chosen_reward > rejected_reward)."""

    def __init__(self):
        self.rows: List[dict] = []

    def __call__(self, meta, outputs) -> None:
        ch = _to_list(outputs["batch_chosen_reward"])
        rej = _to_list(outputs["batch_rejected_reward"])
        for prompt, c, r, cr, rr, idx in zip(
                meta["prompt"], meta["chosen"], meta["reject"], ch, rej,
                _to_list(meta["index"])):
            self.rows.append({"input": prompt, "chosen": c, "rejected": r,
                              "chosen_reward": float(cr),
                              "rejected_reward": float(rr), "index": idx})

    def get_results(self, output_dir=None):
        per_host = gather_objects(self.rows)
        rows = sorted((r for h in per_host for r in h), key=lambda r: r["index"])
        acc = (float(np.mean([r["chosen_reward"] > r["rejected_reward"]
                              for r in rows])) if rows else float("nan"))
        metrics = {"acc": acc}
        self._dump(output_dir, metrics, rows)
        return metrics, rows


class ResponseClsPostProcessor(PostProcessor):
    """Argmax-label classification accuracy (ref `dpo.py:161-224`)."""

    def __init__(self):
        self.rows: List[dict] = []

    def __call__(self, meta, outputs) -> None:
        preds = _to_list(outputs["pred"])
        for idx, label, pred in zip(_to_list(meta["index"]),
                                    _to_list(meta["label"]), preds):
            self.rows.append({"index": idx, "label": int(label),
                              "pred": int(pred)})

    def get_results(self, output_dir=None):
        per_host = gather_objects(self.rows)
        rows = sorted((r for h in per_host for r in h), key=lambda r: r["index"])
        labeled = [r for r in rows if r["label"] != -1]
        acc = (float(np.mean([r["pred"] == r["label"] for r in labeled]))
               if labeled else float("nan"))
        metrics = {"acc": acc, "num": len(rows)}
        self._dump(output_dir, metrics, rows)
        return metrics, rows


# ---------------------------------------------------------------------------
# DPO reward/loss math (host-agnostic jnp; usable inside a jitted eval step)
# ---------------------------------------------------------------------------

def dpo_rewards(policy_logps: jnp.ndarray, ref_logps: jnp.ndarray,
                beta: float = 0.1) -> jnp.ndarray:
    """Implicit DPO reward: beta * (log pi(y|x) - log pi_ref(y|x))."""
    return beta * (policy_logps - ref_logps)


def dpo_loss(policy_chosen_logps, policy_rejected_logps,
             ref_chosen_logps, ref_rejected_logps, beta: float = 0.1):
    """DPO objective -> (loss, chosen_reward, rejected_reward); the rewards
    feed `DPOEvalPostProcessor` / `DPORewardPostProcessor`."""
    chosen_r = dpo_rewards(policy_chosen_logps, ref_chosen_logps, beta)
    rejected_r = dpo_rewards(policy_rejected_logps, ref_rejected_logps, beta)
    loss = jnp.mean(-jax.nn.log_sigmoid(chosen_r - rejected_r))
    return loss, jnp.mean(chosen_r), jnp.mean(rejected_r)


def sequence_logp(logits: jnp.ndarray, tokens: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Sum log p(token_t | prefix) over masked positions, per row.
    `logits` [B,S,V] predicts token t+1 from position t."""
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask[:, 1:], axis=-1)


# ---------------------------------------------------------------------------
# answer-clean helpers (ref `openai_api_callback.py:18-110`)
# ---------------------------------------------------------------------------

def clean_mcqa_answer(text: str, choices: str = "ABCD") -> str:
    """Pull a single multiple-choice letter out of a free-form response."""
    m = re.search(rf"\b([{choices}])\b", text.strip())
    return m.group(1) if m else ""


def clean_binary_answer(text: str) -> str:
    low = text.lower()
    has_yes, has_no = "yes" in low, "no" in low
    if has_yes and not has_no:
        return "yes"
    if has_no and not has_yes:
        return "no"
    return ""


def clean_after_separator(text: str, separator: str = "Finish",
                          idx: int = 1, pattern: str = "A|B|C|D") -> str:
    parts = text.split(separator)
    if len(parts) <= idx:
        return ""
    m = re.search(pattern, parts[idx])
    return m.group(0) if m else ""


# ---------------------------------------------------------------------------
# code execution eval (ref `code/code.py:36-141`, `code/evaluator.py:16-130`)
# ---------------------------------------------------------------------------

_CODE_FENCE = re.compile(r"```(?:python)?\n(.*?)```", re.DOTALL)


def extract_code(response: str) -> str:
    """Last fenced python block, else the raw response."""
    blocks = _CODE_FENCE.findall(response)
    return blocks[-1].strip() if blocks else response.strip()


def run_code_case(code: str, stdin: str = "", timeout: float = 10.0
                  ) -> Tuple[bool, str]:
    """Execute a snippet in a fresh interpreter; (ok, stdout).

    Subprocess isolation replaces the reference's multiprocessing worker
    pool (`code/code.py:21-33`) — same failure containment (crash/timeout
    in user code cannot take down the eval loop), no shared state.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-I", "-c", code], input=stdin,
            capture_output=True, text=True, timeout=timeout)
        return proc.returncode == 0, proc.stdout
    except subprocess.TimeoutExpired:
        return False, ""


def eval_code_prediction(response: str, test_cases: Dict[str, Sequence[str]],
                         timeout: float = 10.0) -> Tuple[List[bool], bool]:
    """Run extracted code on each (input, output) pair; -> (per-case, all-pass).
    Matches the reference's APPs stdin/stdout convention."""
    code = extract_code(response)
    res = []
    for stdin, expected in zip(test_cases.get("inputs", []),
                               test_cases.get("outputs", [])):
        ok, out = run_code_case(code, stdin, timeout)
        res.append(ok and out.strip() == str(expected).strip())
    return res, bool(res) and all(res)


class CodeEvalPostProcessor(PostProcessor):
    """pass-rate / strict-pass over generated programs (ref
    `code/code.py:36-141`). Expects outputs `{"response": [str, ...]}` and
    meta `{"index": ..., "test_cases": [{"inputs": [...], "outputs": [...]}]}`.
    Execution fans out over threads (each case is its own subprocess)."""

    def __init__(self, timeout: float = 10.0, num_workers: int = 8):
        self.timeout = timeout
        self.num_workers = num_workers
        self.pending: List[dict] = []

    def __call__(self, meta, outputs) -> None:
        for idx, cases, resp in zip(_to_list(meta["index"]),
                                    meta["test_cases"], outputs["response"]):
            self.pending.append({"index": idx, "test_cases": cases,
                                 "response": resp})

    def get_results(self, output_dir=None):
        def _one(row):
            per_case, strict = eval_code_prediction(
                row["response"], row["test_cases"], self.timeout)
            return {"index": row["index"], "response": row["response"],
                    "per_case": per_case, "pass": strict}

        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            local = list(ex.map(_one, self.pending))
        per_host = gather_objects(local)
        rows = sorted((r for h in per_host for r in h), key=lambda r: r["index"])
        flat = [c for r in rows for c in r["per_case"]]
        metrics = {
            "strict_pass": (float(np.mean([r["pass"] for r in rows]))
                            if rows else float("nan")),
            "case_pass": float(np.mean(flat)) if flat else float("nan"),
            "num": len(rows),
        }
        self._dump(output_dir, metrics, rows)
        return metrics, rows
