"""Math-benchmark answer extraction and equivalence checking.

TPU-agnostic utility mirroring the role of the reference's math eval
scaffolding (`longspec/train/data/math.py`, `math_util.py`,
`deepseek_math_utils/`) for scoring AIME/LongCoT generations produced by
`cli/infer.py --task aime` (ref `inference_qwq.py`): pull the final answer
out of a chain-of-thought and compare it to the gold answer numerically.
"""
from __future__ import annotations

import re
from typing import Optional

_BOXED = re.compile(r"\\boxed\{([^{}]*(?:\{[^{}]*\}[^{}]*)*)\}")
_FINAL = re.compile(
    r"(?:final answer|answer is|answer:)\s*[:\-]?\s*\$?([\-0-9][0-9,./\s]*)",
    re.IGNORECASE)
_NUM = re.compile(r"-?\d[\d,]*(?:\.\d+)?(?:/\d+)?")


def extract_answer(text: str) -> Optional[str]:
    """Last \\boxed{...}, else 'final answer …' phrase, else last number."""
    boxed = _BOXED.findall(text)
    if boxed:
        return boxed[-1].strip()
    m = list(_FINAL.finditer(text))
    if m:
        return m[-1].group(1).strip()
    nums = _NUM.findall(text)
    return nums[-1] if nums else None


def _to_number(s: str) -> Optional[float]:
    s = s.strip().strip("$").replace(",", "").replace(" ", "")
    s = re.sub(r"\\(?:text|mathrm)\{[^}]*\}$", "", s)
    if not s:
        return None
    m = re.fullmatch(r"(-?\d+(?:\.\d+)?)/(\d+(?:\.\d+)?)", s)
    if m:
        try:
            return float(m.group(1)) / float(m.group(2))
        except ZeroDivisionError:
            return None
    frac = re.fullmatch(r"\\d?frac\{(-?\d+(?:\.\d+)?)\}\{(-?\d+(?:\.\d+)?)\}", s)
    if frac:
        try:
            return float(frac.group(1)) / float(frac.group(2))
        except ZeroDivisionError:
            return None
    try:
        return float(s)
    except ValueError:
        return None


def answers_equal(pred: Optional[str], gold: str, tol: float = 1e-6) -> bool:
    """Numeric equivalence when both parse as numbers, else normalized
    string equality (ref `math_util.py` is_equiv semantics)."""
    if pred is None:
        return False
    a, b = _to_number(pred), _to_number(gold)
    if a is not None and b is not None:
        return abs(a - b) <= tol * max(1.0, abs(b))
    norm = lambda x: re.sub(r"\s+", "", x).strip("$.").lower()
    return norm(pred) == norm(gold)


def score_generations(records, gold_key: str = "answer",
                      pred_key: str = "output") -> float:
    """Fraction of records whose extracted answer matches gold."""
    if not records:
        return 0.0
    hits = sum(answers_equal(extract_answer(r[pred_key]), str(r[gold_key]))
               for r in records)
    return hits / len(records)
