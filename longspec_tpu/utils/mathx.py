"""Math-benchmark answer extraction and equivalence checking.

TPU-agnostic utility providing the answer-equivalence capability of the
reference's math eval scaffolding — the ~300 LoC that matter of
`longspec/train/data/deepseek_math_utils/eval_script.py` /
`eval_utils.py:183-280` (math_equal), `answer_extraction.py` (strip_string)
and `mathscale/util.py` — re-derived for scoring AIME/LongCoT generations
from `cli/infer.py --task aime` (ref `inference_qwq.py`). The semantics
implemented, in the reference's precedence order:

  1. normalized string equality after LaTeX cleanup (units, spacing,
     \\dfrac -> \\frac, \\left/\\right, trailing zeros, ...);
  2. numeric equality at 1e-3 tolerance, with percent leniency
     (gold, gold/100, gold*100 all accepted — eval_utils.py:203-215);
  3. structured equality: tuples/intervals "(a, b)" element-wise,
     \\begin{pmatrix} matrices element-wise, \\cup-joined set answers as
     order-insensitive all-matched sets (eval_script.py:10-34);
  4. symbolic equality via sympy simplify(a - b) == 0, and equation
     equivalence a=b ~ c=d via simplify((a-b) - (c-d)) == 0.

The environment has sympy but not the antlr LaTeX parser, so a small
hand-rolled LaTeX -> sympy translation covers the constructs that appear
in benchmark answers (\\frac, \\sqrt, \\pi, ^, \\cdot, implicit mult).
"""
from __future__ import annotations

import re
from typing import List, Optional

_BOXED = re.compile(r"\\boxed\{([^{}]*(?:\{[^{}]*\}[^{}]*)*)\}")
_FINAL = re.compile(
    r"(?:final\s+)?answer\s*(?:is)?\s*[:\-]?\s*\$?"
    r"([^\n$]*[0-9a-zA-Z)\}])",
    re.IGNORECASE)
_NUM = re.compile(r"-?\d[\d,]*(?:\.\d+)?(?:/\d+)?")


def extract_answer(text: str) -> Optional[str]:
    """Last \\boxed{...}, else 'final answer ...' phrase, else last number."""
    boxed = _BOXED.findall(text)
    if boxed:
        return boxed[-1].strip()
    m = list(_FINAL.finditer(text))
    if m:
        return m[-1].group(1).strip()
    nums = _NUM.findall(text)
    return nums[-1] if nums else None


# ---------------------------------------------------------------------------
# LaTeX answer normalization (ref answer_extraction.py strip_string)
# ---------------------------------------------------------------------------

_UNIT_WORDS = (
    "degrees?|cm|m|mm|km|inch(?:es)?|feet|foot|hours?|minutes?|seconds?|"
    "dollars?|cents?|units?|square|cubic|per|points?|ways?|integers?")


def strip_latex(s: str) -> str:
    """Normalize a LaTeX answer string for comparison."""
    s = s.strip()
    s = s.replace("\\!", "").replace("\\,", " ")
    s = re.sub(r"(?<!\\)\\ ", " ", s)   # \  (escaped space), NOT a \\ row sep
    s = s.replace("\\left", "").replace("\\right", "")
    s = s.replace("\\{", "{").replace("\\}", "}")
    s = re.sub(r"\\(?:text|textbf|mathrm|mbox|hbox)\{([^{}]*)\}", r"\1", s)
    s = re.sub(r"\\(?:d|t|c)frac", r"\\frac", s)
    s = s.replace("\\%", "%").replace("\\$", "").replace("$", "")
    s = re.sub(r"\^\{?\\circ\}?", "", s)      # degrees
    s = re.sub(r"\b(" + _UNIT_WORDS + r")\b\.?", "", s, flags=re.IGNORECASE)
    s = re.sub(r"\\frac(\d)(\d)", r"\\frac{\1}{\2}", s)   # \frac12
    s = re.sub(r"\\frac\{([^{}]+)\}(\d)", r"\\frac{\1}{\2}", s)
    s = re.sub(r"\\sqrt(\d)", r"\\sqrt{\1}", s)           # \sqrt2
    s = s.replace("tfrac", "frac").replace("dfrac", "frac")
    s = re.sub(r"\s+", "", s)
    s = s.rstrip(".").lstrip("=")
    # 0.5 == .5 ; strip trailing zeros of decimals (2.50 == 2.5, 2.0 == 2)
    s = re.sub(r"(?<![\d.])\.(\d)", r"0.\1", s)
    s = re.sub(r"(\.\d*?)0+(?=$|[^\d])", r"\1", s)
    s = re.sub(r"\.(?=$|[^\d])", "", s)
    return s


def _parse_number(s: str) -> Optional[float]:
    """Float value of a numeric-looking answer (commas, %, simple / frac,
    \\frac{a}{b}); None if not numeric (ref eval_utils.parse_digits)."""
    s = s.strip().replace(",", "").replace(" ", "")
    if not s:
        return None
    pct = s.endswith("%")
    if pct:
        s = s[:-1].rstrip("\\")
    m = re.fullmatch(r"(-?\d+(?:\.\d+)?)/(-?\d+(?:\.\d+)?)", s)
    if not m:
        m = re.fullmatch(
            r"(?:\\frac|frac)\{(-?\d+(?:\.\d+)?)\}\{(-?\d+(?:\.\d+)?)\}", s)
    if m:
        try:
            v = float(m.group(1)) / float(m.group(2))
        except ZeroDivisionError:
            return None
        return v / 100 if pct else v
    try:
        v = float(s)
    except ValueError:
        return None
    return v / 100 if pct else v


# ---------------------------------------------------------------------------
# LaTeX -> sympy (no antlr in this environment: hand-rolled translation)
# ---------------------------------------------------------------------------

def _latex_to_expr_str(s: str) -> str:
    """Translate normalized LaTeX into a sympy-parseable expression."""
    prev = None
    while prev != s:  # nested \frac/\sqrt resolve inside-out
        prev = s
        s = re.sub(r"\\frac\{([^{}]*)\}\{([^{}]*)\}", r"((\1)/(\2))", s)
        s = re.sub(r"\\sqrt\[(\d+)\]\{([^{}]*)\}", r"((\2)**(1/\1))", s)
        s = re.sub(r"\\sqrt\{([^{}]*)\}", r"sqrt(\1)", s)
    s = s.replace("\\pi", "pi").replace("\\cdot", "*").replace("\\times", "*")
    s = s.replace("\\div", "/").replace("^", "**")
    s = s.replace("{", "(").replace("}", ")")
    s = s.replace("\\", "")
    return s


def _sympy_parse(s: str):
    try:
        import sympy
        from sympy.parsing.sympy_parser import (
            parse_expr, standard_transformations,
            implicit_multiplication_application)
        expr = parse_expr(
            _latex_to_expr_str(s),
            transformations=standard_transformations
            + (implicit_multiplication_application,))
        return expr
    except Exception:  # noqa: BLE001 — any parse failure means "not symbolic"
        return None


def _symbolic_equal(a: str, b: str) -> bool:
    """sympy simplify(a - b) == 0; equations compared by difference of
    sides (ref eval_utils.py symbolic_equal / normalize_symbolic_equation)."""
    if ("=" in a) != ("=" in b):
        return False
    try:
        import sympy
        if "=" in a:
            la, ra = a.split("=", 1)
            lb, rb = b.split("=", 1)
            pa = [_sympy_parse(x) for x in (la, ra, lb, rb)]
            if any(p is None for p in pa):
                return False
            diff = (pa[0] - pa[1]) - (pa[2] - pa[3])
            return sympy.simplify(diff) == 0
        ea, eb = _sympy_parse(a), _sympy_parse(b)
        if ea is None or eb is None:
            return False
        if ea == eb:
            return True
        d = sympy.simplify(ea - eb)
        if d == 0:
            return True
        # numeric fallback for expressions simplify can't close
        v = complex(sympy.N(d))
        return abs(v) < 1e-9
    except Exception:  # noqa: BLE001
        return False


# ---------------------------------------------------------------------------
# Equivalence (ref eval_script.is_correct / eval_utils.math_equal)
# ---------------------------------------------------------------------------

def _split_tuple(s: str) -> Optional[List[str]]:
    """"(a, b)" / "[a, b]" -> parts, else None (interval/tuple answers)."""
    if len(s) >= 2 and s[0] in "([" and s[-1] in ")]" and "," in s:
        inner = s[1:-1]
        if "(" not in inner and "[" not in inner:
            return inner.split(",")
    return None


_MAT = re.compile(r"\\begin\{[pb]matrix\}(.*)\\end\{[pb]matrix\}", re.DOTALL)


def math_equal(pred: str, gold: str, tol: float = 1e-3,
               percent_leniency: bool = True, _depth: int = 0) -> bool:
    """Reference-order equivalence: normalized string -> numeric (with
    percent leniency) -> tuple/matrix/set element-wise -> sympy symbolic."""
    if pred is None or gold is None or _depth > 4:
        return False
    p, g = strip_latex(str(pred)), strip_latex(str(gold))
    if p == g:
        return True
    # \cup-joined set answers: order-insensitive, all parts matched both ways
    if "\\cup" in p and "\\cup" in g:
        pp, gp = p.split("\\cup"), g.split("\\cup")
        return (len(pp) == len(gp)
                and all(any(math_equal(x, y, tol, percent_leniency,
                                       _depth + 1) for y in gp) for x in pp)
                and all(any(math_equal(x, y, tol, percent_leniency,
                                       _depth + 1) for x in pp) for y in gp))
    pn, gn = _parse_number(p), _parse_number(g)
    if pn is not None and gn is not None:
        golds = [gn, gn / 100, gn * 100] if percent_leniency else [gn]
        return any(abs(pn - x) <= tol for x in golds)
    pt, gt = _split_tuple(p), _split_tuple(g)
    if pt is not None and gt is not None and len(pt) == len(gt):
        return all(math_equal(x, y, tol, percent_leniency, _depth + 1)
                   for x, y in zip(pt, gt))
    pm, gm = _MAT.search(p), _MAT.search(g)
    if pm and gm:
        pr = [r for r in pm.group(1).split("\\\\") if r.strip()]
        gr = [r for r in gm.group(1).split("\\\\") if r.strip()]
        if len(pr) != len(gr):
            return False
        for rp, rg in zip(pr, gr):
            cp, cg = rp.split("&"), rg.split("&")
            if len(cp) != len(cg) or not all(
                    math_equal(x, y, tol, percent_leniency, _depth + 1)
                    for x, y in zip(cp, cg)):
                return False
        return True
    return _symbolic_equal(p, g)


def answers_equal(pred: Optional[str], gold: str, tol: float = 1e-3) -> bool:
    """Equivalence of an extracted answer against gold (ref is_correct)."""
    if pred is None:
        return False
    return math_equal(pred, gold, tol=tol)


def score_generations(records, gold_key: str = "answer",
                      pred_key: str = "output") -> float:
    """Fraction of records whose extracted answer matches gold."""
    if not records:
        return 0.0
    hits = sum(answers_equal(extract_answer(r[pred_key]), str(r[gold_key]))
               for r in records)
    return hits / len(records)
