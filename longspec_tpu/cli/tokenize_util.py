"""Tokenizer helpers for CLI configs (ref
`longspec/train/general_util/tokenization_utils.py`): lazy HF tokenizer
loading with pad-token injection, exposed as a plain `encode` callable the
collators accept."""
from __future__ import annotations

import functools
from typing import List


@functools.lru_cache(maxsize=4)
def _load(tokenizer_path: str):
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(tokenizer_path)
    if tok.pad_token is None:  # pad injection (ref tokenization_utils)
        tok.pad_token = tok.eos_token or "<pad>"
    return tok


def hf_encode(text: str, tokenizer_path: str) -> List[int]:
    return _load(tokenizer_path)(text, add_special_tokens=False)["input_ids"]
