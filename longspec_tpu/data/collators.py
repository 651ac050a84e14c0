"""Batch collators: tokenized examples -> fixed-shape numpy training batches.

TPU-native equivalents of the reference collator families
(`longspec/train/data/general_collator.py`, `general_collator_llama.py`,
`longspec/test/data.py`): every batch is a static-shape dict
{input_ids, labels, lengths} so one jitted train step serves all data.
Variants mirror the three training stages:

  * SFTCollator        — prompt tokens masked out of the labels
                         (ref DPODataSFTCollator, `general_collator.py:76-118`)
  * LongDataCollator   — labels = inputs, NO prompt masking; used for the
                         long-context stage (ref LongDataNoMaskSFTCollator,
                         `general_collator.py:308-394`)
  * LongCoTCollator    — chat-formatted problem + long chain-of-thought,
                         prompt masked (ref LongCoTDataSFTCollator,
                         `general_collator.py:514`)

Collators are tokenizer-agnostic: they take a callable `encode(text) ->
list[int]` (an HF tokenizer's `__call__` can be adapted trivially), so unit
tests run without network access.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

IGNORE_INDEX = -100


def pack_documents(docs: Sequence[Sequence[int]], seq_len: int, pad_id: int,
                   eos_id: Optional[int] = None) -> np.ndarray:
    """Pack token documents into fixed [N, seq_len] buffers.

    Documents are concatenated (with an eos separator if given) and split
    into seq_len rows; the tail is padded. This is the reference's
    fixed-buffer packing used by the LongData collators
    (`longspec/test/data.py:7-93`).
    """
    stream: List[int] = []
    for d in docs:
        stream.extend(int(t) for t in d)
        if eos_id is not None:
            stream.append(eos_id)
    n = max(1, -(-len(stream) // seq_len))
    buf = np.full((n, seq_len), pad_id, np.int32)
    flat = np.asarray(stream, np.int32)
    for i in range(n):
        row = flat[i * seq_len:(i + 1) * seq_len]
        buf[i, :len(row)] = row
    return buf


def _fit(ids: List[int], seq_len: int) -> List[int]:
    return ids[:seq_len]


class _Base:
    def __init__(self, encode: Callable[[str], List[int]], seq_len: int,
                 pad_id: int = 0, eos_id: Optional[int] = None):
        self.encode = encode
        self.seq_len = seq_len
        self.pad_id = pad_id
        self.eos_id = eos_id

    def _batch(self, rows_ids: List[List[int]],
               mask_upto: Optional[List[int]] = None) -> Dict[str, np.ndarray]:
        b, s = len(rows_ids), self.seq_len
        input_ids = np.full((b, s), self.pad_id, np.int32)
        labels = np.full((b, s), IGNORE_INDEX, np.int32)
        lengths = np.zeros((b,), np.int32)
        for i, ids in enumerate(rows_ids):
            ids = _fit(ids, s)
            L = len(ids)
            input_ids[i, :L] = ids
            lengths[i] = L
            lo = 0 if mask_upto is None else min(mask_upto[i], L)
            labels[i, lo:L] = ids[lo:L]
        return {"input_ids": input_ids, "labels": labels, "lengths": lengths}


class SFTCollator(_Base):
    """Prompt-masked SFT batches (ref DPODataSFTCollator,
    `general_collator.py:76-118`): labels on the response only."""

    def __call__(self, examples: Sequence[Dict[str, str]]) -> Dict[str, np.ndarray]:
        rows, mask = [], []
        for ex in examples:
            p = self.encode(ex["prompt"])
            r = self.encode(ex["response"])
            if self.eos_id is not None:
                r = r + [self.eos_id]
            rows.append(p + r)
            mask.append(len(p))
        return self._batch(rows, mask)


class LongDataCollator(_Base):
    """Long-context stage: labels = inputs, no prompt masking
    (ref LongDataNoMaskSFTCollator, `general_collator.py:308-394`)."""

    def __call__(self, examples: Sequence[Dict[str, str]]) -> Dict[str, np.ndarray]:
        rows = []
        for ex in examples:
            text = ex.get("text") or (ex.get("prompt", "") + ex.get("response", ""))
            ids = self.encode(text)
            if self.eos_id is not None:
                ids = ids + [self.eos_id]
            rows.append(ids)
        return self._batch(rows, None)


class LongCoTCollator(_Base):
    """Chat-formatted problem + long chain-of-thought response, prompt
    masked (ref LongCoTDataSFTCollator, `general_collator.py:514`; ChatML
    format `inference_qwq.py:58-59`)."""

    chat_template = ("<|im_start|>user\n{problem}<|im_end|>\n"
                     "<|im_start|>assistant\n")

    def __call__(self, examples: Sequence[Dict[str, str]]) -> Dict[str, np.ndarray]:
        rows, mask = [], []
        for ex in examples:
            p = self.encode(self.chat_template.format(problem=ex["problem"]))
            r = self.encode(ex.get("qwq") or ex.get("response", ""))
            if self.eos_id is not None:
                r = r + [self.eos_id]
            rows.append(p + r)
            mask.append(len(p))
        return self._batch(rows, mask)
