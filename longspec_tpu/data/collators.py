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
  * ShareGPTCollator   — multi-turn ChatML, labels on assistant turns only
                         (ref ShareGPTDataSFTCollator,
                         `general_collator.py:163-210`)
  * DPOCollator        — chosen/reject preference pairs stacked [2B, S],
                         prompt-masked (ref DPOCollator,
                         `general_collator.py:24-74`)

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


class ShareGPTCollator(_Base):
    """Multi-turn ChatML conversations; labels on ASSISTANT turns only
    (ref ShareGPTDataSFTCollator, `general_collator.py:163-210`: each user
    turn is appended unmasked, each assistant turn is appended with its
    tokens mirrored into the labels).

    Examples: {"conversations": [{"role": "user"|"assistant",
    "content": str}, ...]}. A leading system prompt is prepended (masked).
    """

    system_prompt = ("<|im_start|>system\nYou are a helpful assistant"
                     "<|im_end|>\n")
    user_template = "<|im_start|>user\n{content}<|im_end|>\n"
    assistant_template = "<|im_start|>assistant\n{content}<|im_end|>\n"

    def __call__(self, examples: Sequence[Dict]) -> Dict[str, np.ndarray]:
        b, s = len(examples), self.seq_len
        input_ids = np.full((b, s), self.pad_id, np.int32)
        labels = np.full((b, s), IGNORE_INDEX, np.int32)
        lengths = np.zeros((b,), np.int32)
        sys_ids = self.encode(self.system_prompt)
        for i, ex in enumerate(examples):
            pos = min(len(sys_ids), s)
            input_ids[i, :pos] = sys_ids[:pos]
            for turn in ex["conversations"]:
                if pos >= s:
                    break
                if turn["role"] == "user":
                    ids = self.encode(
                        self.user_template.format(content=turn["content"]))
                    lo, pos = pos, min(pos + len(ids), s)
                    input_ids[i, lo:pos] = ids[:pos - lo]
                elif turn["role"] == "assistant":
                    ids = self.encode(self.assistant_template.format(
                        content=turn["content"]))
                    lo, pos = pos, min(pos + len(ids), s)
                    input_ids[i, lo:pos] = ids[:pos - lo]
                    labels[i, lo:pos] = ids[:pos - lo]
                else:
                    raise ValueError(f"unknown role {turn['role']!r}")
            lengths[i] = pos
        return {"input_ids": input_ids, "labels": labels, "lengths": lengths}


class DPOCollator(_Base):
    """Preference pairs for DPO-style training (ref DPOCollator,
    `general_collator.py:24-74`): chosen and rejected completions of each
    example are stacked into ONE [2B, S] batch — rows [0, B) chosen,
    rows [B, 2B) rejected — with the prompt tokens masked out of the
    labels. Consumed by `train.postproc.DPOPostProcessor` (which splits
    the two halves back apart).

    Examples: {"prompt": str, "chosen": str, "reject": str}; optional
    per-side prompts "chosen_prompt"/"reject_prompt" override "prompt"
    (the reference supports asymmetric prompts, `general_collator.py:37-46`).
    """

    def __call__(self, examples: Sequence[Dict[str, str]]) -> Dict[str, np.ndarray]:
        rows, mask = [], []
        for side, pkey in (("chosen", "chosen_prompt"),
                           ("reject", "reject_prompt")):
            for ex in examples:
                p = self.encode(ex.get(pkey) or ex["prompt"])
                r = self.encode(ex[side])
                if self.eos_id is not None:
                    r = r + [self.eos_id]
                rows.append(p + r)
                mask.append(len(p))
        out = self._batch(rows, mask)
        # all-masked rows feed NaN into a mean-over-labels loss (the
        # reference hit exactly this, `general_collator.py:58` FIXME);
        # guarantee at least the final token carries a label
        for i in range(len(rows)):
            if out["lengths"][i] and not (out["labels"][i] != IGNORE_INDEX).any():
                j = out["lengths"][i] - 1
                out["labels"][i, j] = out["input_ids"][i, j]
        return out


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
