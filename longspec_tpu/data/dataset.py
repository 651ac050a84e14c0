"""Dataset loading: json/jsonl/parquet-free mapping datasets with aligners.

TPU-native equivalent of the reference data pipeline
(`longspec/train/data/combine_dataset.py:202-291` MultiMappingDataset,
`data/input_aligner.py` aligners): a read function loads raw records, a
chain of aligners reshapes them, an optional template renders text fields,
and a kv-mapping renames keys — all plain Python, independent of any
training framework.
"""
from __future__ import annotations

import glob as globlib
import json
import os
from typing import Callable, Dict, List, Optional, Sequence


def read_json(path: str) -> List[Dict]:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):  # {"data": [...]} wrappers
        for v in data.values():
            if isinstance(v, list):
                return v
    return data


def read_jsonl(path: str) -> List[Dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def read_any(path: str) -> List[Dict]:
    return read_jsonl(path) if path.endswith((".jsonl", ".ndjson")) else read_json(path)


# ---------------------------------------------------------------------------
# Aligners (ref input_aligner.py)
# ---------------------------------------------------------------------------

def add_id_aligner(records: List[Dict], key: str = "id") -> List[Dict]:
    """Attach a running integer id (ref `input_aligner.py:125`)."""
    for i, r in enumerate(records):
        r.setdefault(key, i)
    return records


def concat_aligner(fields: Sequence[str], out: str = "text",
                   sep: str = "\n") -> Callable[[List[Dict]], List[Dict]]:
    def fn(records: List[Dict]) -> List[Dict]:
        for r in records:
            r[out] = sep.join(str(r.get(f, "")) for f in fields)
        return records
    return fn


def filter_aligner(pred: Callable[[Dict], bool]) -> Callable[[List[Dict]], List[Dict]]:
    def fn(records: List[Dict]) -> List[Dict]:
        return [r for r in records if pred(r)]
    return fn


class MappingDataset:
    """records = kv_map(template(aligners(read_fn(path)))).

    Mirrors `combine_dataset.py:202-291`: `template` is a Python
    format-string rendered per record into `template_key`; `kv_mapping`
    renames keys for the collator.
    """

    def __init__(self, path: str,
                 read_fn: Callable[[str], List[Dict]] = read_any,
                 aligners: Sequence[Callable] = (),
                 template: Optional[str] = None,
                 template_key: str = "prompt",
                 kv_mapping: Optional[Dict[str, str]] = None):
        records = read_fn(path)
        for a in aligners:
            records = a(records)
        if template is not None:
            for r in records:
                r[template_key] = template.format(**r)
        if kv_mapping:
            records = [{dst: r[src] for src, dst in kv_mapping.items()}
                       for r in records]
        self.records = records

    def __len__(self):
        return len(self.records)

    def __getitem__(self, i):
        return self.records[i]


class MultiMappingDataset:
    """Concatenation of MappingDatasets over a glob of files (the reference
    trains per-file with its own DataLoader per epoch, `trainer…:216-235`;
    we expose both the flat view and per-file chunks)."""

    def __init__(self, pattern: str, **kw):
        self.paths = sorted(globlib.glob(os.path.expanduser(pattern)))
        if not self.paths:
            raise FileNotFoundError(f"no files match {pattern}")
        self.datasets = [MappingDataset(p, **kw) for p in self.paths]
        self._index = [(di, ri) for di, d in enumerate(self.datasets)
                       for ri in range(len(d))]

    def __len__(self):
        return len(self._index)

    def __getitem__(self, i):
        di, ri = self._index[i]
        return self.datasets[di][ri]

    def per_file(self):
        return list(zip(self.paths, self.datasets))


def batches(dataset, collator, batch_size: int, *, shuffle: bool = True,
            seed: int = 0, drop_last: bool = True,
            dp_rank: int = 0, dp_size: int = 1):
    """Simple epoch iterator with data-parallel sharding (the reference's
    DistributedSampler, `dist_utils.py:112-123`): rank r takes every
    dp_size-th batch."""
    import numpy as np
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    n_full = len(idx) // batch_size
    for bi in range(n_full if drop_last else -(-len(idx) // batch_size)):
        if bi % dp_size != dp_rank:
            continue
        sel = idx[bi * batch_size:(bi + 1) * batch_size]
        yield collator([dataset[int(i)] for i in sel])
