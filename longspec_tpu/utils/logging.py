"""Observability: run logger, averaged metrics, and a metrics writer.

TPU-native equivalent of the reference's observability layer
(`longspec/train/general_util/logger.py`, `average_meter.py`,
`tensorboard_helper.py`): a root logger with a per-run file handler, an
AverageMeter whose `gather()` reduces across data-parallel processes with a
jax collective instead of torch.distributed all_gather
(`average_meter.py:52-65`), and a wandb-free MetricsWriter that appends
jsonl rows (chart mapping is the consumer's concern, mirroring
`WandbWriter`'s key->chart mapping, `tensorboard_helper.py:48-98`).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

_LOGGER_NAME = "longspec"


def setup_logger(output_dir: Optional[str] = None, rank: int = 0,
                 level: int = logging.INFO) -> logging.Logger:
    """Root package logger; rank 0 additionally logs to
    `{output_dir}/log.txt` (ref `logger.py:18-54`)."""
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    sh.setLevel(level if rank == 0 else logging.WARNING)
    logger.addHandler(sh)
    if output_dir and rank == 0:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_logger(name: str = "") -> logging.Logger:
    return logging.getLogger(f"{_LOGGER_NAME}.{name}" if name else _LOGGER_NAME)


class AverageMeter:
    """Running (sum, count) average (ref `average_meter.py:7-49`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def gather(self) -> float:
        """Cross-process mean under multi-host jax (ref all_gather reduce,
        `average_meter.py:52-65`); single-process: local avg."""
        import jax
        if jax.process_count() == 1:
            return self.avg
        import numpy as np
        from jax.experimental import multihost_utils
        arr = multihost_utils.process_allgather(
            np.asarray([self.sum, float(self.count)]))
        tot = arr.reshape(-1, 2).sum(axis=0)
        return float(tot[0] / max(tot[1], 1.0))


class MetricsWriter:
    """Append-only jsonl metrics stream + optional wandb passthrough.

    `log(step, {...})` appends one row; `summary()` keeps min/max/last like
    wandb summaries (`trainer…:201-208`). Rank-0 only by construction —
    create it only on process 0 (as the reference does wandb)."""

    def __init__(self, output_dir: str, run_name: str = "run",
                 use_wandb: bool = False, config: Optional[Dict] = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{run_name}.metrics.jsonl")
        self._f = open(self.path, "a")
        self._summary: Dict[str, float] = {}
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project="longspec_tpu", name=run_name,
                                         config=config or {})
            except Exception:
                self._wandb = None  # offline box: jsonl is the record
        if config is not None:
            with open(os.path.join(output_dir, f"{run_name}.config.json"),
                      "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, step: int, metrics: Dict[str, float]):
        row = {"step": int(step), "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        for k, v in row.items():
            if k in ("step", "time"):
                continue
            self._summary[f"{k}/last"] = v
            self._summary[f"{k}/min"] = min(v, self._summary.get(f"{k}/min", v))
            self._summary[f"{k}/max"] = max(v, self._summary.get(f"{k}/max", v))
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def summary(self) -> Dict[str, float]:
        return dict(self._summary)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
