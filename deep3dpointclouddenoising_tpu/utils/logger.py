"""Logging setup (stand-in for the detectron2-style logger in
/root/reference/u_net_arch/utils/logger.py:31-95): stdout on process 0,
per-process files otherwise."""
from __future__ import annotations

import functools
import logging
import os
import sys


@functools.lru_cache()
def setup_logger(output: str | None = None, distributed_rank: int = 0,
                 name: str = "d3pcd") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s",
        datefmt="%m/%d %H:%M:%S")
    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if output:
        os.makedirs(output, exist_ok=True)
        filename = os.path.join(output, "log.txt")
        if distributed_rank > 0:
            filename = f"{filename}.rank{distributed_rank}"
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricsWriter:
    """Scalar log: append-only JSONL always, plus TensorBoard event files
    when the `tensorboard` package is importable (the SummaryWriter of
    /root/reference/u_net_arch/train_dist.py:390-393,411-420 writes under
    TENSORBOARD_SUMMARIES/; here events live under <log_dir>/tb/).  JSONL
    stays the source of truth — `scripts/plot_metrics.py` reads it — and TB
    is best-effort so the framework has no hard dependency on it."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, filename)
        self._f = open(self._path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        import json
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._f.close()
