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
    """Append-only JSONL scalar log (the TensorBoard-SummaryWriter
    equivalent of /root/reference/u_net_arch/train_dist.py:390-393,411-420;
    JSONL keeps the framework dependency-free and machine-readable)."""

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, filename)
        self._f = open(self._path, "a")

    def add_scalar(self, tag: str, value, step: int) -> None:
        import json
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
