"""Logging + scalar summaries — equivalents of `softgroup/util/logger.py`
(rank-0-only file+stream logger, tensorboard-style scalar writer)."""

from __future__ import annotations

import json
import logging
import os
import time


def get_root_logger(log_file: str | None = None, rank: int = 0,
                    log_level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger('softgroup_tpu')
    if logger.handlers:
        return logger
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    fmt = logging.Formatter('%(asctime)s - %(levelname)s - %(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file and rank == 0:
        os.makedirs(os.path.dirname(log_file) or '.', exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class SummaryWriter:
    """Rank-0 scalar writer.  Writes JSONL (always) and tensorboard events
    when tensorboardX is importable — the reference depends on tensorboardX
    unconditionally (`logger.py:26-38`); here it is optional."""

    def __init__(self, log_dir: str, rank: int = 0):
        self.rank = rank
        self.tb = None
        if rank != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, 'scalars.jsonl')
        self._f = open(self.path, 'a')
        try:
            from tensorboardX import SummaryWriter as TBWriter
            self.tb = TBWriter(log_dir)
        except ImportError:
            pass

    def add_scalar(self, key: str, value, step: int):
        if self.rank != 0:
            return
        self._f.write(json.dumps(
            dict(t=time.time(), step=step, key=key, value=float(value))) + '\n')
        self._f.flush()
        if self.tb:
            self.tb.add_scalar(key, value, step)

    def flush(self):
        if self.rank == 0:
            self._f.flush()
            if self.tb:
                self.tb.flush()


def get_max_memory() -> int:
    """Peak device memory in MB across local devices — the TPU analogue of
    the reference's CUDA max_memory_allocated reduced over ranks
    (`softgroup/util/utils.py:148-154`).  Returns 0 when the backend does
    not expose memory stats (CPU)."""
    import jax
    peak = 0
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # noqa: BLE001 — stats are optional per backend
            continue
        peak = max(peak, stats.get('peak_bytes_in_use',
                                   stats.get('bytes_in_use', 0)))
    return peak // (1 << 20)


class AverageMeter:
    """Running average (`softgroup/util/utils.py:13-51`); cross-device
    averaging happens inside the jitted step, not here."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
