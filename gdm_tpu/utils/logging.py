"""Elapsed-time logger (reference utils/logging.py:1-23) + jax profiler
trace helper (the reference has no structured profiling — SURVEY.md
section 5; wall-clock prints only, train_lm.py:275-283)."""

from __future__ import annotations

import contextlib
import logging
import time

_START = time.time()


class ElapsedFormatter(logging.Formatter):
    def format(self, record):
        elapsed = time.time() - _START
        h, rem = divmod(int(elapsed), 3600)
        m, s = divmod(rem, 60)
        record.elapsed = f"{h:02d}:{m:02d}:{s:02d}"
        return super().format(record)


def get_logger(name: str = "gdm_tpu", level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(ElapsedFormatter(
            "[%(elapsed)s %(name)s %(levelname)s] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(level)
        logger.propagate = False
    return logger


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace scope (no-op when log_dir is None).

    Usage: ``with profiler_trace('/tmp/tb'): run_steps()`` then inspect
    with TensorBoard / xprof.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class JsonlLogger:
    """Append-only JSONL metrics log (one dict per line, ts added).

    The reference's only training observability is a stdout print every
    100 iters (train_lm.py:275-283); this provides the machine-readable
    stream a tensorboard/W&B-style consumer (or plain `jq`) needs.
    Opens lazily and creates parent directories; `write` flushes per
    line so a crashed run keeps everything logged so far.
    """

    def __init__(self, path: str):
        self.path = path
        self._f = None

    def write(self, record: dict):
        import json
        import os

        if self._f is None:
            os.makedirs(os.path.dirname(os.path.abspath(self.path)),
                        exist_ok=True)
            self._f = open(self.path, "a")
        rec = {"ts": round(time.time(), 3)}
        rec.update(record)
        self._f.write(json.dumps(rec, default=float) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


class StepTimer:
    """Rolling per-phase wall-clock timer for train/eval loops."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0)
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1e3:.1f}ms"
            for k in self.totals)
