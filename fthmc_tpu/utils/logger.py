"""Console + JSONL metric logging.

Reference parity: fthmc/utils/logger.py (rich-console metric lines with
windowed moving averages, strformat :97-156) without the rich dependency -
plain ANSI-free lines that render the same information; plus a JSONL metrics
writer (the TPU-friendly replacement for TensorBoard scalars; TB itself is
optional via utils/tboard.py).
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Any

import numpy as np

__all__ = ["Logger", "MetricsWriter", "format_metrics"]


def _to_scalar(v: Any):
    a = np.asarray(v)
    if a.size == 1:
        return a.reshape(()).item()
    return float(np.mean(a))


def format_metrics(metrics: dict[str, Any], window: int = 0,
                   history: dict[str, list] | None = None,
                   skip: tuple[str, ...] = ()) -> str:
    """One metric line: key=value with 4-sig-fig floats; if `window` and a
    history are given, values are trailing-window means (reference
    logger.strformat/moving averages, logger.py:97-156)."""
    parts = []
    for k, v in metrics.items():
        if k in skip:
            continue
        if window and history is not None and k in history:
            vals = history[k][-window:]
            v = np.mean([_to_scalar(x) for x in vals])
        v = _to_scalar(v)
        if isinstance(v, float):
            parts.append(f"{k}={v:.4g}")
        else:
            parts.append(f"{k}={v}")
    return " ".join(parts)


class Logger:
    """Minimal structured console logger."""

    def __init__(self, stream: IO | None = None):
        self._stream = stream  # None -> current sys.stdout at call time
        self.t0 = time.time()

    @property
    def stream(self) -> IO:
        return self._stream if self._stream is not None else sys.stdout

    def log(self, msg: str):
        dt = time.time() - self.t0
        self.stream.write(f"[{dt:9.2f}s] {msg}\n")
        self.stream.flush()

    def rule(self, title: str = "", width: int = 72):
        pad = max(width - len(title) - 2, 4)
        left = pad // 2
        self.log("-" * left + f" {title} " + "-" * (pad - left))

    def print_metrics(self, metrics: dict, pre: list[str] | None = None,
                      skip: tuple[str, ...] = (), window: int = 0,
                      history: dict | None = None) -> str:
        s = format_metrics(metrics, window=window, history=history, skip=skip)
        if pre:
            s = " ".join(pre) + " " + s
        self.log(s)
        return s


class MetricsWriter:
    """Append-only JSONL metrics file: one {'step': n, ...} object per line.

    Plays the role of the reference's TensorBoard scalar streams
    (train.py:149-155, ft_hmc.py:72-100) in a greppable format.
    """

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, metrics: dict[str, Any], prefix: str = ""):
        rec = {"step": int(step)}
        for k, v in metrics.items():
            kk = f"{prefix}/{k}" if prefix else k
            try:
                rec[kk] = _to_scalar(v)
            except Exception:
                continue
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
