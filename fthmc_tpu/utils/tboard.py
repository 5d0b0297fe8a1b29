"""Optional TensorBoard summary writer.

Reference parity: scalar + histogram writes under 'training/', 'inference/',
'ftHMC/' prefixes with NaN-row dropping (fthmc/train.py:149-155,
ft_hmc.py:72-100, utils/inference.py:12-19,52-72). Import of tensorboard is
deferred and failure-tolerant; JSONL (utils/logger.MetricsWriter) remains
the primary metrics stream.
"""
from __future__ import annotations

import numpy as np

__all__ = ["TBWriter", "drop_nans"]


def drop_nans(x: np.ndarray) -> np.ndarray:
    """Drop rows containing NaNs before histogramming (reference
    inference.py:12-19)."""
    x = np.asarray(x)
    if x.ndim == 1:
        return x[np.isfinite(x)]
    mask = np.isfinite(x).all(axis=tuple(range(1, x.ndim)))
    return x[mask]


class TBWriter:
    """Thin wrapper; no-ops if tensorboard is unavailable."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(log_dir=logdir)
        except Exception:
            self._w = None

    def write(self, metrics: dict, step: int, prefix: str = "training"):
        """Scalars for 0/1-dim values (mean-reduced), histograms for >=2-dim.
        (reference write_summaries, train.py:149-155 / ft_hmc.py:72-100)"""
        if self._w is None:
            return
        for key, val in metrics.items():
            if key == "traj":
                continue
            arr = np.asarray(val)
            tag = f"{prefix}/{key}"
            if arr.ndim > 1:
                arr = drop_nans(arr)
                if arr.size:
                    self._w.add_histogram(tag, arr, global_step=step)
            else:
                v = float(np.mean(arr))
                if np.isfinite(v):
                    self._w.add_scalar(tag, v, global_step=step)

    def close(self):
        if self._w is not None:
            self._w.close()
