"""History plots + training diagnostics (matplotlib, import-optional).

Reference parity: fthmc/utils/plot_helpers.py (plot_metric/plot_history with
thermalization cut + thinning + multi-chain overlay :122-258; S vs -logq
linear-regression diagnostic :484-514; therm_arr :59-71). Live-notebook
plotting is intentionally dropped - headless TPU jobs stream JSONL metrics
instead (utils/logger.MetricsWriter); these functions render the end-of-run
figures.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["therm_arr", "plot_metric", "plot_history",
           "plot_action_logq_regression"]


def therm_arr(x: np.ndarray, therm_frac: float = 0.2, thin: int = 0):
    """Drop the first therm_frac of a series and optionally thin it; returns
    (steps, values). (reference plot_helpers.py:59-71)"""
    x = np.asarray(x)
    n0 = int(len(x) * therm_frac)
    x = x[n0:]
    steps = np.arange(n0, n0 + len(x))
    if thin and thin > 1:
        x, steps = x[::thin], steps[::thin]
    return steps, x


def plot_metric(y, *, key: str = "", therm_frac: float = 0.2, thin: int = 0,
                num_chains: int = 4, outdir: str | None = None,
                xlabel: str = "step", title: str = ""):
    """Plot one metric history (optionally (N, chains) -> overlay first
    `num_chains` chains + mean). (reference plot_helpers.py:122-198)"""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    y = np.asarray(y)
    steps, y = therm_arr(y, therm_frac, thin)
    fig, ax = plt.subplots(figsize=(6, 3), constrained_layout=True)
    if y.ndim == 2:
        for c in range(min(num_chains, y.shape[1])):
            ax.plot(steps, y[:, c], alpha=0.4, lw=0.8)
        ax.plot(steps, y.mean(axis=1), color="k", lw=1.2, label="mean")
        ax.legend(loc="best", fontsize=8)
    else:
        ax.plot(steps, y, lw=0.9)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(key)
    if title:
        ax.set_title(title, fontsize=9)
    if outdir is not None:
        os.makedirs(outdir, exist_ok=True)
        fname = os.path.join(outdir, f"{key or 'metric'}.png")
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return fname
    return fig


def plot_history(history: dict, *, therm_frac: float = 0.2, thin: int = 0,
                 num_chains: int = 4, outdir: str | None = None,
                 xlabel: str = "step", skip: tuple[str, ...] = (),
                 title: str = ""):
    """Plot every metric in a history dict to outdir.
    (reference plot_helpers.py:201-258)"""
    out = {}
    for key, val in history.items():
        if key in skip:
            continue
        try:
            arr = np.asarray(val, dtype=np.float64)
        except (TypeError, ValueError):
            continue
        if arr.ndim == 0 or len(arr) < 2:
            continue
        out[key] = plot_metric(arr, key=key, therm_frac=therm_frac,
                               thin=thin, num_chains=num_chains,
                               outdir=outdir, xlabel=xlabel, title=title)
    return out


def plot_action_logq_regression(S: np.ndarray, logq: np.ndarray,
                                outdir: str | None = None):
    """S vs -logq scatter with a least-squares fit; a well-trained flow has
    slope ~1 (self-consistency diagnostic, reference plot_helpers.py:484-514).
    Returns (slope, intercept[, figure path])."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    S = np.asarray(S, np.float64).ravel()
    nlq = -np.asarray(logq, np.float64).ravel()
    slope, intercept = np.polyfit(nlq, S, 1)
    fig, ax = plt.subplots(figsize=(4, 4), constrained_layout=True)
    ax.plot(nlq, S, ".", ms=2, alpha=0.5)
    xs = np.linspace(nlq.min(), nlq.max(), 10)
    ax.plot(xs, slope * xs + intercept, "r-", lw=1,
            label=f"fit: slope={slope:.3f}")
    ax.set_xlabel(r"$-\log q$")
    ax.set_ylabel(r"$S$")
    ax.legend(fontsize=8)
    if outdir is not None:
        os.makedirs(outdir, exist_ok=True)
        fname = os.path.join(outdir, "action_vs_logq.png")
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return slope, intercept, fname
    return slope, intercept, fig
