"""Resilient long-run driver: block + persist + resume + watchdog.

Production pattern for long sampler chains on preemptible / flaky
accelerator workers (the axon TPU worker dies SILENTLY under sustained
heavy programs — the sync blocks forever instead of raising; observed
repeatedly in round 3). Every headline tau_int chain in BENCH.md round 3
ran through this loop; this module is the tested, packaged form (the
experiments/ harnesses are thin wrappers over it).

No reference counterpart: nftqcd/fthmc's drivers are single in-process
loops with no persistence (fthmc/hmc.py run_hmc; a crash loses the run).

Semantics:
  - the chain advances in compiled blocks of <= `block` trajectories
    (keeps device executions short — the infra rule from CLAUDE.md);
  - after every block the FULL state (fields, RNG key, trajectory count,
    metric history) is written to `state_path` (uncompressed npz: the
    O(ntraj) re-save must stay cheap late in long runs);
  - on restart with the same `state_path` the run resumes at the last
    persisted block — crashes lose at most one block;
  - a SIGALRM watchdog bounds each block's wall time (first block gets
    `block_timeout` for compile headroom; later blocks 6x their own
    measured wall) and treats a hang as a retryable failure.
"""
from __future__ import annotations

import os
import signal
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["run_resilient", "BlockTimeout"]


class BlockTimeout(Exception):
    """A compiled block exceeded its wall-time budget (silent worker
    death on the axon tunnel presents as an infinite sync)."""


def _default_sync(z) -> None:
    # block_until_ready is not a reliable fence through the axon tunnel;
    # a device reduction + host transfer is (CLAUDE.md infra notes)
    float(jnp.sum(z))


def run_resilient(step_fn: Callable, z0, *, key, ntraj: int, block: int,
                  state_path: str | None = None,
                  hist_fields: tuple[str, ...] = ("acc", "plaq",
                                                  "exp_mdh", "q"),
                  block_timeout: int = 900, retry_sleep: float = 30.0,
                  max_retries: int | None = None, sync=None,
                  on_block: Callable | None = None):
    """Drive `step_fn` to `ntraj` trajectories with persistence + watchdog.

    step_fn(key, z, n) -> (z_new, hist) where hist has (n, B) arrays as
    attributes or dict entries for each name in `hist_fields` (TrajMetrics
    works as-is). Returns (z, hist dict of host numpy (ntraj, B) arrays,
    info dict with done/wall_s/s_per_traj for the trajectories advanced in
    THIS process).

    state_path=None disables persistence (plain blocked run with the
    watchdog). max_retries=None retries forever (production); tests pass a
    small bound so a dead step fails loudly instead of spinning.
    """
    if sync is None:
        sync = _default_sync
    z, hist, done = z0, {k: [] for k in hist_fields}, 0
    if state_path and os.path.exists(state_path):
        data = np.load(state_path)
        z = jnp.asarray(data["z"])
        key = jnp.asarray(data["key"])
        done = int(data["done"])
        hist = {k: list(data[k]) for k in hist_fields}

    def _alarm(signum, frame):
        raise BlockTimeout("block wall-time watchdog fired")

    old_handler = signal.signal(signal.SIGALRM, _alarm)
    t0 = time.time()
    advanced = 0
    block_wall = None
    retries = 0
    try:
        while done < ntraj:
            n = min(block, ntraj - done)
            key, krun = jax.random.split(key)
            budget = (block_timeout if block_wall is None
                      else min(block_timeout, int(6 * block_wall) + 60))
            tb = time.time()
            try:
                signal.alarm(budget)
                z_new, h = step_fn(krun, z, n)
                sync(z_new)
                signal.alarm(0)
            except Exception as e:  # BlockTimeout included; retry all
                signal.alarm(0)
                retries += 1
                if max_retries is not None and retries > max_retries:
                    raise
                kind = ("HUNG (watchdog)" if isinstance(e, BlockTimeout)
                        else f"failed ({str(e)[:80]})")
                print(f"  block at {done} {kind}; retry {retries} in "
                      f"{retry_sleep:.0f} s", flush=True)
                time.sleep(retry_sleep)
                continue
            block_wall = time.time() - tb
            z = z_new
            for k in hist_fields:
                v = getattr(h, k) if hasattr(h, k) else h[k]
                hist[k].extend(np.asarray(v))
            done += n
            advanced += n
            if state_path:
                np.savez(state_path, z=np.asarray(z), done=done,
                         key=np.asarray(key),
                         **{k: np.asarray(v) for k, v in hist.items()})
            if on_block is not None:
                on_block(done, h)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old_handler)
    wall = time.time() - t0
    info = {"done": done, "wall_s": wall,
            "s_per_traj": wall / advanced if advanced else float("nan"),
            "retries": retries}
    return z, {k: np.asarray(v) for k, v in hist.items()}, info
