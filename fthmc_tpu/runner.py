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

__all__ = ["run_resilient", "BlockTimeout", "run_queue", "queue_status",
           "load_queue", "stage_status"]


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


# ---------------------------------------------------------------------------
# Declarative stage queue (round-4): one master that survives VM recycles.
#
# Round-3 lost three experiment stages to VM recycles because each stage
# lived in an ad-hoc `setsid nohup bash run_chain_stageN.sh` chained on a
# PID: a recycled VM forgot what had finished and what was queued. The
# queue makes the experiment plan DATA (a JSON file, committed with the
# repo) and completion DURABLE (marker files + copied artifacts): a killed
# VM resumes with the one command
#
#     python -m fthmc_tpu.runner --queue experiments/queue_round4.json
#
# skipping every stage whose marker (or declared artifact) already exists.
#
# Stage schema (JSON object per stage):
#   name         unique id; marker file is <marker_dir>/<name>.done
#   cmd          argv list (run from the repo root, inherits env)
#   timeout      outer wall bound, seconds (default 3600) — the child
#                harnesses carry their own SIGALRM block watchdogs; this
#                is the last-resort reaper
#   artifacts    list of [src, dst] copies performed on success (dst dirs
#                are created); the stage FAILS if a src is missing
#   done_when    optional path: if it exists and is non-empty the stage is
#                considered already complete (lets pre-queue manual runs
#                count); the .done marker is then backfilled
#   clean        list of paths removed before every attempt (the stage-21b
#                lesson: incremental scan.json files from a dead attempt
#                poison the retry)
#   retries      re-runs after failure/timeout (default 1), retry_sleep
#                seconds between (default 90 — axon worker recovery time)
#   cooldown     sleep after success (default 30: let the worker settle
#                between device-heavy stages)
#   continue_on_fail  default true: record <name>.failed and move on
#                (later stages usually probe different cells); false
#                aborts the queue.
# No reference counterpart: nftqcd/fthmc has no experiment infra at all.

def _now() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")


def load_queue(path: str) -> dict:
    import json
    with open(path) as f:
        q = json.load(f)
    names = [s["name"] for s in q["stages"]]
    if len(names) != len(set(names)):
        raise ValueError(f"duplicate stage names in {path}")
    for s in q["stages"]:
        if not isinstance(s.get("cmd"), list):
            raise ValueError(f"stage {s.get('name')}: cmd must be an argv list")
    q.setdefault("marker_dir", "artifacts/queue_markers")
    return q


def stage_status(q: dict, stage: dict) -> str:
    """'done' | 'failed' | 'pending' from durable on-disk state."""
    mdir = q["marker_dir"]
    if os.path.exists(os.path.join(mdir, stage["name"] + ".done")):
        return "done"
    dw = stage.get("done_when")
    if dw and os.path.exists(dw) and os.path.getsize(dw) > 0:
        return "done"
    if os.path.exists(os.path.join(mdir, stage["name"] + ".failed")):
        return "failed"
    return "pending"


def _run_stage_once(stage: dict, log_path: str) -> bool:
    import subprocess
    for p in stage.get("clean", []):
        if os.path.exists(p):
            os.remove(p)
    timeout = stage.get("timeout", 3600)
    with open(log_path, "a") as log:
        log.write(f"\n=== [{_now()}] {stage['name']}: "
                  f"{' '.join(stage['cmd'])} (timeout {timeout}s)\n")
        log.flush()
        try:
            rc = subprocess.run(stage["cmd"], stdout=log, stderr=log,
                                timeout=timeout).returncode
        except subprocess.TimeoutExpired:
            log.write(f"=== [{_now()}] TIMEOUT after {timeout}s\n")
            return False
        log.write(f"=== [{_now()}] exit {rc}\n")
    if rc != 0:
        return False
    for src, dst in stage.get("artifacts", []):
        if not os.path.exists(src):
            with open(log_path, "a") as log:
                log.write(f"=== missing artifact {src}\n")
            return False
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        import shutil
        shutil.copy2(src, dst)
    return True


def run_queue(path: str, only: str | None = None,
              retry_sleep_default: float = 90.0) -> dict:
    """Execute a stage-queue file; returns {name: status}. Safe to re-run:
    completed stages (durable markers / done_when artifacts) are skipped,
    so a recycled VM resumes with the same command."""
    q = load_queue(path)
    mdir = q["marker_dir"]
    os.makedirs(mdir, exist_ok=True)
    results = {}
    for stage in q["stages"]:
        name = stage["name"]
        if only and name != only:
            results[name] = stage_status(q, stage)
            continue
        st = stage_status(q, stage)
        if st == "done":
            print(f"[queue] {name}: already done, skipping", flush=True)
            results[name] = "done"
            continue
        failed_marker = os.path.join(mdir, name + ".failed")
        if os.path.exists(failed_marker):
            os.remove(failed_marker)   # explicit re-run of a failed stage
        log_path = os.path.join(mdir, name + ".log")
        attempts = 1 + int(stage.get("retries", 1))
        ok = False
        for attempt in range(attempts):
            print(f"[queue] {name}: attempt {attempt + 1}/{attempts} "
                  f"({_now()})", flush=True)
            ok = _run_stage_once(stage, log_path)
            if ok:
                break
            if attempt + 1 < attempts:
                time.sleep(stage.get("retry_sleep", retry_sleep_default))
        marker = os.path.join(mdir, name + (".done" if ok else ".failed"))
        with open(marker, "w") as f:
            f.write(_now() + "\n")
        results[name] = "done" if ok else "failed"
        print(f"[queue] {name}: {'DONE' if ok else 'FAILED'}", flush=True)
        if ok:
            time.sleep(stage.get("cooldown", 30))
        elif not stage.get("continue_on_fail", True):
            print("[queue] aborting (continue_on_fail=false)", flush=True)
            break
    return results


def queue_status(path: str) -> dict:
    q = load_queue(path)
    return {s["name"]: stage_status(q, s) for s in q["stages"]}


def _queue_main(argv=None):
    import argparse
    import json
    p = argparse.ArgumentParser(
        description="Declarative experiment stage queue (resumable)")
    p.add_argument("--queue", required=True, help="queue JSON file")
    p.add_argument("--status", action="store_true",
                   help="print per-stage status and exit")
    p.add_argument("--only", default=None, help="run a single stage")
    args = p.parse_args(argv)
    if args.status:
        print(json.dumps(queue_status(args.queue), indent=1))
        return
    results = run_queue(args.queue, only=args.only)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    _queue_main()
