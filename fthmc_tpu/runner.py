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
# Declarative stage queue (round-4; v2 in round-5): one master that
# survives VM recycles AND plan edits.
#
# Round-3 lost three experiment stages to VM recycles because each stage
# lived in an ad-hoc `setsid nohup bash run_chain_stageN.sh` chained on a
# PID: a recycled VM forgot what had finished and what was queued. The
# queue makes the experiment plan DATA (a JSON file, committed with the
# repo) and completion DURABLE (marker files + copied artifacts): a killed
# VM resumes with the one command
#
#     python -m fthmc_tpu.runner --queue experiments/queue_round5.json
#
# skipping every stage whose marker (or declared artifact) already exists.
#
# v2 (round-5, judge items): the plan file is RE-READ at every stage
# boundary, so editing/appending stages to the committed JSON takes effect
# on a RUNNING master without the round-4 follower-process workaround;
# `depends_on` lets a failed parent auto-moot children (durable .moot
# marker recording why); stages with a .failed marker are SKIPPED by
# default (re-run via --retry-failed or --only NAME) instead of re-burning
# their timeout on every invocation; stage cmds run from the repo root
# regardless of the master's launch CWD, and all relative paths in the
# plan (marker_dir, clean, artifacts, done_when) resolve against it.
#
# Stage schema (JSON object per stage):
#   name         unique id; marker file is <marker_dir>/<name>.done
#   cmd          argv list, run with cwd = the queue root (the first
#                ancestor of the queue file containing pyproject.toml or
#                .git, overridable with a queue-level "cwd" key resolved
#                relative to the queue file); inherits env
#   timeout      outer wall bound, seconds (default 3600) — the child
#                harnesses carry their own SIGALRM block watchdogs; this
#                is the last-resort reaper
#   artifacts    list of [src, dst] copies performed on success (dst dirs
#                are created); the stage FAILS if a src is missing
#   done_when    optional path: if it exists and is non-empty the stage is
#                considered already complete (lets pre-queue manual runs
#                count); run_queue then backfills the .done marker so the
#                verdict survives the artifact (runs/ dies with the VM)
#   clean        list of paths removed before every attempt (the stage-21b
#                lesson: incremental scan.json files from a dead attempt
#                poison the retry)
#   retries      re-runs after failure/timeout (default 1), retry_sleep
#                seconds between (default 90 — axon worker recovery time)
#   cooldown     sleep after success (default 30: let the worker settle
#                between device-heavy stages)
#   depends_on   list of stage names that must be 'done' first: a failed/
#                moot/unknown dependency MOOTS this stage (durable .moot
#                marker, never runs); a pending dependency defers it
#   continue_on_fail  default true: record <name>.failed and move on
#                (later stages usually probe different cells); false
#                aborts the queue.
# No reference counterpart: nftqcd/fthmc has no experiment infra at all.

def _now() -> str:
    return time.strftime("%Y-%m-%d %H:%M:%S")


def _queue_root(path: str, q: dict) -> str:
    """Directory stage cmds run from and relative plan paths resolve
    against: an explicit queue-level "cwd" (relative to the queue file),
    else the nearest ancestor of the queue file that looks like a repo
    root (pyproject.toml / .git), else the queue file's directory."""
    qdir = os.path.dirname(os.path.abspath(path))
    if "cwd" in q:
        c = q["cwd"]
        return os.path.normpath(c if os.path.isabs(c)
                                else os.path.join(qdir, c))
    d = qdir
    while True:
        if (os.path.exists(os.path.join(d, "pyproject.toml"))
                or os.path.exists(os.path.join(d, ".git"))):
            return d
        parent = os.path.dirname(d)
        if parent == d:
            return qdir
        d = parent


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
        if not isinstance(s.get("depends_on", []), list):
            raise ValueError(
                f"stage {s.get('name')}: depends_on must be a name list")
    root = _queue_root(path, q)
    q["_root"] = root
    mdir = q.get("marker_dir", "artifacts/queue_markers")
    q["marker_dir"] = mdir if os.path.isabs(mdir) else os.path.join(root, mdir)
    return q


def _rp(q: dict, p: str) -> str:
    """Resolve a plan-relative path against the queue root."""
    return p if os.path.isabs(p) else os.path.join(q["_root"], p)


def stage_status(q: dict, stage: dict) -> str:
    """'done' | 'failed' | 'moot' | 'pending' from durable on-disk state."""
    mdir = q["marker_dir"]
    if os.path.exists(os.path.join(mdir, stage["name"] + ".done")):
        return "done"
    dw = stage.get("done_when")
    if dw:
        dw = _rp(q, dw)
        if os.path.exists(dw) and os.path.getsize(dw) > 0:
            return "done"
    if os.path.exists(os.path.join(mdir, stage["name"] + ".failed")):
        return "failed"
    if os.path.exists(os.path.join(mdir, stage["name"] + ".moot")):
        return "moot"
    return "pending"


def _run_stage_once(q: dict, stage: dict, log_path: str) -> bool:
    import subprocess
    for p in stage.get("clean", []):
        p = _rp(q, p)
        if os.path.exists(p):
            os.remove(p)
    timeout = stage.get("timeout", 3600)
    with open(log_path, "a") as log:
        log.write(f"\n=== [{_now()}] {stage['name']}: "
                  f"{' '.join(stage['cmd'])} (timeout {timeout}s, "
                  f"cwd {q['_root']})\n")
        log.flush()
        try:
            rc = subprocess.run(stage["cmd"], stdout=log, stderr=log,
                                timeout=timeout, cwd=q["_root"]).returncode
        except subprocess.TimeoutExpired:
            log.write(f"=== [{_now()}] TIMEOUT after {timeout}s\n")
            return False
        log.write(f"=== [{_now()}] exit {rc}\n")
    if rc != 0:
        return False
    for src, dst in stage.get("artifacts", []):
        src, dst = _rp(q, src), _rp(q, dst)
        if not os.path.exists(src):
            with open(log_path, "a") as log:
                log.write(f"=== missing artifact {src}\n")
            return False
        try:
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            import shutil
            if os.path.isdir(src):
                # checkpoint directories must survive VM recycles too
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy2(src, dst)
        except OSError as e:
            # a copy failure is a STAGE failure, never a master death
            # (round-5: an uncaught IsADirectoryError killed the master)
            with open(log_path, "a") as log:
                log.write(f"=== artifact copy failed {src} -> {dst}: "
                          f"{e}\n")
            return False
    return True


def _write_marker(mdir: str, name: str, kind: str, text: str = "") -> None:
    with open(os.path.join(mdir, name + "." + kind), "w") as f:
        f.write(_now() + ("\n" + text if text else "") + "\n")


def _pick_next(q: dict, only, retry_failed, ran: set):
    """Next actionable stage in plan order, or None. Side effects:
    backfills .done markers for done_when-satisfied stages and writes
    .moot markers for children of failed/moot/unknown dependencies."""
    mdir = q["marker_dir"]
    stages = {s["name"]: s for s in q["stages"]}
    for s in q["stages"]:
        name = s["name"]
        if only and name != only:
            continue
        st = stage_status(q, s)
        if st == "done":
            if not os.path.exists(os.path.join(mdir, name + ".done")):
                _write_marker(mdir, name, "done",
                              "backfilled from done_when "
                              + str(s.get("done_when")))
                print(f"[queue] {name}: done_when satisfied, marker "
                      "backfilled", flush=True)
            continue
        if st in ("failed", "moot"):
            if not (retry_failed or only == name) or name in ran:
                continue
            for kind in ("failed", "moot"):
                mk = os.path.join(mdir, name + "." + kind)
                if os.path.exists(mk):
                    os.remove(mk)      # explicit re-run
        if name in ran:
            continue                   # already attempted this invocation
        deps = s.get("depends_on", [])
        dep_st = [stage_status(q, stages[d]) if d in stages else "unknown"
                  for d in deps]
        bad = [f"{d}={st_}" for d, st_ in zip(deps, dep_st)
               if st_ in ("failed", "moot", "unknown")]
        if bad:
            _write_marker(mdir, name, "moot",
                          "MOOT: dependency " + ", ".join(bad))
            print(f"[queue] {name}: MOOT ({', '.join(bad)})", flush=True)
            continue
        if any(st_ != "done" for st_ in dep_st):
            continue                   # dependency still pending: defer
        return s
    return None


def run_queue(path: str, only: str | None = None,
              retry_sleep_default: float = 90.0,
              retry_failed: bool = False) -> dict:
    """Execute a stage-queue file; returns {name: status}. Safe to re-run:
    completed stages (durable markers / done_when artifacts) are skipped,
    so a recycled VM resumes with the same command. The plan JSON is
    re-read before every stage, so edits to it land on a running master;
    failed stages are skipped unless retry_failed (or --only NAME)."""
    ran: set[str] = set()
    aborted = False
    last_good: dict | None = None
    while not aborted:
        # re-read: plan edits take effect here. A torn/invalid edit must
        # not kill the long-lived master — retry briefly, then fall back
        # to the last good plan (preserving the v1 guarantee).
        q, err = None, None
        for attempt in range(3):
            try:
                q = load_queue(path)
                last_good = q
                break
            except Exception as e:
                err = e
                print(f"[queue] plan re-read failed ({e}); "
                      f"{'retrying' if attempt < 2 else 'using last-good'}",
                      flush=True)
                time.sleep(5)
        if q is None:
            if last_good is None:
                raise err
            q = last_good
        os.makedirs(q["marker_dir"], exist_ok=True)
        stage = _pick_next(q, only, retry_failed, ran)
        if stage is None:
            break
        name = stage["name"]
        ran.add(name)
        log_path = os.path.join(q["marker_dir"], name + ".log")
        attempts = 1 + int(stage.get("retries", 1))
        ok = False
        for attempt in range(attempts):
            print(f"[queue] {name}: attempt {attempt + 1}/{attempts} "
                  f"({_now()})", flush=True)
            ok = _run_stage_once(q, stage, log_path)
            if ok:
                break
            if attempt + 1 < attempts:
                time.sleep(stage.get("retry_sleep", retry_sleep_default))
        _write_marker(q["marker_dir"], name, "done" if ok else "failed")
        print(f"[queue] {name}: {'DONE' if ok else 'FAILED'}", flush=True)
        if ok:
            time.sleep(stage.get("cooldown", 30))
        elif not stage.get("continue_on_fail", True):
            print("[queue] aborting (continue_on_fail=false)", flush=True)
            aborted = True
    q = load_queue(path)
    results = {}
    for s in q["stages"]:
        results[s["name"]] = stage_status(q, s)
        if aborted and s["name"] == name:
            break                      # match v1's truncated-on-abort shape
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
    p.add_argument("--retry-failed", action="store_true",
                   help="re-attempt stages with .failed/.moot markers")
    args = p.parse_args(argv)
    if args.status:
        print(json.dumps(queue_status(args.queue), indent=1))
        return
    results = run_queue(args.queue, only=args.only,
                        retry_failed=args.retry_failed)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    _queue_main()
