"""Resilient block+persist+resume driver (fthmc_tpu/runner.py) — the
packaged, tested form of the production long-run pattern every round-3
headline chain used (experiments/schwinger_tauint.py)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu.runner import BlockTimeout, run_resilient
from fthmc_tpu.schwinger import SchwingerConfig, _run_hmc_dyn_scan


def _toy_step(key, z, n):
    """Deterministic toy chain: z += 1 per 'trajectory'; per-traj metrics
    carry the running counter so resume gaps/overlaps are detectable."""
    base = z[0, 0, 0, 0]
    idx = base + 1.0 + jnp.arange(n, dtype=z.dtype)
    h = {"acc": jnp.tile(idx[:, None], (1, z.shape[0])),
         "plaq": jnp.zeros((n, z.shape[0])),
         "exp_mdh": jnp.ones((n, z.shape[0])),
         "q": jnp.zeros((n, z.shape[0]))}
    return z + n, h


def test_run_and_history_shapes(tmp_path):
    z0 = jnp.zeros((2, 2, 4, 4))
    z, hist, info = run_resilient(
        _toy_step, z0, key=jax.random.PRNGKey(0), ntraj=10, block=4,
        state_path=str(tmp_path / "s.npz"), max_retries=0)
    assert info["done"] == 10 and info["retries"] == 0
    assert hist["acc"].shape == (10, 2)
    # the counter metric is contiguous 1..10: no gaps, no repeats
    np.testing.assert_allclose(hist["acc"][:, 0], np.arange(1, 11))
    assert float(z[0, 0, 0, 0]) == 10.0


def test_resume_continues_exactly(tmp_path):
    """Kill after 6 of 10 trajectories; a fresh call with the same state
    file continues at 7 with no gap or overlap in the metric stream."""
    sp = str(tmp_path / "s.npz")
    z0 = jnp.zeros((2, 2, 4, 4))
    run_resilient(_toy_step, z0, key=jax.random.PRNGKey(0), ntraj=6,
                  block=3, state_path=sp, max_retries=0)
    # simulated restart: same state_path, full ntraj target
    z, hist, info = run_resilient(
        _toy_step, z0, key=jax.random.PRNGKey(0), ntraj=10, block=3,
        state_path=sp, max_retries=0)
    assert info["done"] == 10
    np.testing.assert_allclose(hist["acc"][:, 0], np.arange(1, 11))
    assert float(z[0, 0, 0, 0]) == 10.0


def test_watchdog_fires_and_bounded_retries(tmp_path):
    calls = []

    def hang_step(key, z, n):
        calls.append(n)
        time.sleep(5)
        return z, {k: jnp.zeros((n, z.shape[0]))
                   for k in ("acc", "plaq", "exp_mdh", "q")}

    with pytest.raises(BlockTimeout):
        run_resilient(hang_step, jnp.zeros((1, 2, 4, 4)),
                      key=jax.random.PRNGKey(0), ntraj=2, block=2,
                      block_timeout=1, retry_sleep=0.1, max_retries=2)
    assert len(calls) == 3  # first try + 2 retries, then it raises


def test_failing_step_retries_then_raises():
    def bad_step(key, z, n):
        raise RuntimeError("device exploded")

    with pytest.raises(RuntimeError):
        run_resilient(bad_step, jnp.zeros((1, 2, 4, 4)),
                      key=jax.random.PRNGKey(0), ntraj=2, block=2,
                      retry_sleep=0.05, max_retries=1)


def test_real_schwinger_chain_through_runner(tmp_path):
    """The actual dynamical-HMC scan through the packaged driver: exact
    physics (exp(-dH) ~ 1) and persisted/returned histories agree."""
    cfg = SchwingerConfig(L=4, beta=2.0, mass=0.3, tau=0.5, nstep=8,
                          n_chains=4, ntraj=0, cg_tol_force=1e-10,
                          cg_tol_mh=1e-12, cg_maxiter=300)
    sp = str(tmp_path / "s.npz")
    z0 = jnp.zeros((4, 2, 4, 4), jnp.float32)
    z, hist, info = run_resilient(
        lambda k, z, n: _run_hmc_dyn_scan(k, z, cfg, n), z0,
        key=jax.random.PRNGKey(1), ntraj=8, block=4, state_path=sp,
        max_retries=0)
    assert hist["acc"].shape == (8, 4)
    assert abs(hist["exp_mdh"].mean() - 1.0) < 0.2
    data = np.load(sp)
    assert int(data["done"]) == 8
    np.testing.assert_allclose(data["q"], hist["q"])


# ---------------------------------------------------------------------------
# Declarative stage queue (round-4)

import json
import os
import sys

from fthmc_tpu.runner import load_queue, queue_status, run_queue


def _q(tmp_path, stages):
    qf = tmp_path / "q.json"
    qf.write_text(json.dumps(
        {"marker_dir": str(tmp_path / "markers"), "stages": stages}))
    return str(qf)


def _touch_cmd(path):
    return [sys.executable, "-c",
            f"open({str(path)!r}, 'w').write('x')"]


def test_queue_runs_and_copies_artifacts(tmp_path):
    out = tmp_path / "out.json"
    dst = tmp_path / "artifacts" / "out.json"
    qf = _q(tmp_path, [{
        "name": "s1", "cmd": _touch_cmd(out), "timeout": 60,
        "cooldown": 0, "artifacts": [[str(out), str(dst)]]}])
    res = run_queue(qf)
    assert res == {"s1": "done"}
    assert dst.read_text() == "x"
    assert (tmp_path / "markers" / "s1.done").exists()


def test_queue_resume_skips_done_stages(tmp_path):
    out = tmp_path / "out.txt"
    qf = _q(tmp_path, [{"name": "s1", "cmd": _touch_cmd(out),
                        "cooldown": 0, "timeout": 60}])
    assert run_queue(qf) == {"s1": "done"}
    out.unlink()                      # if it re-ran, the file would return
    assert run_queue(qf) == {"s1": "done"}
    assert not out.exists()


def test_queue_done_when_counts_prequeue_artifact(tmp_path):
    dw = tmp_path / "already.json"
    dw.write_text("{}")
    boom = [sys.executable, "-c", "raise SystemExit(9)"]
    qf = _q(tmp_path, [{"name": "s1", "cmd": boom, "timeout": 60,
                        "cooldown": 0, "done_when": str(dw)}])
    assert run_queue(qf) == {"s1": "done"}   # never executed the cmd


def test_queue_failure_marks_and_continues(tmp_path):
    out = tmp_path / "second.txt"
    boom = [sys.executable, "-c", "raise SystemExit(1)"]
    qf = _q(tmp_path, [
        {"name": "bad", "cmd": boom, "timeout": 60, "retries": 1,
         "retry_sleep": 0.01, "cooldown": 0},
        {"name": "good", "cmd": _touch_cmd(out), "timeout": 60,
         "cooldown": 0},
    ])
    res = run_queue(qf)
    assert res == {"bad": "failed", "good": "done"}
    assert (tmp_path / "markers" / "bad.failed").exists()
    assert out.exists()
    assert queue_status(qf) == {"bad": "failed", "good": "done"}


def test_queue_abort_on_continue_on_fail_false(tmp_path):
    out = tmp_path / "never.txt"
    boom = [sys.executable, "-c", "raise SystemExit(1)"]
    qf = _q(tmp_path, [
        {"name": "bad", "cmd": boom, "timeout": 60, "retries": 0,
         "cooldown": 0, "continue_on_fail": False},
        {"name": "after", "cmd": _touch_cmd(out), "timeout": 60,
         "cooldown": 0},
    ])
    res = run_queue(qf)
    assert res == {"bad": "failed"}
    assert not out.exists()


def test_queue_clean_removes_stale_state(tmp_path):
    stale = tmp_path / "scan.json"
    stale.write_text("stale")
    # cmd asserts the stale file is gone, then writes fresh output
    cmd = [sys.executable, "-c",
           (f"import os; assert not os.path.exists({str(stale)!r}); "
            f"open({str(stale)!r}, 'w').write('fresh')")]
    qf = _q(tmp_path, [{"name": "s1", "cmd": cmd, "timeout": 60,
                        "cooldown": 0, "clean": [str(stale)]}])
    assert run_queue(qf) == {"s1": "done"}
    assert stale.read_text() == "fresh"


def test_queue_missing_artifact_fails_stage(tmp_path):
    ok = [sys.executable, "-c", "pass"]
    qf = _q(tmp_path, [{"name": "s1", "cmd": ok, "timeout": 60,
                        "retries": 0, "cooldown": 0,
                        "artifacts": [[str(tmp_path / "no.json"),
                                       str(tmp_path / "dst.json")]]}])
    assert run_queue(qf) == {"s1": "failed"}


def test_queue_timeout_reaps_stage(tmp_path):
    slow = [sys.executable, "-c", "import time; time.sleep(30)"]
    qf = _q(tmp_path, [{"name": "s1", "cmd": slow, "timeout": 1,
                        "retries": 0, "cooldown": 0}])
    assert run_queue(qf) == {"s1": "failed"}


def test_queue_only_runs_single_stage(tmp_path):
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    qf = _q(tmp_path, [
        {"name": "sa", "cmd": _touch_cmd(a), "timeout": 60, "cooldown": 0},
        {"name": "sb", "cmd": _touch_cmd(b), "timeout": 60, "cooldown": 0},
    ])
    res = run_queue(qf, only="sb")
    assert res["sb"] == "done" and res["sa"] == "pending"
    assert b.exists() and not a.exists()


def test_queue_rejects_duplicate_names_and_str_cmd(tmp_path):
    import pytest
    qf = _q(tmp_path, [{"name": "x", "cmd": ["true"]},
                       {"name": "x", "cmd": ["true"]}])
    with pytest.raises(ValueError):
        load_queue(qf)
    qf2 = _q(tmp_path, [{"name": "x", "cmd": "true"}])
    with pytest.raises(ValueError):
        load_queue(qf2)


# --- queue v2 (round-5): plan re-read, depends_on, failed-skip, cwd ------


def test_queue_rereads_plan_between_stages(tmp_path):
    """A stage appended to the JSON while the master runs is picked up at
    the next stage boundary (no follower process needed)."""
    qf = tmp_path / "q.json"
    s2_out = tmp_path / "s2.txt"
    plan2 = {"marker_dir": str(tmp_path / "markers"), "stages": [
        {"name": "s1", "cmd": ["true"], "timeout": 60, "cooldown": 0},
        {"name": "s2", "cmd": _touch_cmd(s2_out), "timeout": 60,
         "cooldown": 0}]}
    # s1's command rewrites the plan, appending s2
    append = [sys.executable, "-c",
              (f"import json; json.dump({plan2!r}, "
               f"open({str(qf)!r}, 'w'))")]
    qf.write_text(json.dumps(
        {"marker_dir": str(tmp_path / "markers"), "stages": [
            {"name": "s1", "cmd": append, "timeout": 60, "cooldown": 0}]}))
    res = run_queue(str(qf))
    assert res == {"s1": "done", "s2": "done"}
    assert s2_out.exists()


def test_queue_depends_on_moots_child_of_failed_parent(tmp_path):
    out = tmp_path / "child.txt"
    boom = [sys.executable, "-c", "raise SystemExit(1)"]
    qf = _q(tmp_path, [
        {"name": "parent", "cmd": boom, "timeout": 60, "retries": 0,
         "cooldown": 0},
        {"name": "child", "cmd": _touch_cmd(out), "timeout": 60,
         "cooldown": 0, "depends_on": ["parent"]},
        {"name": "orphan", "cmd": _touch_cmd(tmp_path / "o.txt"),
         "timeout": 60, "cooldown": 0, "depends_on": ["no_such_stage"]},
    ])
    res = run_queue(qf)
    assert res == {"parent": "failed", "child": "moot", "orphan": "moot"}
    moot = (tmp_path / "markers" / "child.moot").read_text()
    assert "parent=failed" in moot
    assert not out.exists()
    # durable: a fresh invocation leaves the moot stages alone
    assert queue_status(qf) == {"parent": "failed", "child": "moot",
                                "orphan": "moot"}


def test_queue_depends_on_runs_child_after_parent(tmp_path):
    order = tmp_path / "order.txt"
    mk = (lambda tag: [sys.executable, "-c",
                       f"open({str(order)!r}, 'a').write({tag!r})"])
    qf = _q(tmp_path, [
        {"name": "child", "cmd": mk("c"), "timeout": 60, "cooldown": 0,
         "depends_on": ["parent"]},
        {"name": "parent", "cmd": mk("p"), "timeout": 60, "cooldown": 0},
    ])
    res = run_queue(qf)
    assert res == {"child": "done", "parent": "done"}
    assert order.read_text() == "pc"   # parent ran first despite plan order


def test_queue_failed_stage_skipped_on_rerun(tmp_path):
    """A deterministically failing stage must not re-burn its timeout on
    every invocation (ADVICE round-4): skipped by default, re-run under
    retry_failed."""
    cnt = tmp_path / "count.txt"
    boom = [sys.executable, "-c",
            (f"open({str(cnt)!r}, 'a').write('x'); raise SystemExit(1)")]
    qf = _q(tmp_path, [{"name": "bad", "cmd": boom, "timeout": 60,
                        "retries": 0, "cooldown": 0}])
    assert run_queue(qf) == {"bad": "failed"}
    assert cnt.read_text() == "x"
    assert run_queue(qf) == {"bad": "failed"}      # skipped: no new attempt
    assert cnt.read_text() == "x"
    assert run_queue(qf, retry_failed=True) == {"bad": "failed"}
    assert cnt.read_text() == "xx"                 # explicit retry ran it
    assert run_queue(qf, only="bad") == {"bad": "failed"}
    assert cnt.read_text() == "xxx"                # --only also re-runs


def test_queue_done_when_backfills_marker(tmp_path):
    """done_when satisfaction must write the durable .done marker so the
    verdict survives the artifact (runs/ dies with the VM)."""
    dw = tmp_path / "pre.json"
    dw.write_text("{}")
    boom = [sys.executable, "-c", "raise SystemExit(9)"]
    qf = _q(tmp_path, [{"name": "s1", "cmd": boom, "timeout": 60,
                        "cooldown": 0, "done_when": str(dw)}])
    assert run_queue(qf) == {"s1": "done"}
    marker = tmp_path / "markers" / "s1.done"
    assert marker.exists() and "backfilled" in marker.read_text()
    dw.unlink()                        # artifact gone: marker still rules
    assert queue_status(qf) == {"s1": "done"}


def test_queue_relative_paths_resolve_against_queue_root(tmp_path):
    """Stage cmds run from the queue root (here: explicit "cwd" key) and
    relative clean/artifact/marker paths resolve against it, regardless
    of the master's launch CWD (ADVICE round-4)."""
    root = tmp_path / "repo"
    (root / "experiments").mkdir(parents=True)
    (root / "runs").mkdir()
    (root / "runs" / "stale.json").write_text("stale")
    qf = root / "experiments" / "q.json"
    cmd = [sys.executable, "-c",
           ("import os; assert not os.path.exists('runs/stale.json'); "
            "open('runs/out.json', 'w').write('x')")]
    qf.write_text(json.dumps({
        "cwd": "..", "marker_dir": "markers", "stages": [
            {"name": "s1", "cmd": cmd, "timeout": 60, "cooldown": 0,
             "clean": ["runs/stale.json"],
             "artifacts": [["runs/out.json", "artifacts/out.json"]]}]}))
    old = os.getcwd()
    os.chdir(tmp_path)                 # launch from OUTSIDE the root
    try:
        assert run_queue(str(qf)) == {"s1": "done"}
    finally:
        os.chdir(old)
    assert (root / "artifacts" / "out.json").read_text() == "x"
    assert (root / "markers" / "s1.done").exists()


def test_queue_root_autodetect_walks_to_repo_root(tmp_path):
    from fthmc_tpu.runner import _queue_root
    root = tmp_path / "proj"
    (root / "experiments").mkdir(parents=True)
    (root / "pyproject.toml").write_text("")
    assert _queue_root(str(root / "experiments" / "q.json"), {}) == str(root)
    # no pyproject/.git anywhere above: falls back to the file's dir
    bare = tmp_path / "bare"
    bare.mkdir()
    assert _queue_root(str(bare / "q.json"), {}) == str(bare)
