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
