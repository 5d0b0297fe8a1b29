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
