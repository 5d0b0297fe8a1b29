"""HMC kernel tests: reversibility, exactness, physics windows."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu import lattice
from fthmc_tpu.config import HMCConfig
from fthmc_tpu.hmc import hmc_step, leapfrog, run_hmc


def test_leapfrog_reversibility():
    """Integrate forward, flip momentum, integrate back -> recover start
    (reference validation pattern, ipynb/ft_hmc.py:116-141)."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 2, 8, 8), jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)
    force_fn = lambda y: lattice.batch_force(y, 2.0)
    x1, v1 = leapfrog(x, v, 0.1, 12, force_fn)
    x2, v2 = leapfrog(x1, -v1, 0.1, 12, force_fn)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(-v), atol=2e-4)


def test_leapfrog_energy_scaling():
    """|dH| ~ O(dt^2): halving dt should cut the energy error ~4x."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 2, 8, 8), jnp.float32, -3.0, 3.0)
    v = jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype)
    beta = 2.0
    force_fn = lambda y: lattice.batch_force(y, beta)

    def dh(nstep):
        dt = 1.0 / nstep
        x1, v1 = leapfrog(x, v, dt, nstep, force_fn)
        ds = jax.vmap(lambda a, b: lattice.delta_action(a, b, beta))(x1, x)
        dk = 0.5 * jnp.sum((v1 * v1 - v * v).reshape(4, -1), axis=-1)
        return np.abs(np.asarray(ds + dk)).mean()

    e1, e2 = dh(8), dh(16)
    assert e2 < e1 / 2.5


def test_hmc_step_shapes_and_determinism():
    key = jax.random.PRNGKey(5)
    x = jnp.zeros((8, 2, 8, 8), jnp.float32)
    q = lattice.batch_charges(x)
    x1, q1, m = hmc_step(key, x, q, 2.0, 0.2, 10)
    x2, q2, m2 = hmc_step(key, x, q, 2.0, 0.2, 10)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert m.dh.shape == (8,)
    assert set(np.unique(np.asarray(m.acc))) <= {0.0, 1.0}


def test_run_hmc_physics():
    """Statistical window test at 8x8 beta=2: <plaq> near the exact Bessel
    ratio, <exp(-dH)> near 1, acceptance in a sane band."""
    cfg = HMCConfig(beta=2.0, L=8, tau=2.0, nstep=10, ntraj=400,
                    n_chains=32, randinit=True, seed=7)
    x, hist = run_hmc(cfg)
    plaq = np.asarray(hist.plaq)[200:]
    emdh = np.asarray(hist.exp_mdh)[200:]
    acc = np.asarray(hist.acc)
    assert abs(plaq.mean() - lattice.PLAQ_EXACT[2.0]) < 0.01
    assert abs(emdh.mean() - 1.0) < 0.05
    assert 0.5 < acc.mean() <= 1.0


def test_run_hmc_chunked_matches_shapes():
    from fthmc_tpu.hmc import run_hmc_chunked
    cfg = HMCConfig(beta=2.0, L=8, tau=1.0, nstep=4, ntraj=10,
                    n_chains=4, randinit=True, seed=5)
    calls = []
    x, hist = run_hmc_chunked(cfg, block=4,
                              callback=lambda done, h: calls.append(done))
    assert hist.plaq.shape == (10, 4)
    assert calls == [4, 8, 10]
    assert np.isfinite(np.asarray(hist.dh)).all()


def test_run_hmc_thinned_summary_consistent():
    """Thinned history + streaming summary: summary means over ALL
    trajectories must agree with a full (unthinned) run statistically, and
    the thinned history must be exactly every k-th entry count."""
    from fthmc_tpu.hmc import run_hmc_thinned
    cfg = HMCConfig(beta=2.0, L=8, tau=2.0, nstep=8, ntraj=64,
                    n_chains=16, randinit=True, seed=5)
    x, hist, summary = run_hmc_thinned(cfg, thin=8)
    assert hist.plaq.shape == (8, 16)
    for k in ("acc", "plaq", "exp_mdh", "abs_dh"):
        assert np.isfinite(float(summary[k]))
    # same key/config without thinning gives the same final state
    x_full, hist_full = run_hmc(cfg)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_full), atol=1e-5)
    np.testing.assert_allclose(
        float(summary["plaq"]),
        float(np.asarray(hist_full.plaq).mean()), rtol=1e-4)


def test_run_hmc_rejection_keeps_state():
    """With an absurd step size everything rejects and the state is frozen."""
    cfg = HMCConfig(beta=2.0, L=8, tau=80.0, nstep=2, ntraj=4,
                    n_chains=4, randinit=True, seed=3)
    x0 = lattice.hot_start(jax.random.PRNGKey(1), 4, 8)
    x, hist = run_hmc(cfg, x0=x0)
    assert np.asarray(hist.acc).mean() < 0.3
    # rejected chains stay exactly at their previous state: q constant there
    q = np.asarray(hist.q)
    acc = np.asarray(hist.acc)
    q_prev = np.concatenate(
        [np.asarray(lattice.batch_charges(x0))[None], q[:-1]])
    frozen = acc == 0.0
    np.testing.assert_allclose(q[frozen], q_prev[frozen], atol=1e-4)


def test_run_fthmc_thinned_summary_consistent():
    """FT-HMC streaming driver (VERDICT r1 item 7): summary means over ALL
    trajectories match the unthinned run; history is 1-per-thin."""
    from fthmc_tpu.config import FlowSpec, LeapfrogConfig
    from fthmc_tpu.hmc import run_fthmc, run_fthmc_thinned
    from fthmc_tpu.models.flow import init_flow_params

    spec = FlowSpec(n_layers=2, n_mixture=2, hidden_sizes=(4,))
    params = init_flow_params(jax.random.PRNGKey(2), spec)
    lf = LeapfrogConfig(tau=0.5, nstep=6)
    z0 = jnp.zeros((8, 2, 8, 8), jnp.float32)
    key = jax.random.PRNGKey(9)
    z, hist, summary = run_fthmc_thinned(params, spec, lf, beta=2.0,
                                         ntraj=32, thin=8, z0=z0, key=key)
    assert hist.plaq.shape == (4, 8)
    for k in ("acc", "plaq", "exp_mdh", "abs_dh"):
        assert np.isfinite(float(summary[k]))
    z_full, hist_full = run_fthmc(params, spec, lf, beta=2.0, ntraj=32,
                                  z0=z0, key=key)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_full), atol=1e-5)
    np.testing.assert_allclose(
        float(summary["plaq"]),
        float(np.asarray(hist_full.plaq).mean()), rtol=1e-4)


def test_run_hmc_nrun_independent_runs():
    """nrun independent fresh-init runs (reference fthmc/hmc.py:95-110):
    stacked (nrun, ntraj, B) history, distinct streams per run."""
    from fthmc_tpu.hmc import run_hmc_nrun
    cfg = HMCConfig(beta=2.0, L=8, tau=1.0, nstep=6, ntraj=8,
                    n_chains=4, nrun=3, randinit=True, seed=2)
    x, runs = run_hmc_nrun(cfg)
    assert runs.plaq.shape == (3, 8, 4)
    assert np.isfinite(np.asarray(runs.dh)).all()
    # independent runs differ
    assert np.abs(np.asarray(runs.plaq)[0] - np.asarray(runs.plaq)[1]).max() > 0
