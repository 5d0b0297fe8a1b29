"""Observable / statistics helper tests."""
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.observables import (blocked_dq_sq_vs_dt, bootstrap, calc_dkl,
                                   calc_ess, tau_int, topo_susceptibility)


def test_ess_equal_weights_is_one():
    logp = jnp.zeros(64)
    logq = jnp.full(64, 3.0)
    assert abs(float(calc_ess(logp, logq)) - 1.0) < 1e-6


def test_ess_single_dominant_weight():
    logp = jnp.asarray([0.0] + [-100.0] * 63)
    logq = jnp.zeros(64)
    assert abs(float(calc_ess(logp, logq)) - 1.0 / 64) < 1e-6


def test_dkl():
    logp = jnp.asarray([1.0, 2.0])
    logq = jnp.asarray([2.0, 4.0])
    assert abs(float(calc_dkl(logp, logq)) - 1.5) < 1e-6


def test_bootstrap_recovers_mean():
    rng = np.random.default_rng(0)
    x = rng.normal(5.0, 1.0, size=1024)
    mean, err = bootstrap(x, nboot=200, binsize=16, rng=rng)
    assert abs(mean - 5.0) < 0.2
    assert 0.0 < err < 0.2


def test_topo_susceptibility():
    rng = np.random.default_rng(1)
    q = rng.normal(0.0, 2.0, size=2048)  # <Q^2> = 4
    mean, err = topo_susceptibility(q, nboot=100, binsize=16, rng=rng)
    assert abs(mean - 4.0) < 0.5


def test_tau_int_iid_is_half():
    rng = np.random.default_rng(2)
    x = rng.normal(size=8192)
    assert abs(tau_int(x) - 0.5) < 0.15


def test_tau_int_correlated_series():
    rng = np.random.default_rng(3)
    n, rho = 16384, 0.9
    x = np.empty(n)
    x[0] = rng.normal()
    for i in range(1, n):
        x[i] = rho * x[i - 1] + np.sqrt(1 - rho**2) * rng.normal()
    # AR(1): tau_int = (1+rho)/(2(1-rho)) = 9.5
    t = tau_int(x)
    assert 6.0 < t < 14.0


def test_blocked_dq_sq_vs_dt():
    q = np.arange(100, dtype=np.float64)  # Q(t)=t -> (Q(t)-Q(t+dt))^2 = dt^2
    out = blocked_dq_sq_vs_dt(q, dt_range=5, n_block=4)
    for dt, mean, err in out:
        assert abs(mean - dt * dt) < 1e-9
