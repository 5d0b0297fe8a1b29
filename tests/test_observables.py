"""Observable / statistics helper tests."""
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.observables import (blocked_dq_sq_vs_dt, bootstrap, calc_dkl,
                                   calc_ess, chain_stats, tau_int,
                                   tau_int_err, topo_susceptibility)


def _ar1(rng, n, rho, nchain=1):
    """AR(1) series with tau_int = (1+rho)/(2(1-rho)), shape (n, nchain)."""
    x = np.empty((n, nchain))
    x[0] = rng.normal(size=nchain)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + np.sqrt(1 - rho**2) * rng.normal(size=nchain)
    return x


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


def test_tau_int_err_covers_truth():
    # AR(1) with known tau_int = (1+rho)/(2(1-rho)) = 4.75 at rho = 0.8
    rng = np.random.default_rng(4)
    x = _ar1(rng, 32768, 0.8)[:, 0]
    t, err, w = tau_int_err(x)
    assert w > 0
    assert 0.0 < err < t
    assert abs(t - 4.75) < 4 * err + 0.5


def test_chain_stats_ar1_known_tau():
    # 32 independent AR(1) chains, rho=0.9 -> tau_int = 9.5; the bootstrap
    # error over chains should cover the truth within ~4 sigma
    rng = np.random.default_rng(5)
    q = _ar1(rng, 8192, 0.9, nchain=32)
    cs = chain_stats(q)
    assert cs["n_chains"] == 32 and cs["ntraj_used"] == 8192
    assert cs["tau_int_q_err"] > 0
    assert abs(cs["tau_int_q"] - 9.5) < 4 * cs["tau_int_q_err"] + 1.0
    # chi "susceptibility" of a unit-variance series is 1
    assert abs(cs["chi_q"] - 1.0) < 4 * cs["chi_q_err"] + 0.05
    # mobility <(x_t - x_{t-1})^2> = 2(1-rho) for AR(1)
    assert abs(cs["q_mobility_dt1"] - 2 * (1 - 0.9)) < 0.05


def test_chain_stats_bootstrap_error_sanity():
    # scale the series -> tau_int unchanged, chi and its error scale by 4;
    # error shrinks with more chains
    rng = np.random.default_rng(6)
    q = _ar1(rng, 4096, 0.5, nchain=64)
    a = chain_stats(q)
    b = chain_stats(2.0 * q)
    assert abs(a["tau_int_q"] - b["tau_int_q"]) < 1e-12
    assert abs(b["chi_q"] - 4 * a["chi_q"]) < 1e-9
    assert abs(b["chi_q_err"] - 4 * a["chi_q_err"]) < 1e-9
    few = chain_stats(q[:, :8])
    assert few["tau_int_q_err"] > a["tau_int_q_err"]


def test_chain_stats_therm_and_single_chain():
    rng = np.random.default_rng(7)
    q = _ar1(rng, 2048, 0.5, nchain=1)
    cs = chain_stats(q[:, 0], therm_frac=0.25)  # 1D input accepted
    assert cs["therm"] == 512 and cs["ntraj_used"] == 1536
    assert cs["n_chains"] == 1
    assert cs["tau_int_q_err"] > 0 and cs["chi_q_err"] > 0


def test_blocked_dq_sq_vs_dt():
    q = np.arange(100, dtype=np.float64)  # Q(t)=t -> (Q(t)-Q(t+dt))^2 = dt^2
    out = blocked_dq_sq_vs_dt(q, dt_range=5, n_block=4)
    for dt, mean, err in out:
        assert abs(mean - dt * dt) < 1e-9
