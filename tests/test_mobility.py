"""Mobility probe (fthmc_tpu/mobility.py) — the round-4 lesson packaged:
flow candidates are selected on wall-clock topological mobility (B*mob/s),
not acceptance (BENCH.md round-4 fermaware A/B: higher acceptance, x1.5
less mobility). Reference anchor: the dQ^2 diagnostic in the reference
prototype (ipynb/ft_hmc.py:52-53,168-176)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fthmc_tpu.mobility import mobility_probe, mobility_stats


def test_mobility_stats_exact_on_synthetic_series():
    # chain 0 hops 0->1->1->0 (dq^2 = 1,0,1); chain 1 frozen
    q = np.array([[0.0, 2.0], [1.0, 2.0], [1.0, 2.0], [0.0, 2.0]])
    st = mobility_stats(q, s_per_traj=0.5)
    assert st["mobility"] == pytest.approx((2 / 3 + 0.0) / 2)
    assert st["n_events"] == pytest.approx(2.0)    # exact transition count
    assert st["n_chains"] == 2 and st["ntraj"] == 4
    assert st["B_mob_per_s"] == pytest.approx(st["mobility"] * 2 / 0.5)
    assert st["mobility_err"] > 0                  # chains differ

    # single chain falls back to the Poisson error
    st1 = mobility_stats(q[:, 0])
    assert st1["mobility_err"] == pytest.approx(
        st1["mobility"] / np.sqrt(2.0))


def test_mobility_stats_rejects_single_row():
    with pytest.raises(ValueError):
        mobility_stats(np.zeros((1, 4)))


def test_probe_plain_quenched_runs_and_reports():
    st = mobility_probe(None, None, L=8, beta=2.0, n_chains=4, ntraj=12,
                        therm=4, tau=1.0, nstep=4, call_block=8,
                        sampler="plain", key=jax.random.PRNGKey(0))
    assert 0.0 <= st["acc"] <= 1.0
    assert st["mobility"] >= 0.0 and st["valid"]
    assert st["s_per_traj"] > 0 and st["B_mob_per_s"] >= 0.0
    # ntraj rounds up to whole timed blocks: 12 -> 2 blocks of 8
    assert st["ntraj"] == 16 and st["sampler"] == "plain"
    # beta=2 at 8^2 tunnels freely: a 12-traj burst sees events
    assert st["n_events"] > 0


@pytest.fixture(scope="module")
def tiny_flow():
    from fthmc_tpu.config import FlowSpec
    from fthmc_tpu.models.flow import init_flow_params
    spec = FlowSpec(n_layers=2, hidden_sizes=(4, 4), n_mixture=2,
                    coupling="ncp")
    params = init_flow_params(jax.random.PRNGKey(3), spec)
    return params, spec


def test_probe_ft_quenched(tiny_flow):
    params, spec = tiny_flow
    st = mobility_probe(params, spec, L=8, beta=2.0, n_chains=4, ntraj=8,
                        therm=2, tau=0.5, nstep=4, call_block=8,
                        sampler="ft", key=jax.random.PRNGKey(1))
    assert 0.0 <= st["acc"] <= 1.0 and st["mobility"] >= 0.0
    assert 0.0 < st["plaq"] <= 1.0


def test_probe_ft_dynamical_and_floor_extension(tiny_flow):
    params, spec = tiny_flow
    # impossible floor with a 2-block budget: probe must extend by exactly
    # 2 call-blocks and flag the row invalid
    st = mobility_probe(params, spec, L=8, beta=1.0, mass=0.3, n_chains=4,
                        ntraj=6, therm=2, tau=0.5, nstep=2, call_block=6,
                        cg_maxiter=200, sampler="ft",
                        key=jax.random.PRNGKey(2), min_events=1e9,
                        max_extra_blocks=2)
    assert st["ntraj"] == 6 + 2 * 6
    assert not st["valid"]
    assert 0.0 <= st["acc"] <= 1.0
