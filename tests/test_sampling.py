"""Flow-sampling (independence Metropolis) tests."""
import jax
import numpy as np

from fthmc_tpu.sampling import generate_ensemble, make_mcmc_ensemble


def test_mcmc_ensemble_shapes_and_chain_consistency(params2, spec2):
    hist = make_mcmc_ensemble(params2, spec2, beta=2.0, L=8, batch_size=16,
                              num_samples=50, key=jax.random.PRNGKey(0))
    for k in ("q", "dqsq", "logq", "logp", "acc"):
        assert hist[k].shape == (50,), (k, hist[k].shape)
    acc = hist["acc"]
    assert acc[0] == 1.0  # first proposal always accepted
    assert set(np.unique(acc)) <= {0.0, 1.0}
    # on rejection the chain state (hence logp/logq/q) is unchanged
    rej = np.where(acc[1:] == 0.0)[0] + 1
    np.testing.assert_allclose(hist["logp"][rej], hist["logp"][rej - 1])
    np.testing.assert_allclose(hist["q"][rej], hist["q"][rej - 1],
                               atol=1e-5)
    np.testing.assert_allclose(hist["dqsq"][rej], 0.0, atol=1e-8)


def test_identity_flow_uniform_proposals_all_weights_equal(identity_params2,
                                                           spec2):
    """With the identity flow, logq is constant, so the accept probability is
    exp(logp' - logp); sanity-check the accept rule statistically: hot uniform
    proposals at beta=0... instead check internal consistency: acc rate in
    (0, 1] and logq constant."""
    hist = make_mcmc_ensemble(identity_params2, spec2, beta=1.0, L=8,
                              batch_size=16, num_samples=64,
                              key=jax.random.PRNGKey(1))
    lq = hist["logq"]
    np.testing.assert_allclose(lq, lq[0], atol=1e-4)
    assert 0.0 < hist["acc"].mean() <= 1.0


def test_multichain_ensemble_shapes_and_independence(params2, spec2):
    """n_chains > 1: (N, K) histories; per-chain detailed-balance invariants
    hold chain by chain; chains decorrelate independently."""
    hist = make_mcmc_ensemble(params2, spec2, beta=2.0, L=8, batch_size=8,
                              num_samples=33, key=jax.random.PRNGKey(3),
                              n_chains=4)
    for k in ("q", "dqsq", "logq", "logp", "acc"):
        assert hist[k].shape == (33, 4), (k, hist[k].shape)
    acc = hist["acc"]
    np.testing.assert_allclose(acc[0], 1.0)   # init accepted on every chain
    for c in range(4):
        rej = np.where(acc[1:, c] == 0.0)[0] + 1
        np.testing.assert_allclose(hist["logp"][rej, c],
                                   hist["logp"][rej - 1, c])
        np.testing.assert_allclose(hist["dqsq"][rej, c], 0.0, atol=1e-8)
    # chains consume independent proposal streams: acceptance patterns and
    # logp trajectories differ across chains
    assert not np.allclose(hist["logp"][:, 0], hist["logp"][:, 1])


def test_multichain_keep_fields(params2, spec2):
    hist = make_mcmc_ensemble(params2, spec2, beta=2.0, L=8, batch_size=4,
                              num_samples=9, key=jax.random.PRNGKey(4),
                              n_chains=2, keep_fields=True)
    assert hist["x"].shape == (9, 2, 2, 8, 8)
    # rejected steps keep the field unchanged
    acc = hist["acc"]
    for c in range(2):
        rej = np.where(acc[1:, c] == 0.0)[0] + 1
        np.testing.assert_allclose(hist["x"][rej, c], hist["x"][rej - 1, c])


def test_generate_ensemble_multichain_reports(params2, spec2):
    out = generate_ensemble(params2, spec2, beta=2.0, L=8,
                            ensemble_size=40, batch_size=8, n_chains=3,
                            key=jax.random.PRNGKey(5))
    assert 0.0 <= out["accept_rate"] <= 1.0
    assert np.isfinite(out["suscept_mean"]) and out["suscept_err"] >= 0
    assert out["tau_int_q"] >= 0.5
    assert out["chain_stats"]["n_chains"] == 3


def test_generate_ensemble_reports(params2, spec2):
    out = generate_ensemble(params2, spec2, beta=2.0, L=8,
                            ensemble_size=64, batch_size=16, nboot=10,
                            binsize=4, key=jax.random.PRNGKey(2))
    assert 0.0 <= out["accept_rate"] <= 1.0
    assert np.isfinite(out["suscept_mean"])
    assert out["suscept_err"] >= 0.0
