"""NaN-guard tests: the SURVEY section 5 analogue of sanitizers - run the
hot paths under jax_debug_nans so any NaN in the compiled programs raises."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def debug_nans():
    jax.config.update("jax_debug_nans", True)
    yield
    jax.config.update("jax_debug_nans", False)


def test_train_step_nan_free(debug_nans, spec2):
    from fthmc_tpu.config import TrainConfig
    from fthmc_tpu.train import init_train_state, train_step
    cfg = TrainConfig(L=8, beta=2.0, batch_size=8, flow=spec2, seed=0)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state, metrics = train_step(state, spec2, 8, 8, 2.0, 1.0, 1e-3)
    assert np.isfinite(float(metrics["loss_dkl"]))


def test_fthmc_step_nan_free(debug_nans, params2, spec2):
    from fthmc_tpu.hmc import fthmc_step
    from fthmc_tpu import lattice
    z = lattice.hot_start(jax.random.PRNGKey(1), 4, 8)
    q = jnp.zeros((4,), jnp.float32)
    z1, y1, q1, m = fthmc_step(params2, spec2, jax.random.PRNGKey(2), z, q,
                               2.0, 0.05, 3)
    assert np.isfinite(np.asarray(m.dh)).all()


def test_inverse_residual_diagnostic(params2, spec2, x_batch):
    """Bisection-convergence check (the reference warns on stdout,
    layers.py:308-319; we expose a measurable residual)."""
    from fthmc_tpu.diagnostics import flow_inverse_residual
    res = flow_inverse_residual(params2, spec2, x_batch)
    assert res < 5e-5
