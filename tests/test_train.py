"""Training tests: reverse-KL step, ESS, scheduler, force matching."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.config import SchedulerConfig, TrainConfig
from fthmc_tpu.train import (force_matching_step, init_train_state,
                             plateau_scheduler_update, train, train_step)


def _cfg(spec):
    return TrainConfig(L=8, beta=2.0, n_era=1, n_epoch=3, batch_size=8,
                       base_lr=1e-3, flow=spec, seed=0)


def test_train_step_metrics_and_update(spec2):
    cfg = _cfg(spec2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = train_step(state, spec2, cfg.batch_size, cfg.L,
                                cfg.beta, 1.0, cfg.base_lr)
    assert int(state.step) == 1
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert float(jnp.max(jnp.abs(p1 - p0))) > 0.0  # params moved
    ess = float(metrics["ess"])
    assert 0.0 < ess <= 1.0 + 1e-6
    for k in ("loss_dkl", "logp", "logq", "plaq"):
        assert np.isfinite(float(metrics[k]))


def test_training_improves_loss(spec2):
    """A short run should reduce the dkl loss from init (smoke-level check
    of the full optimization loop)."""
    cfg = TrainConfig(L=8, beta=2.0, n_era=1, n_epoch=30, batch_size=32,
                      base_lr=3e-3, flow=spec2, seed=1)
    state, history = train(cfg)
    losses = np.asarray(history["loss_dkl"], dtype=np.float64)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    ess = np.asarray(history["ess"], dtype=np.float64)
    assert ess[-1] > 0.0


def test_force_matching_step_runs(spec2):
    cfg = _cfg(spec2)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state, metrics = force_matching_step(state, spec2, 4, cfg.L, cfg.beta,
                                         cfg.base_lr, 0.01)
    assert np.isfinite(float(metrics["loss_force"]))
    assert int(state.step) == 1


def test_force_matching_with_distillation(spec2, params2, identity_params2):
    """Reference-exact path: latents distilled through a frozen pre-model
    and inverted through the current flow."""
    import jax.numpy as jnp
    from fthmc_tpu.train import distill_latents, force_matching_step
    cfg = _cfg(spec2)
    xi = distill_latents(identity_params2, params2, spec2,
                         jax.random.PRNGKey(0), 2, cfg.L)
    # current flow == identity => xi equals the pre-model's pushforward
    from fthmc_tpu.models.flow import flow_forward
    from fthmc_tpu.models.priors import uniform_link_prior
    z_pre = uniform_link_prior(cfg.L).sample_n(jax.random.PRNGKey(0), 2)
    x_expect, _ = flow_forward(params2, z_pre, spec2)
    err = np.max(np.abs(np.asarray(
        jnp.remainder(xi - x_expect + np.pi, 2 * np.pi) - np.pi)))
    assert err < 1e-4

    state = init_train_state(jax.random.PRNGKey(1), cfg)
    state, metrics = force_matching_step(
        state, spec2, 2, cfg.L, cfg.beta, cfg.base_lr, 0.01,
        pre_params=params2)
    assert np.isfinite(float(metrics["loss_force"]))


def test_plateau_scheduler(spec2):
    cfg = _cfg(spec2)
    sched = SchedulerConfig(factor=0.5, patience=2, threshold=1e-4,
                            min_lr=1e-5)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state = plateau_scheduler_update(state, 1.0, sched, cfg.base_lr)
    assert float(state.best_loss) == 1.0
    # no improvement for patience+1 epochs -> lr halves
    for _ in range(3):
        state = plateau_scheduler_update(state, 1.0, sched, cfg.base_lr)
    assert float(state.lr_scale) == 0.5
    # improvement resets
    state = plateau_scheduler_update(state, 0.5, sched, cfg.base_lr)
    assert float(state.best_loss) == 0.5
    assert int(state.plateau_count) == 0
