"""Training tests: reverse-KL step, ESS, scheduler, force matching."""
import jax
import jax.numpy as jnp
import numpy as np

from fthmc_tpu.config import FlowSpec, SchedulerConfig, TrainConfig
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
    # the force step does NOT own the step counter (the KL step does - one
    # epoch = one step even with with_force on)
    assert int(state.step) == 0


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


def test_resume_continues_era_numbering(tmp_path, spec2):
    """VERDICT r1 item 9: restore-then-train must produce ckpt_era{k+1},
    not restart at era 0."""
    import os
    from fthmc_tpu.checkpoint import (find_and_load_checkpoint,
                                      save_checkpoint)
    cfg = TrainConfig(L=8, beta=2.0, n_era=3, n_epoch=2, batch_size=4,
                      flow=spec2, seed=0)
    ckdir = str(tmp_path / "ck")
    saved = []

    def ckpt_fn(era, st, history):
        saved.append(era)
        save_checkpoint(ckdir, st, era=era, epoch=cfg.n_epoch,
                        history=history)

    # initial run: eras 0 and 1 only (interrupt by limiting n_era)
    cfg01 = TrainConfig(L=8, beta=2.0, n_era=2, n_epoch=2, batch_size=4,
                        flow=spec2, seed=0)
    state, _ = train(cfg01, checkpoint_fn=ckpt_fn)
    assert saved == [0, 1]

    # resume: restore newest, continue from era meta+1 to n_era=3
    state2 = init_train_state(jax.random.PRNGKey(0), cfg)
    state2, meta = find_and_load_checkpoint(ckdir, state2)
    assert meta["era"] == 1
    state3, _ = train(cfg, state2, checkpoint_fn=ckpt_fn,
                      start_era=meta["era"] + 1)
    assert saved == [0, 1, 2]
    assert int(state3.step) == 6  # 3 eras x 2 epochs total


def test_annealed_training_beta_schedule(spec2):
    cfg = TrainConfig(L=8, beta=2.5, beta_init=2.0, beta_anneal_frac=0.5,
                      n_era=2, n_epoch=4, batch_size=4, flow=spec2, seed=0)
    state, hist = train(cfg)
    betas = np.asarray(hist["beta"])
    assert abs(betas[0] - 2.0) < 1e-6
    assert abs(betas[-1] - 2.5) < 1e-6
    assert np.all(np.diff(betas) >= -1e-6)


def test_grad_clip_trains(spec2):
    cfg = TrainConfig(L=8, beta=2.0, n_era=1, n_epoch=3, batch_size=4,
                      flow=spec2, seed=0, grad_clip=1.0)
    state, hist = train(cfg)
    assert np.isfinite(hist["loss_dkl"]).all()


def test_plateau_never_fires_while_improving():
    """Regression (round 3): best_loss starts at +inf, where
    best - thr*|best| = nan and `loss < nan` is False - the unguarded rule
    never updated best and decayed the LR unconditionally."""
    from fthmc_tpu.train import _plateau_update_device
    sched = SchedulerConfig(factor=0.5, patience=2)
    state = init_train_state(
        jax.random.PRNGKey(0),
        TrainConfig(L=8, flow=FlowSpec(n_layers=1, hidden_sizes=(2,))))
    for i in range(10):  # strictly improving loss
        state = _plateau_update_device(
            state, jnp.asarray(1.0 - 0.05 * i), sched, 1e-3)
    assert float(state.lr_scale) == 1.0
    assert abs(float(state.best_loss) - 0.55) < 1e-6


def test_scheduler_cooldown_device():
    """After an LR reduction the counter restarts at -cooldown: no second
    reduction can fire within cooldown epochs."""
    from fthmc_tpu.train import _plateau_update_device
    sched = SchedulerConfig(factor=0.5, patience=1, cooldown=3)
    state = init_train_state(
        jax.random.PRNGKey(0),
        TrainConfig(L=8, flow=FlowSpec(n_layers=1, hidden_sizes=(2,))))
    state = state._replace(best_loss=jnp.asarray(0.0, jnp.float32))
    scales = []
    for _ in range(8):  # constant (never-improving) loss
        state = _plateau_update_device(state, jnp.asarray(1.0), sched, 1e-3)
        scales.append(float(state.lr_scale))
    # first fire after patience+1 bad epochs; next fire >= cooldown later
    fires = [i for i in range(1, len(scales)) if scales[i] < scales[i - 1]]
    assert len(fires) >= 1
    if len(fires) > 1:
        assert fires[1] - fires[0] >= sched.cooldown


def test_force_weight_joint_objective(spec2):
    """The smoothness-regularized JOINT objective (round-3): loss =
    dkl_factor*D_KL + force_weight*mean(F_eff^2) on the same prior batch.
    Checks (a) the decomposition is exact, (b) the step runs and reports
    force_sq, (c) a short regularized run drives force_sq down relative
    to an unregularized run from the same seed."""
    from fthmc_tpu.train import reverse_kl_loss
    cfg = _cfg(spec2)
    state = init_train_state(jax.random.PRNGKey(3), cfg)
    key = jax.random.PRNGKey(4)
    w = 0.5
    loss0, aux0 = reverse_kl_loss(state.params, spec2, key, 8, cfg.L,
                                  cfg.beta)
    loss1, aux1 = reverse_kl_loss(state.params, spec2, key, 8, cfg.L,
                                  cfg.beta, force_weight=w)
    assert np.isclose(float(loss1),
                      float(loss0) + w * float(aux1["force_sq"]),
                      rtol=1e-5)

    state, metrics = train_step(state, spec2, cfg.batch_size, cfg.L,
                                cfg.beta, 1.0, cfg.base_lr, force_weight=w)
    assert np.isfinite(float(metrics["force_sq"]))
    assert np.isfinite(float(metrics["loss_dkl"]))


def test_force_weight_training_smooths(spec2):
    """With a LARGE force_weight, a short run must reduce mean(F_eff^2)
    below the pure-KL run's endpoint (same seed/config otherwise)."""
    from fthmc_tpu.hmc import ft_force
    from fthmc_tpu.models.priors import uniform_link_prior

    def endpoint_fsq(force_weight):
        cfg = TrainConfig(L=8, beta=2.0, n_era=1, n_epoch=40, batch_size=16,
                          base_lr=3e-3, flow=spec2, seed=5,
                          force_weight=force_weight)
        state, _ = train(cfg)
        z = uniform_link_prior(8).sample_n(jax.random.PRNGKey(9), 16)
        f = ft_force(state.params, spec2, z, 2.0)
        return float(jnp.mean(f * f))

    assert endpoint_fsq(5.0) < endpoint_fsq(0.0)
