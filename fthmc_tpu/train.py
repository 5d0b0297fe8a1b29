"""Flow training: reverse-KL (+ optional force-matching) with optax.

Reference parity: fthmc/train.py:162-228 (train_step), :236-431 (train loop,
era x epoch with per-era checkpoints), ipynb/ft_hmc.py:253-346 (force-matching
objective, a prototype-only feature the package left commented out,
train.py:326-334).

TPU design: ONE jitted step function does sample -> flow -> loss -> grad ->
optax update; the era/epoch nesting is a host loop around it (checkpoint and
logging cadence), so steps/sec is pure device throughput. The same flow apply
is shared verbatim by the samplers (the "one jitted step" north star).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fthmc_tpu import lattice
from fthmc_tpu.config import FlowSpec, SchedulerConfig, TrainConfig
from fthmc_tpu.hmc import ft_force
from fthmc_tpu.models.flow import flow_forward, flow_reverse, init_flow_params
from fthmc_tpu.models.priors import uniform_link_prior
from fthmc_tpu.observables import calc_dkl, calc_ess

__all__ = ["TrainState", "init_train_state", "reverse_kl_loss", "train_step",
           "force_matching_step", "train", "train_era", "make_optimizer",
           "plateau_scheduler_update"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    step: jnp.ndarray            # int32 scalar
    # reduce-on-plateau bookkeeping (device-side so the step stays jittable)
    lr_scale: jnp.ndarray        # float scalar multiplying base_lr
    best_loss: jnp.ndarray
    plateau_count: jnp.ndarray   # int32


def make_optimizer(base_lr: float,
                   grad_clip: float | None = None
                   ) -> optax.GradientTransformation:
    """Adam at base_lr, with an inject_hyperparams LR so a plateau scheduler
    can rescale it on device (reference: optim.Adam + ReduceLROnPlateau,
    train.py:296-297,314-317). grad_clip adds global-norm gradient clipping
    (stabilizes late annealed training of high-capacity couplings - measured
    rncp ESS collapse 0.32 -> 0.007 at fixed lr without it)."""
    if grad_clip is None:
        return optax.inject_hyperparams(optax.adam)(learning_rate=base_lr)

    def _opt(learning_rate):
        return optax.chain(optax.clip_by_global_norm(grad_clip),
                           optax.adam(learning_rate))

    return optax.inject_hyperparams(_opt)(learning_rate=base_lr)


def init_train_state(key: jax.Array, cfg: TrainConfig,
                     params=None, dtype=jnp.float32) -> TrainState:
    kp, kr = jax.random.split(key)
    if params is None:
        params = init_flow_params(kp, cfg.flow, dtype=dtype)
    opt = make_optimizer(cfg.base_lr, cfg.grad_clip)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        key=kr,
        step=jnp.zeros((), jnp.int32),
        lr_scale=jnp.ones((), jnp.float32),
        best_loss=jnp.full((), jnp.inf, jnp.float32),
        plateau_count=jnp.zeros((), jnp.int32),
    )


def sample_and_logq(params, spec: FlowSpec, key: jax.Array, batch: int, L: int,
                    dtype=jnp.float32):
    """Draw z ~ prior, push through the flow: returns (x, z, logq).

    logq(x) = logprior(z) - logdet f(z). (reference apply_flow_to_prior,
    samplers.py:40-56)
    """
    prior = uniform_link_prior(L, dtype)
    z = prior.sample_n(key, batch)
    x, logdet = flow_forward(params, z, spec)
    logq = prior.log_prob(z) - logdet
    return x, z, logq


def ft_force_dyn(params, spec: FlowSpec, z: jnp.ndarray, beta: float,
                 mass: float) -> jnp.ndarray:
    """dS_eff/dz with the DYNAMICAL effective action
    S_eff = S_g(f(z)) - logdet J_f - ln det(D^dag D)(f(z)): the force the
    flow actually faces in dynamical-fermion FT-HMC (schwinger.py), with
    the fermion determinant exact (fermion.logdet_mdagm — dense,
    train-volume only) instead of a noisy pseudofermion estimate."""
    from fthmc_tpu import fermion

    def act(zz):
        y, logdet = flow_forward(params, zz, spec)
        s = (lattice.batch_action(y, beta) - logdet
             - fermion.logdet_mdagm(y, mass))
        return jnp.sum(s)

    return jax.grad(act)(z)


def reverse_kl_loss(params, spec: FlowSpec, key: jax.Array, batch: int,
                    L: int, beta: float, dkl_factor: float = 1.0,
                    dtype=jnp.float32, force_weight: float = 0.0,
                    ferm_mass: float = 0.0):
    """loss = dkl_factor * E_q[logq - logp], logp = -S(x).
    Returns (loss, aux dict). (reference train_step, train.py:192-204)

    force_weight > 0 adds the smoothness regularizer
    force_weight * mean(F_eff^2) (per-dof mean over the SAME prior batch,
    F_eff = dS_eff/dz through the flow) to the loss — a JOINT objective
    that steers KL training toward leapfrog-integrable maps, unlike the
    reference prototype's alternating force-matching step
    (ipynb/ft_hmc.py:253-299). Round-2/3 finding this targets: pure-KL
    optima are seed-sensitively rugged (BENCH.md 12-layer retrains)."""
    x, z, logq = sample_and_logq(params, spec, key, batch, L, dtype)
    logp = -lattice.batch_action(x, beta)
    dkl = calc_dkl(logp, logq)
    aux = {"logp": logp, "logq": logq, "x": x, "z": z, "dkl": dkl}
    loss = dkl_factor * dkl
    if force_weight:
        # ferm_mass > 0: fermion-aware smoothness — regularize the force
        # the flow faces in DYNAMICAL FT-HMC (exact log-det term), the
        # round-4 lever for the 32^2/64^2 high-beta cells where the
        # flow-VJP cost must be bought back with a coarser step.
        f = (ft_force_dyn(params, spec, z, beta, ferm_mass) if ferm_mass
             else ft_force(params, spec, z, beta))
        fsq = jnp.mean(f * f)
        aux["force_sq"] = fsq
        loss = loss + force_weight * fsq
    return loss, aux


def _train_step_impl(state: TrainState, spec: FlowSpec, batch: int, L: int,
                     beta, dkl_factor: float, base_lr: float,
                     grad_clip: float | None = None,
                     force_weight: float = 0.0, ferm_mass: float = 0.0):
    """One reverse-KL training step -> (new_state, metrics dict).

    Metrics mirror the reference (train.py:217-226): ess, logp, logq,
    loss_dkl, q, dq (|Q(x) - Q(z)|), plaq. `beta` may be a python float
    (static) or a traced scalar (beta-annealed training).
    """
    key, kstep = jax.random.split(state.key)

    def loss_fn(params):
        return reverse_kl_loss(params, spec, kstep, batch, L, beta,
                               dkl_factor, force_weight=force_weight,
                               ferm_mass=ferm_mass)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)

    opt = make_optimizer(base_lr, grad_clip)
    opt_state = state.opt_state
    # plateau-scaled LR (scheduler state updated host-side per epoch)
    opt_state.hyperparams["learning_rate"] = base_lr * state.lr_scale
    updates, opt_state = opt.update(grads, opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    q = lattice.batch_charges(aux["x"])
    qi = lattice.batch_charges(aux["z"])
    # "loss_dkl" is the TOTAL objective (what the plateau scheduler watches);
    # "dkl" is the pure KL part (identical unless force_weight > 0).
    metrics = {
        "loss_dkl": loss,
        "dkl": aux["dkl"],
        "ess": calc_ess(aux["logp"], aux["logq"]),
        "logp": jnp.mean(aux["logp"]),
        "logq": jnp.mean(aux["logq"]),
        "q": q,
        "dq": jnp.abs(q - qi),
        "plaq": jnp.mean(aux["logp"]) / (beta * L * L),
    }
    if "force_sq" in aux:
        metrics["force_sq"] = aux["force_sq"]
    new_state = TrainState(params, opt_state, key, state.step + 1,
                           state.lr_scale, state.best_loss,
                           state.plateau_count)
    return new_state, metrics


train_step = partial(jax.jit, static_argnames=(
    "spec", "batch", "L", "beta", "dkl_factor", "base_lr", "grad_clip",
    "force_weight", "ferm_mass"))(_train_step_impl)


def distill_latents(params, pre_params, spec: FlowSpec, key: jax.Array,
                    batch: int, L: int):
    """Reference-exact distillation latents for force matching
    (prototype ipynb/ft_hmc.py:258-263): sample the frozen pre-model's
    prior, push forward through the pre-model, and invert through the
    CURRENT flow (bisection; gradients stopped, matching the reference's
    .detach()'d ft_flow_inv)."""
    prior = uniform_link_prior(L)
    z_pre = prior.sample_n(key, batch)
    x, _ = flow_forward(pre_params, z_pre, spec)
    xi, _ = flow_reverse(params, x, spec)
    return jax.lax.stop_gradient(xi)


def _force_step_impl(state: TrainState, spec: FlowSpec, batch: int, L: int,
                     beta, base_lr: float, lr_factor: float,
                     pre_params=None, grad_clip: float | None = None):
    """Force-matching objective: loss = sum ||F_eff||^2 over a latent batch,
    optimized at base_lr * lr_factor (prototype ipynb/ft_hmc.py:253-299:
    `with_force` branch; grad-of-grad == create_graph=True there).

    With `pre_params` the latent batch distills through a frozen pre-model
    exactly as the reference does; otherwise it is drawn from the prior
    directly (cheaper: no bisection inverse in the training loop).
    """
    key, kstep = jax.random.split(state.key)
    if pre_params is not None:
        z = distill_latents(state.params, pre_params, spec, kstep, batch, L)
    else:
        prior = uniform_link_prior(L)
        z = prior.sample_n(kstep, batch)

    def loss_fn(params):
        f = ft_force(params, spec, z, beta)
        return jnp.sum(f * f)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)

    opt = make_optimizer(base_lr, grad_clip)
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = (
        base_lr * lr_factor * state.lr_scale)
    updates, opt_state = opt.update(grads, opt_state, state.params)
    params = optax.apply_updates(state.params, updates)

    # NOTE: state.step is NOT incremented here - one epoch = one step even
    # when the force-matching objective runs after the KL step (the KL step
    # owns the increment), keeping callback/log step numbering aligned.
    new_state = TrainState(params, opt_state, key, state.step,
                           state.lr_scale, state.best_loss,
                           state.plateau_count)
    return new_state, {"loss_force": loss}


force_matching_step = partial(jax.jit, static_argnames=(
    "spec", "batch", "L", "beta", "base_lr", "lr_factor", "grad_clip"))(
    _force_step_impl)


def _plateau_update_device(state: TrainState, loss, sched: SchedulerConfig,
                           base_lr: float) -> TrainState:
    """Branchless device-side reduce-on-plateau (same rule as
    plateau_scheduler_update, usable inside jit/scan).

    Cooldown (reference ReduceLROnPlateau semantics, fthmc/config.py:159-191):
    after a reduction the counter restarts at -cooldown, so `cooldown` epochs
    elapse before bad epochs start accumulating toward `patience` again.
    """
    best = state.best_loss
    # isinf guard: best starts at +inf, where best - thr*|best| = inf - inf
    # = nan and `loss < nan` is ALWAYS False - without the guard best never
    # updates and the LR decays unconditionally every patience+1 epochs
    # (round-3 fix; the round-2 'plateau' schedule was effectively an
    # unconditional step decay because of this)
    improved = (loss < best - sched.threshold * jnp.abs(best)) | jnp.isinf(
        best)
    in_cooldown = state.plateau_count < 0
    count = jnp.where(improved & ~in_cooldown, 0, state.plateau_count + 1)
    fire = count > sched.patience
    scale = jnp.where(
        fire,
        jnp.maximum(state.lr_scale * sched.factor, sched.min_lr / base_lr),
        state.lr_scale)
    return state._replace(
        best_loss=jnp.where(improved, loss, best),
        plateau_count=jnp.where(fire, -sched.cooldown, count).astype(
            jnp.int32),
        lr_scale=scale)


@partial(jax.jit, static_argnames=("spec", "batch", "L", "beta",
                                   "dkl_factor", "base_lr", "n_epoch",
                                   "sched", "with_force", "force_lr_factor",
                                   "grad_clip", "force_weight", "ferm_mass"))
def train_era(state: TrainState, spec: FlowSpec, batch: int, L: int,
              beta: float, dkl_factor: float, base_lr: float, n_epoch: int,
              sched: SchedulerConfig | None = None,
              with_force: bool = False, force_lr_factor: float = 0.01,
              betas: jnp.ndarray | None = None,
              grad_clip: float | None = None,
              force_weight: float = 0.0, ferm_mass: float = 0.0):
    """One ERA (n_epoch steps) as a single compiled lax.scan program.

    Removes per-step host dispatch entirely (the reference pays a Python
    round-trip per epoch, train.py:352-398). Returns (state, stacked scalar
    metrics with leading axis n_epoch).

    `betas`: optional traced (n_epoch,) array of per-epoch target betas
    (beta-annealed training - continuation from an easier coupling; no
    reference counterpart). Overrides `beta` without recompiling per era.
    """
    if betas is None:
        betas = jnp.full((n_epoch,), beta, jnp.float32)

    def body(state, beta_e):
        state, metrics = _train_step_impl(state, spec, batch, L, beta_e,
                                          dkl_factor, base_lr, grad_clip,
                                          force_weight=force_weight,
                                          ferm_mass=ferm_mass)
        if with_force:
            state, fmetrics = _force_step_impl(state, spec, batch, L, beta_e,
                                               base_lr, force_lr_factor,
                                               grad_clip=grad_clip)
            metrics = {**metrics, **fmetrics}
        if sched is not None:
            state = _plateau_update_device(state, metrics["loss_dkl"],
                                           sched, base_lr)
        # keep only scalar metrics in the scanned history
        scalars = {k: v for k, v in metrics.items() if jnp.ndim(v) == 0}
        scalars["dq_mean"] = jnp.mean(metrics["dq"])
        scalars["lr_scale"] = state.lr_scale
        scalars["beta"] = jnp.asarray(beta_e, jnp.float32)
        return state, scalars

    return jax.lax.scan(body, state, betas)


def plateau_scheduler_update(state: TrainState, loss: float,
                             sched: SchedulerConfig,
                             base_lr: float) -> TrainState:
    """Host-side reduce-on-plateau (reference ReduceLROnPlateau,
    train.py:314-317): if loss hasn't improved by `threshold` (rel) for
    `patience` epochs, multiply lr_scale by `factor`, floored at min_lr.

    Implemented as the device-side rule (_plateau_update_device) evaluated
    eagerly - ONE rule, two entry points; cooldown semantics included.
    """
    return _plateau_update_device(
        state, jnp.asarray(loss, jnp.float32), sched, base_lr)


def anneal_betas(cfg: TrainConfig, era: int) -> jnp.ndarray | None:
    """Per-epoch target betas for one era of beta-annealed training.

    With cfg.beta_init set, beta ramps linearly from beta_init to cfg.beta
    over the first cfg.beta_anneal_frac of ALL training steps (continuation
    method - the flow tracks a slowly sharpening target instead of facing
    the beta>=3 density cold). Returns None (constant beta) if disabled.
    """
    if cfg.beta_init is None:
        return None
    total = max(1, cfg.n_era * cfg.n_epoch)
    ramp_steps = max(1, int(total * cfg.beta_anneal_frac))
    g = era * cfg.n_epoch + jnp.arange(cfg.n_epoch)
    frac = jnp.minimum(g.astype(jnp.float32) / ramp_steps, 1.0)
    return cfg.beta_init + (cfg.beta - cfg.beta_init) * frac


def train(cfg: TrainConfig, state: TrainState | None = None,
          scheduler: SchedulerConfig | None = None,
          callback=None, checkpoint_fn=None, start_era: int = 0,
          mesh=None):
    """Era x epoch training driver (reference train, train.py:236-431).

    Each era runs as ONE compiled scan (train_era) - the host only sees one
    dispatch per era, so throughput is pure device speed. callback(step,
    metrics_host) per epoch (replayed from the era's stacked metrics);
    checkpoint_fn(era, state, history) per era. Returns (state, history
    dict of per-epoch scalar lists).

    `start_era`: resume point - a run restored from a ckpt_era{k} checkpoint
    passes start_era=k+1 and trains the REMAINING eras (continuing both the
    era numbering and the beta-annealing schedule), matching the reference's
    era bookkeeping (fthmc/utils/io.py:114-172 stores era in the checkpoint).

    `mesh`: an optional jax.sharding.Mesh - eras run data-parallel over its
    devices (parallel.mesh.sharded_train_era: batch sharded, grads psum over
    ICI, exact pooled metrics). Force-matching is single-device only.
    """
    if state is None:
        state = init_train_state(jax.random.PRNGKey(cfg.seed), cfg)
    history: dict[str, list] = {}
    spec = cfg.flow
    if mesh is not None:
        assert not cfg.with_force, "force-matching is single-device only"
        assert not cfg.ferm_mass, (
            "fermion-aware smoothness (ferm_mass) is single-device only")
        from fthmc_tpu.parallel.mesh import sharded_train_era

    for era in range(start_era, cfg.n_era):
        t0 = time.time()
        if mesh is not None:
            state, stacked = sharded_train_era(
                mesh, state, spec, batch=cfg.batch_size, L=cfg.L,
                beta=cfg.beta, dkl_factor=cfg.dkl_factor,
                base_lr=cfg.base_lr, n_epoch=cfg.n_epoch, sched=scheduler,
                betas=anneal_betas(cfg, era), grad_clip=cfg.grad_clip,
                force_weight=cfg.force_weight)
        else:
            state, stacked = train_era(
                state, spec, cfg.batch_size, cfg.L, cfg.beta, cfg.dkl_factor,
                cfg.base_lr, cfg.n_epoch, sched=scheduler,
                with_force=cfg.with_force,
                force_lr_factor=cfg.force_lr_factor,
                betas=anneal_betas(cfg, era),
                grad_clip=cfg.grad_clip,
                force_weight=cfg.force_weight,
                ferm_mass=cfg.ferm_mass)
        host = {k: np.asarray(v) for k, v in stacked.items()}
        dt = time.time() - t0
        for e in range(cfg.n_epoch):
            for k, v in host.items():
                history.setdefault(k, []).append(v[e])
            history.setdefault("dt", []).append(dt / cfg.n_epoch)
            if callback is not None:
                step = int(state.step) - cfg.n_epoch + e + 1
                callback(step, {k: v[e] for k, v in host.items()})
        if checkpoint_fn is not None:
            checkpoint_fn(era, state, history)
    return state, history
