"""Multi-chip scale-out: chain-axis sharding over a TPU mesh.

The reference is strictly single-process/single-device (SURVEY.md section 2b:
DDP/Horovod exist only as TODO comments, fthmc/config.py:316, train.py:176).
This module supplies the missing parallelism the TPU-native way:

  - a 1D "chains" mesh (data parallelism over MCMC chains / training batch) -
    the natural axis for this workload: chains are embarrassingly parallel,
    metrics pool with psum/pmean over ICI;
  - jit with NamedSharding in/out specs so XLA inserts the collectives;
  - per-device RNG: one key per chain derived by fold_in, so results are
    independent of the mesh layout;
  - shard_map'd HMC update for explicit-collective control when needed.

Larger lattices first scale by chains (cheap); spatial domain decomposition
with halo exchange is the long-context analogue (SURVEY.md section 5) and
slots in as a second mesh axis later.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import lattice
from fthmc_tpu.hmc import fthmc_step, hmc_step
from fthmc_tpu.train import TrainState, train_step

__all__ = ["make_chain_mesh", "shard_chains", "replicate",
           "sharded_hmc_step", "sharded_fthmc_step", "sharded_train_step",
           "sharded_run_hmc", "sharded_run_fthmc",
           "sharded_run_fthmc_chunked", "sharded_train_era",
           "sharded_run_hmc_dyn", "sharded_run_fthmc_dyn",
           "sharded_run_hmc_dyn_chunked", "sharded_run_fthmc_dyn_chunked",
           "initialize_multihost"]


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Initialize jax.distributed for multi-host meshes (DCN-spanning).

    On single-host (the common case, and all the reference ever supported)
    this is unnecessary - jax.devices() already sees the full slice. Args
    default to the cluster-env auto-detection of jax.distributed.initialize.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_chain_mesh(n_devices: int | None = None,
                    devices=None, axis: str = "chains") -> Mesh:
    """A 1D device mesh over the chain/batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_chains(mesh: Mesh, x, axis: str = "chains"):
    """Place a (B, ...) array with its leading axis sharded over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. flow params) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def _batched_sharding(mesh, axis, ndim):
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def sharded_hmc_step(mesh: Mesh, *, beta: float, dt: float, nstep: int,
                     axis: str = "chains"):
    """Compile hmc_step with the chain axis sharded over `mesh`.

    Returns step(key, x, q_old) -> (x', q', metrics); x must be placed with
    shard_chains. XLA keeps everything chain-local (no collectives in the
    hot loop - the Metropolis is per-chain) and the caller pools metrics.
    """
    xsh = NamedSharding(mesh, P(axis, None, None, None))
    qsh = NamedSharding(mesh, P(axis))

    @partial(jax.jit,
             in_shardings=(None, xsh, qsh),
             out_shardings=(xsh, qsh, NamedSharding(mesh, P(axis))))
    def step(key, x, q_old):
        # explicit XLA integrator: the Pallas kernels are per-chip programs;
        # under a sharded jit the partitioner owns the layout (shard_map'd
        # Pallas is the multi-chip upgrade path)
        return hmc_step(key, x, q_old, beta, dt, nstep, backend="xla")

    return step


def sharded_fthmc_step(mesh: Mesh, spec, *, beta: float, dt: float,
                       nstep: int, axis: str = "chains"):
    """Compile fthmc_step with chains sharded and flow params replicated."""
    zsh = NamedSharding(mesh, P(axis, None, None, None))
    qsh = NamedSharding(mesh, P(axis))
    psh = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(psh, None, zsh, qsh),
             out_shardings=(zsh, zsh, qsh, NamedSharding(mesh, P(axis))))
    def step(params, key, z, q_old):
        return fthmc_step(params, spec, key, z, q_old, beta, dt, nstep)

    return step


def sharded_train_step(mesh: Mesh, spec, *, batch: int, L: int, beta: float,
                       dkl_factor: float, base_lr: float,
                       axis: str = "chains"):
    """Compile the reverse-KL train step with the sample batch sharded over
    the mesh and params/opt state replicated. XLA turns the batch-mean loss
    gradient into a psum over ICI - data-parallel training with no explicit
    collective code."""
    psh = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(psh,), out_shardings=(psh, psh))
    def step(state: TrainState):
        return train_step(state, spec, batch, L, beta, dkl_factor, base_lr)

    return step


# ---------------------------------------------------------------------------
# Production whole-run drivers (VERDICT r1: promote multi-chip from
# step-level to production). Each device runs the full trajectory scan on
# its local chain shard inside shard_map - the Metropolis is chain-local so
# the hot loop has ZERO collectives; per-device RNG streams derive from
# fold_in(key, axis_index), so runs are deterministic for a fixed mesh.
# Because shard_map bodies are single-device programs, the Pallas trajectory
# kernels dispatch normally (backend='auto'), unlike the jit-partitioned
# step-level path above which pins backend='xla'.
# Cross-run validation vs the single-device drivers is statistical (the RNG
# streams differ by construction; SURVEY.md section 7 "hard parts").
# ---------------------------------------------------------------------------

def _chain_specs(axis: str):
    xspec = P(axis, None, None, None)
    # TrajMetrics histories are (ntraj, B): chain axis second
    hspec = P(None, axis)
    return xspec, hspec


@lru_cache(maxsize=None)
def _hmc_run_fn(mesh: Mesh, axis: str, beta: float, dt: float, nstep: int,
                ntraj: int, backend: str, integrator: str):
    """Cached compiled whole-run sharded HMC program - repeat/chunked calls
    with the same config reuse one executable (closure-based shard_maps
    would recompile every call)."""
    from fthmc_tpu.hmc import _run_hmc_scan
    xspec, hspec = _chain_specs(axis)

    def local(key, x0):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return _run_hmc_scan(k, x0, beta, dt, nstep, ntraj, backend,
                             integrator)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), xspec), out_specs=(xspec, hspec),
        check_vma=False))


def sharded_run_hmc(mesh: Mesh, cfg, *, x0=None, key=None,
                    backend: str = "auto", integrator: str = "leapfrog",
                    axis: str = "chains", dtype=None):
    """run_hmc with cfg.n_chains sharded over `mesh`: the whole cfg.ntraj
    scan runs per-device under shard_map. Returns (x_final sharded,
    TrajMetrics history with global (ntraj, n_chains) arrays)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    n_dev = mesh.devices.size
    assert cfg.n_chains % n_dev == 0, (cfg.n_chains, n_dev)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    xspec, _ = _chain_specs(axis)
    if x0 is None:
        if cfg.randinit:
            key, k0 = jax.random.split(key)
            x0 = lattice.hot_start(k0, cfg.n_chains, cfg.L, dtype)
        else:
            x0 = jnp.zeros((cfg.n_chains, 2, cfg.L, cfg.L), dtype)
    x0 = jax.device_put(x0, NamedSharding(mesh, xspec))
    run = _hmc_run_fn(mesh, axis, cfg.beta, cfg.dt, cfg.nstep, cfg.ntraj,
                      backend, integrator)
    return run(key, x0)


@lru_cache(maxsize=None)
def _fthmc_run_fn(mesh: Mesh, axis: str, spec, beta: float, dt: float,
                  nstep: int, ntraj: int, remat, integrator: str):
    from fthmc_tpu.hmc import _run_fthmc_scan
    xspec, hspec = _chain_specs(axis)

    def local(params, key, z0):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return _run_fthmc_scan(params, spec, k, z0, beta, dt, nstep,
                               ntraj, remat, integrator)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), xspec),
        out_specs=(xspec, hspec), check_vma=False))


def sharded_run_fthmc(mesh: Mesh, params, spec, lf, *, beta: float,
                      ntraj: int, z0, key, remat="auto",
                      integrator: str = "leapfrog", axis: str = "chains"):
    """run_fthmc with the chain axis sharded over `mesh` and flow params
    replicated. Whole-run scan per device; no collectives in the hot loop."""
    n_dev = mesh.devices.size
    assert z0.shape[0] % n_dev == 0, (z0.shape, n_dev)
    xspec, _ = _chain_specs(axis)
    z0 = jax.device_put(z0, NamedSharding(mesh, xspec))
    params = replicate(mesh, params)
    run = _fthmc_run_fn(mesh, axis, spec, beta, lf.dt, lf.nstep, ntraj,
                        remat, integrator)
    return run(params, key, z0)


def sharded_run_fthmc_chunked(mesh: Mesh, params, spec, lf, *, beta: float,
                              ntraj: int, z0, key, block: int = 1024,
                              callback=None, remat="auto",
                              integrator: str = "leapfrog",
                              axis: str = "chains"):
    """Chunked multi-chip FT-HMC production driver (mirrors
    hmc.run_fthmc_chunked; one compile per block size thanks to the cached
    run fn). Returns (z_final sharded, TrajMetrics as host numpy)."""
    import numpy as _np
    from fthmc_tpu.hmc import TrajMetrics
    blocks = []
    z = z0
    done = 0
    while done < ntraj:
        n = min(block, ntraj - done)
        key, krun = jax.random.split(key)
        z, hist = sharded_run_fthmc(mesh, params, spec, lf, beta=beta,
                                    ntraj=n, z0=z, key=krun, remat=remat,
                                    integrator=integrator, axis=axis)
        jax.block_until_ready(z)
        blocks.append(hist)
        done += n
        if callback is not None:
            callback(done, hist)
    cat = TrajMetrics(*[
        _np.concatenate([_np.asarray(getattr(b, f)) for b in blocks])
        for f in TrajMetrics._fields])
    return z, cat


def sharded_train_era(mesh: Mesh, state, spec, *, batch: int, L: int,
                      beta: float, dkl_factor: float = 1.0,
                      base_lr: float = 1e-3, n_epoch: int = 100,
                      sched=None, betas=None, grad_clip: float | None = None,
                      axis: str = "chains", force_weight: float = 0.0):
    """One training era (n_epoch reverse-KL steps) data-parallel over the
    mesh: each device samples batch/n_dev configurations, gradients psum
    over ICI, the optimizer update is computed identically on every device
    (params stay replicated). ESS is the EXACT global estimate (pmax-shifted
    psum moments), not a per-shard mean. Returns (state, stacked metrics)
    like train.train_era.
    """
    import jax.numpy as jnp
    import optax
    from fthmc_tpu import lattice as _lat
    from fthmc_tpu.models.flow import flow_forward
    from fthmc_tpu.models.priors import uniform_link_prior
    from fthmc_tpu.train import (TrainState, _plateau_update_device,
                                 make_optimizer)

    n_dev = mesh.devices.size
    assert batch % n_dev == 0, (batch, n_dev)
    local_batch = batch // n_dev
    if betas is None:
        betas = jnp.full((n_epoch,), beta, jnp.float32)
    state = replicate(mesh, state)

    def local_era(state: TrainState, betas):
        idx = jax.lax.axis_index(axis)

        def body(state, beta_e):
            key, kstep = jax.random.split(state.key)
            kdev = jax.random.fold_in(kstep, idx)

            def loss_fn(params):
                prior = uniform_link_prior(L)
                z = prior.sample_n(kdev, local_batch)
                x, logdet = flow_forward(params, z, spec)
                logq = prior.log_prob(z) - logdet
                logp = -_lat.batch_action(x, beta_e)
                dkl = jax.lax.pmean(jnp.mean(logq - logp), axis)
                loss = dkl_factor * dkl
                if force_weight:
                    from fthmc_tpu.hmc import ft_force
                    f = ft_force(params, spec, z, beta_e)
                    loss = loss + force_weight * jax.lax.pmean(
                        jnp.mean(f * f), axis)
                return loss, (logp, logq, x, z, dkl)

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # loss already pmean'd -> per-device grads of the GLOBAL loss
            # are partial sums; psum completes them
            grads = jax.lax.psum(grads, axis)

            opt = make_optimizer(base_lr, grad_clip)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = (
                base_lr * state.lr_scale)
            updates, opt_state = opt.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            logp, logq, x, z, dkl = aux
            # exact global ESS: shift by global max, psum the moments
            logw = logp - logq
            m = jax.lax.pmax(jnp.max(logw), axis)
            w = jnp.exp(logw - m)
            s1 = jax.lax.psum(jnp.sum(w), axis)
            s2 = jax.lax.psum(jnp.sum(w * w), axis)
            ess = (s1 * s1) / (batch * s2)
            q = _lat.batch_charges(x)
            qi = _lat.batch_charges(z)
            metrics = {
                "loss_dkl": loss,
                "dkl": dkl,
                "ess": ess,
                "logp": jax.lax.pmean(jnp.mean(logp), axis),
                "logq": jax.lax.pmean(jnp.mean(logq), axis),
                "dq_mean": jax.lax.pmean(jnp.mean(jnp.abs(q - qi)), axis),
                "plaq": jax.lax.pmean(jnp.mean(logp), axis) / (
                    beta_e * L * L),
                "beta": jnp.asarray(beta_e, jnp.float32),
            }
            new_state = TrainState(params, opt_state, key, state.step + 1,
                                   state.lr_scale, state.best_loss,
                                   state.plateau_count)
            if sched is not None:
                new_state = _plateau_update_device(
                    new_state, metrics["loss_dkl"], sched, base_lr)
            metrics["lr_scale"] = new_state.lr_scale
            return new_state, metrics

        return jax.lax.scan(body, state, betas)

    run = jax.jit(
        jax.shard_map(local_era, mesh=mesh, in_specs=(P(), P()),
                      out_specs=(P(), P()), check_vma=False),
        static_argnames=())
    return run(state, betas)


# ---------------------------------------------------------------------------
# Dynamical fermions (Schwinger model): chain-dp sharded production drivers.
# The CG while_loop runs per device shard with its own trip count (no
# collectives inside the loop), so devices never wait on each other's
# solver convergence - the natural TPU layout for pseudofermion HMC.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _hmc_dyn_run_fn(mesh: Mesh, axis: str, cfg, ntraj: int):
    from fthmc_tpu.schwinger import _run_hmc_dyn_scan
    xspec, hspec = _chain_specs(axis)

    def local(key, x0):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return _run_hmc_dyn_scan(k, x0, cfg, ntraj)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), xspec), out_specs=(xspec, hspec),
        check_vma=False))


def sharded_run_hmc_dyn(mesh: Mesh, cfg, *, x0=None, key=None,
                        axis: str = "chains"):
    """schwinger.run_hmc_dyn with cfg.n_chains sharded over `mesh`
    (SchwingerConfig is frozen/hashable -> one cached executable per
    config). Returns (x sharded, TrajMetrics with global (ntraj, B))."""
    import jax.numpy as jnp
    n_dev = mesh.devices.size
    assert cfg.n_chains % n_dev == 0, (cfg.n_chains, n_dev)
    if key is None:
        key = jax.random.PRNGKey(0)
    if x0 is None:
        x0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    xspec, _ = _chain_specs(axis)
    x0 = jax.device_put(x0, NamedSharding(mesh, xspec))
    run = _hmc_dyn_run_fn(mesh, axis, cfg, cfg.ntraj)
    return run(key, x0)


@lru_cache(maxsize=None)
def _fthmc_dyn_run_fn(mesh: Mesh, axis: str, spec, cfg, ntraj: int):
    from fthmc_tpu.schwinger import _run_fthmc_dyn_scan
    xspec, hspec = _chain_specs(axis)

    def local(params, key, z0):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return _run_fthmc_dyn_scan(params, spec, k, z0, cfg, ntraj)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), xspec),
        out_specs=(xspec, hspec), check_vma=False))


def sharded_run_fthmc_dyn(mesh: Mesh, params, spec, cfg, *, z0, key,
                          axis: str = "chains"):
    """Dynamical-fermion FT-HMC with the chain axis sharded and flow params
    replicated; whole-run scan per device, CG trip counts independent."""
    n_dev = mesh.devices.size
    assert z0.shape[0] % n_dev == 0, (z0.shape, n_dev)
    xspec, _ = _chain_specs(axis)
    z0 = jax.device_put(z0, NamedSharding(mesh, xspec))
    params = replicate(mesh, params)
    run = _fthmc_dyn_run_fn(mesh, axis, spec, cfg, cfg.ntraj)
    return run(params, key, z0)


def _concat_host(blocks):
    import numpy as _np
    from fthmc_tpu.hmc import TrajMetrics
    return TrajMetrics(*[
        _np.concatenate([_np.asarray(getattr(b, f)) for b in blocks])
        for f in TrajMetrics._fields])


def sharded_run_hmc_dyn_chunked(mesh: Mesh, cfg, *, block: int = 256,
                                x0=None, key=None, axis: str = "chains",
                                callback=None):
    """Blocked multi-chip dynamical-fermion HMC (mirrors
    schwinger.run_hmc_dyn_chunked: device executions stay short — the
    production rule for long runs on this infra). One compile per block
    size (cfg.ntraj is normalized out of the cache key). Returns
    (x sharded, TrajMetrics as host numpy)."""
    import dataclasses
    n_dev = mesh.devices.size
    assert cfg.n_chains % n_dev == 0, (cfg.n_chains, n_dev)
    key = jax.random.PRNGKey(0) if key is None else key
    if x0 is None:
        x0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    xspec, _ = _chain_specs(axis)
    x = jax.device_put(x0, NamedSharding(mesh, xspec))
    left = cfg.ntraj
    cfg = dataclasses.replace(cfg, ntraj=0)  # dead inside the scan
    blocks, done = [], 0
    while done < left:
        n = min(block, left - done)
        key, krun = jax.random.split(key)
        x, h = _hmc_dyn_run_fn(mesh, axis, cfg, n)(krun, x)
        jax.block_until_ready(x)
        blocks.append(h)
        done += n
        if callback is not None:
            callback(done, h)
    return x, _concat_host(blocks)


def sharded_run_fthmc_dyn_chunked(mesh: Mesh, params, spec, cfg, *,
                                  block: int = 128, z0=None, key=None,
                                  axis: str = "chains", callback=None):
    """Blocked multi-chip dynamical-fermion FT-HMC (see
    sharded_run_hmc_dyn_chunked); flow params replicated once."""
    import dataclasses
    n_dev = mesh.devices.size
    key = jax.random.PRNGKey(0) if key is None else key
    if z0 is None:
        z0 = lattice.hot_start(jax.random.fold_in(key, 7), cfg.n_chains,
                               cfg.L)
    assert z0.shape[0] % n_dev == 0, (z0.shape, n_dev)
    xspec, _ = _chain_specs(axis)
    z = jax.device_put(z0, NamedSharding(mesh, xspec))
    params = replicate(mesh, params)
    left = cfg.ntraj
    cfg = dataclasses.replace(cfg, ntraj=0)
    blocks, done = [], 0
    while done < left:
        n = min(block, left - done)
        key, krun = jax.random.split(key)
        z, h = _fthmc_dyn_run_fn(mesh, axis, spec, cfg, n)(params, krun, z)
        jax.block_until_ready(z)
        blocks.append(h)
        done += n
        if callback is not None:
            callback(done, h)
    return z, _concat_host(blocks)
