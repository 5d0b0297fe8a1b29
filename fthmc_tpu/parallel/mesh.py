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

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fthmc_tpu import lattice
from fthmc_tpu.hmc import fthmc_step, hmc_step
from fthmc_tpu.train import TrainState, train_step

__all__ = ["make_chain_mesh", "shard_chains", "replicate",
           "sharded_hmc_step", "sharded_fthmc_step", "sharded_train_step",
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
